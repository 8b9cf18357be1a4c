package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Sessions

/** Scale stress proof for the HALF-OPEN arm of
  * [[graft.plans.GlobalRankRewrite]]: naive global `sum/count/avg OVER
  * (ORDER BY k RANGE UNBOUNDED PRECEDING..x FOLLOWING)` plus a suffix
  * `min OVER (x PRECEDING..UNBOUNDED FOLLOWING)` (q325's budget-coverage
  * shape) with the rule forced versus excluded (true single-partition
  * WindowExec).
  *
  * Expected law: the decomposition emits cumulative + finite-band
  * pieces that the rule's own arms re-plan (rank machinery + value
  * buckets), so the rewrite rides two hash shuffles at O(n); the naive
  * form is not merely one task — Spark's UnboundedFollowing frame
  * RE-AGGREGATES the whole remaining suffix per row, so the suffix min
  * makes the naive window O(n²) on that one task. The base corpus is
  * deliberately small (20 k) and `naiveMaxK` low so the quadratic arm
  * terminates; the rule arm ladders past it untouched. Checksums over
  * every row asserted identical at every measured k (the average
  * double hashed bit-level).
  *
  * Usage: sbt "runMain graft.tools.HovScaleProbe [ks] [naiveMaxK]"
  * (SPARK_GRAFT_CPUS=16 to reproduce BASELINE.md records)
  */
object HovScaleProbe {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val ks = args.headOption.getOrElse("1,2,4,8,16")
      .split(",").map(_.trim.toInt).toSeq
    val naiveMaxK = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = Sessions.local("graft-hov-scale")
    val baseN = 20000L
    val threshold = "spark.sql.autoBroadcastJoinThreshold"
    val excl = "spark.sql.optimizer.excludedRules"

    def corpus(k: Int): DataFrame =
      spark.range(baseN * k).select(col("id"),
        (col("id") * 37L + col("id") * 2654435761L % 29L).as("t"),
        (col("id") * 1103515245L % 9973L).as("w"))

    for (k <- ks) {
      val df = corpus(k).persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = df.count()
      val pre = Window.orderBy(col("t"))
        .rangeBetween(Window.unboundedPreceding, 500L)
      val suf = Window.orderBy(col("t"))
        .rangeBetween(-500L, Window.unboundedFollowing)
      def build() = df.select(col("id"),
        sum(col("w")).over(pre).as("ps"),
        count(col("w")).over(pre).as("pc"),
        avg(col("w")).over(pre).as("pa"),
        min(col("w")).over(suf).as("sm"))
      def profile(r: DataFrame): (Long, Double) =
        timed(r.select(
          sum(col("ps") % 1000003L).as("a"),
          sum(col("pc")).as("b"),
          sum(expr("cast(abs(hash(pa)) as bigint)")).as("c"),
          sum(col("sm")).as("d"))
          .collect().map(x => x.getLong(0) + x.getLong(1) +
            x.getLong(2) + x.getLong(3)).sum)

      val (ruleSum, tRule) = {
        spark.conf.set(threshold, "-1")
        try {
          val r = build()
          require(r.queryExecution.executedPlan.toString
            .contains("graft_rank_ho"), s"half-open arm absent at k=$k")
          profile(r)
        } finally spark.conf.set(threshold, "10485760")
      }
      val (naiveSum, tNaive) = if (k <= naiveMaxK) {
        spark.conf.set(excl, "graft.plans.GlobalRankRewrite")
        try profile(build())
        finally spark.conf.unset(excl)
      } else (Long.MinValue, -1.0)
      if (tNaive >= 0) require(ruleSum == naiveSum,
        s"half-open frames diverged at k=$k: $ruleSum vs $naiveSum")
      println(s"""{"k":$k,"n":$n,"t_rule":${f"$tRule%.2f"},""" +
        s""""t_naive":${f"$tNaive%.2f"}}""")
      df.unpersist()
      spark.sqlContext.clearCache()
    }
    spark.stop()
  }
}
