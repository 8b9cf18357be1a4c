package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Sessions

/** Scale stress proof for the VALUE-BAND arm of
  * [[graft.plans.GlobalRankRewrite]]: a naive global
  * `sum/count/min/max OVER (ORDER BY k RANGE BETWEEN w PRECEDING AND
  * CURRENT ROW)` (q320's burst-monitor shape — frame reach is decided
  * by VALUE, so no row-count frame can express it) with the rule forced
  * versus excluded (true single-partition WindowExec scanning the whole
  * corpus per row band).
  *
  * Expected law: naive is one task; the rule buckets rows by
  * floor(k / B) with B = the band width, ghost-copies each row into the
  * ≤ 2 neighbor buckets whose rows can read it (~2× replication), and
  * re-runs the ORIGINAL frame per bucket — rank-free, one hash shuffle
  * of ~2n rows, scaling with the shuffle. Outputs asserted identical at
  * every k (value-decided frames are permutation-independent bags).
  *
  * Usage: sbt "runMain graft.tools.VbScaleProbe [ks] [naiveMaxK]"
  * (SPARK_GRAFT_CPUS=16 to reproduce BASELINE.md records)
  */
object VbScaleProbe {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val ks = args.headOption.getOrElse("1,2,4,8,16")
      .split(",").map(_.trim.toInt).toSeq
    val naiveMaxK = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = Sessions.local("graft-vb-scale")
    val baseN = 200000L
    val threshold = "spark.sql.autoBroadcastJoinThreshold"
    val excl = "spark.sql.optimizer.excludedRules"

    // event-time-like key: dense with mild jitter so a fixed value band
    // holds O(hundreds) of rows at any k (frame population stays the
    // workload, corpus size the scale axis)
    def corpus(k: Int): DataFrame =
      spark.range(baseN * k).select(col("id"),
        (col("id") * 37L + col("id") * 2654435761L % 29L).as("t"),
        (col("id") * 1103515245L % 9973L).as("w"))

    for (k <- ks) {
      val df = corpus(k).persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = df.count()
      val band = Window.orderBy(col("t")).rangeBetween(-10000L, 0L)
      def build() = df.select(col("id"),
        sum(col("w")).over(band).as("bs"),
        count(lit(1)).over(band).as("bc"),
        min(col("w")).over(band).as("bmn"),
        max(col("w")).over(band).as("bmx"))
      def profile(r: DataFrame): (Long, Double) =
        timed(r.select(
          sum(col("bs") % 1000003L).as("a"),
          sum(col("bc")).as("b"),
          sum(col("bmn") + col("bmx")).as("c"))
          .collect().map(x => x.getLong(0) + x.getLong(1) + x.getLong(2))
          .sum)

      val (ruleSum, tRule) = {
        spark.conf.set(threshold, "-1")
        try {
          val r = build()
          require(r.queryExecution.executedPlan.toString
            .contains("graft_rank_vb"), s"value-band arm absent at k=$k")
          profile(r)
        } finally spark.conf.set(threshold, "10485760")
      }
      val (naiveSum, tNaive) = if (k <= naiveMaxK) {
        spark.conf.set(excl, "graft.plans.GlobalRankRewrite")
        try profile(build())
        finally spark.conf.unset(excl)
      } else (Long.MinValue, -1.0)
      if (tNaive >= 0) require(ruleSum == naiveSum,
        s"value bands diverged at k=$k: $ruleSum vs $naiveSum")
      println(s"""{"k":$k,"n":$n,"t_rule":${f"$tRule%.2f"},""" +
        s""""t_naive":${f"$tNaive%.2f"}}""")
      df.unpersist()
      spark.sqlContext.clearCache()
    }
    spark.stop()
  }
}
