package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Sessions

/** Scale stress proof for the FULL-FRAME arm of
  * [[graft.plans.GlobalRankRewrite]]: naive order-less
  * `sum/count/min/max OVER (PARTITION BY pmod(id, 8))` (q318's
  * share-of-total shape) with the rule forced versus excluded. The
  * naive plan is one WindowExec task per partition VALUE — parallelism
  * pigeonhole-capped at 8 at any corpus size, each task materializing
  * and scanning its whole group; the rewrite is a partial-combining
  * hash aggregate (8 rows) broadcast-joined back, corpus-parallel.
  * Checksums asserted identical at every k.
  *
  * Usage: sbt "runMain graft.tools.FfScaleProbe [ks] [naiveMaxK]"
  * (SPARK_GRAFT_CPUS=16 to reproduce BASELINE.md records)
  */
object FfScaleProbe {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val ks = args.headOption.getOrElse("1,2,4,8,16")
      .split(",").map(_.trim.toInt).toSeq
    val naiveMaxK = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = Sessions.local("graft-ff-scale")
    val baseN = 500000L
    val threshold = "spark.sql.autoBroadcastJoinThreshold"
    val excl = "spark.sql.optimizer.excludedRules"

    def corpus(k: Int): DataFrame =
      spark.range(baseN * k).select(col("id"),
        (col("id") * 1103515245L % 99991L).as("w"))

    for (k <- ks) {
      val df = corpus(k).persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = df.count()
      val wp = Window.partitionBy(pmod(col("id"), lit(8)))
      def build() = df.select(col("id"),
        sum(col("w")).over(wp).as("gs"),
        count(col("w")).over(wp).as("gc"),
        min(col("w")).over(wp).as("gmn"),
        max(col("w")).over(wp).as("gmx"))
      def profile(r: DataFrame): (Long, Double) =
        timed(r.select(
          sum(col("gs") % 1000003L).as("a"),
          sum(col("gc") % 1000003L).as("b"),
          sum(col("gmn") + col("gmx")).as("c"))
          .collect().map(x => x.getLong(0) + x.getLong(1) + x.getLong(2))
          .sum)

      val (ruleSum, tRule) = {
        spark.conf.set(threshold, "-1")
        try {
          val r = build()
          require(r.queryExecution.executedPlan.toString
            .contains("graft_rank_fg"), s"full-frame arm absent at k=$k")
          profile(r)
        } finally spark.conf.set(threshold, "10485760")
      }
      val (naiveSum, tNaive) = if (k <= naiveMaxK) {
        spark.conf.set(excl, "graft.plans.GlobalRankRewrite")
        try profile(build())
        finally spark.conf.unset(excl)
      } else (Long.MinValue, -1.0)
      if (tNaive >= 0) require(ruleSum == naiveSum,
        s"full-frame aggs diverged at k=$k: $ruleSum vs $naiveSum")
      println(s"""{"k":$k,"n":$n,"t_rule":${f"$tRule%.2f"},""" +
        s""""t_naive":${f"$tNaive%.2f"}}""")
      df.unpersist()
      spark.sqlContext.clearCache()
    }
    spark.stop()
  }
}
