package graft.tools

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.Sessions

/** Scale stress proof for the WEIGHTED path of
  * [[graft.plans.PercentileRewrite]]: a global token-weighted
  * percentile ladder (`percentile(v, p, f)`) over a k× corpus of
  * NEAR-UNIQUE longs — the adversarial shape for Spark's native
  * weighted percentile, whose OpenHashMap buffer holds one (value →
  * weight) entry per distinct value and merges + sorts on ONE reducer.
  * The rewrite aggregates to (distinct value, total weight) pairs
  * corpus-parallel, stamps running weights with the cumulative window
  * (re-planned by GlobalRankRewrite in the same batch), and keeps
  * ≤ 2·|ps| bracketing rows.
  *
  * Outputs asserted BIT-equal (doubleToLongBits) between the arms at
  * every k — exactness is the contract, the probe only measures plans.
  *
  * Usage: sbt "runMain graft.tools.WpctScaleProbe [ks] [naiveMaxK]"
  * (SPARK_GRAFT_CPUS=16 for BASELINE-comparable numbers.)
  */
object WpctScaleProbe {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val ks = args.headOption.getOrElse("1,2,4,8,16")
      .split(",").map(_.trim.toInt).toSeq
    val naiveMaxK = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = Sessions.local("graft-wpct-scale")
    val baseN = 500000L
    val threshold = "spark.sql.autoBroadcastJoinThreshold"
    val excl = "spark.sql.optimizer.excludedRules"

    // near-unique integral values (the weighted path's exact-grouping
    // domain), small positive weights with zeros sprinkled in
    def corpus(k: Int): DataFrame =
      spark.range(baseN * k).select(
        (col("id") * 2654435761L % 1000003907L).as("v"),
        (col("id") * 1103515245L % 17L).as("f"))

    def ladder(df: DataFrame): DataFrame = df.agg(
      expr("percentile(v, 0.5d, f)").as("p50"),
      expr("percentile(v, 0.9d, f)").as("p90"),
      expr("percentile(v, 0.99d, f)").as("p99"))

    def bitsOf(r: Row): Seq[Long] =
      (0 until 3).map(i => java.lang.Double.doubleToLongBits(r.getDouble(i)))

    for (k <- ks) {
      val df = corpus(k).persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = df.count()

      val (ruleRow, tRule) = {
        spark.conf.set(threshold, "-1")
        try {
          val q = ladder(df)
          val p = q.queryExecution.executedPlan.toString
          require(!p.toLowerCase.contains("percentile") &&
            p.contains("graft_pct_cw"), s"weighted path absent at k=$k")
          timed(q.collect().head)
        } finally spark.conf.set(threshold, "10485760")
      }
      val (naiveRow, tNaive) = if (k <= naiveMaxK) {
        spark.conf.set(excl,
          "graft.plans.PercentileRewrite,graft.plans.GlobalRankRewrite")
        try timed(ladder(df).collect().head)
        finally spark.conf.unset(excl)
      } else (null, -1.0)
      if (tNaive >= 0) require(bitsOf(ruleRow) == bitsOf(naiveRow),
        s"weighted percentiles diverged at k=$k: $ruleRow vs $naiveRow")
      println(s"""{"k":$k,"n":$n,"t_rule":${f"$tRule%.2f"},""" +
        s""""t_naive":${f"$tNaive%.2f"}}""")
      df.unpersist()
      spark.sqlContext.clearCache()
    }
    spark.stop()
  }
}
