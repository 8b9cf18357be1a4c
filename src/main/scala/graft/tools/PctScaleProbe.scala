package graft.tools

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.Sessions

/** Scale stress proof for [[graft.plans.PercentileRewrite]]: a global
  * exact-percentile ladder (`p50/p90/p99`, no GROUP BY) over a k×
  * corpus of NEAR-UNIQUE doubles — the adversarial shape for Spark's
  * native `percentile`, whose OpenHashMap buffer holds one entry per
  * distinct value and whose final merge + sort runs on ONE reducer, so
  * at distinct ≈ n the native cost is a single-task O(n log n) with an
  * O(n) heap spike. The rewrite (count + distributed rank via
  * GlobalRankRewrite + positional filter + 1-row interpolation) keeps
  * per-task work at n/P and carries ≤ 2·|ps| rows past the rank.
  *
  * Outputs asserted BIT-equal (doubleToLongBits) between the arms at
  * every k — exactness is the contract, the probe only measures plans.
  *
  * Usage: sbt "runMain graft.tools.PctScaleProbe [ks] [naiveMaxK]"
  * (SPARK_GRAFT_CPUS=16 for BASELINE-comparable numbers.)
  * Prints one JSON line per k.
  */
object PctScaleProbe {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val ks = args.headOption.getOrElse("1,2,4,8,16")
      .split(",").map(_.trim.toInt).toSeq
    val naiveMaxK = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = Sessions.local("graft-pct-scale")
    val baseN = 500000L
    val threshold = "spark.sql.autoBroadcastJoinThreshold"
    val excl = "spark.sql.optimizer.excludedRules"

    // near-unique doubles, hash-scrambled so value order never aligns
    // with generation order (the distinct≈n adversarial case)
    def corpus(k: Int): DataFrame =
      spark.range(baseN * k).select(
        ((col("id") * 2654435761L % 1000003907L).cast("double") +
          col("id").cast("double") / 1e9).as("v"))

    def ladder(df: DataFrame): DataFrame = df.agg(
      expr("percentile(v, 0.5d)").as("p50"),
      expr("percentile(v, 0.9d)").as("p90"),
      expr("percentile(v, 0.99d)").as("p99"))

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
            p.contains("graft_pct_rn"), s"rule did not fire at k=$k")
          timed(q.collect().head)
        } finally spark.conf.set(threshold, "10485760")
      }

      val (naiveRow, tNaive) = if (k <= naiveMaxK) {
        spark.conf.set(excl,
          "graft.plans.PercentileRewrite,graft.plans.GlobalRankRewrite")
        try timed(ladder(df).collect().head)
        finally spark.conf.unset(excl)
      } else (null: Row, -1.0)

      if (naiveRow != null) {
        require(bitsOf(ruleRow) == bitsOf(naiveRow),
          s"rule ladder diverged at k=$k: $ruleRow vs $naiveRow")
      }
      println(s"""{"k":$k,"n":$n,"t_rule":${f"$tRule%.2f"},""" +
        s""""t_naive":${f"$tNaive%.2f"}}""")
      df.unpersist()
    }
    spark.stop()
  }
}
