package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Sessions

/** Scale stress proof for [[graft.plans.ModeRewrite]]: a global
  * deterministic `mode() WITHIN GROUP (ORDER BY v)` over a k× corpus of
  * HIGH-NDV longs (distinct ≈ n/2 — every value appears once or twice,
  * with one heavy winner planted so the answer is stable). The native
  * plan's OpenHashMap holds every distinct value per task and the final
  * merge folds EVERY map into one task; the rewrite is two hash
  * aggregates (count per value → argmax), map-side partials at both
  * levels. Outputs asserted identical at every k.
  *
  * Usage: sbt "runMain graft.tools.ModeScaleProbe [ks] [naiveMaxK]"
  * (SPARK_GRAFT_CPUS=16 for BASELINE-comparable numbers.)
  */
object ModeScaleProbe {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val ks = args.headOption.getOrElse("1,2,4,8,16")
      .split(",").map(_.trim.toInt).toSeq
    val naiveMaxK = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = Sessions.local("graft-mode-scale")
    val baseN = 500000L
    val threshold = "spark.sql.autoBroadcastJoinThreshold"
    val excl = "spark.sql.optimizer.excludedRules"

    // hash-scrambled values, ~2 occurrences each; id%1000==0 rows all
    // map to the planted winner −1
    def corpus(k: Int): DataFrame =
      spark.range(baseN * k).select(
        when(col("id") % 1000 === 0, lit(-1L))
          .otherwise(col("id") * 2654435761L % (baseN * k / 2))
          .as("v"))

    def q(df: DataFrame): DataFrame =
      df.agg(expr("mode() WITHIN GROUP (ORDER BY v)").as("m"))

    for (k <- ks) {
      val df = corpus(k).persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = df.count()

      val (ruleRow, tRule) = {
        spark.conf.set(threshold, "-1")
        try {
          val r = q(df)
          val p = r.queryExecution.executedPlan.toString
          require(!p.contains("mode(") && p.contains("graft_mode_v"),
            s"rule did not fire at k=$k")
          timed(r.collect().head.getLong(0))
        } finally spark.conf.set(threshold, "10485760")
      }

      val (naiveRow, tNaive) = if (k <= naiveMaxK) {
        spark.conf.set(excl, "graft.plans.ModeRewrite")
        try timed(q(df).collect().head.getLong(0))
        finally spark.conf.unset(excl)
      } else (Long.MinValue, -1.0)

      if (tNaive >= 0) require(ruleRow == naiveRow,
        s"mode diverged at k=$k: $ruleRow vs $naiveRow")
      println(s"""{"k":$k,"n":$n,"mode":$ruleRow,""" +
        s""""t_rule":${f"$tRule%.2f"},"t_naive":${f"$tNaive%.2f"}}""")
      df.unpersist()
    }
    spark.stop()
  }
}
