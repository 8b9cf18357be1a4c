package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Sessions
import graft.functions.DistRank

/** Scale stress proof for [[graft.functions.DistRank]] (the r6 swap that
  * removed the last corpus-grain single-partition `WindowExec`s from
  * q114/q115/q142/q171/q177/q183): a k× synthetic doc-grain corpus,
  * timing the exact distributed ntile (range shuffle + per-slice rank +
  * P-row broadcast offsets) against the naive unpartitioned
  * `Window.orderBy` form, with the two outputs asserted IDENTICAL at
  * every point (same total order ⇒ same rank arithmetic — exactness is
  * the contract, the probe only measures the plan).
  *
  * Expected law: the naive form funnels all n rows through ONE task —
  * time grows ≥ ×2 per corpus doubling with zero parallelism and is the
  * 100 TB cliff; the distributed form keeps per-partition work ~n/P and
  * scales with the shuffle, the same shape as every other bucketed op in
  * the repo. Results are logged in BASELINE.md.
  *
  * Usage: sbt "runMain graft.tools.RankScaleProbe [ks] [naiveMaxK]"
  * Prints one JSON line per k.
  */
object RankScaleProbe {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val ks = args.headOption.getOrElse("1,2,4,8,16")
      .split(",").map(_.trim.toInt).toSeq
    val naiveMaxK = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = Sessions.local("graft-rank-scale")
    val baseN = 200000L

    // doc-grain stand-in: unique id + a hash-scrambled non-monotonic sort
    // key, so range partitions never align with generation order
    def corpus(k: Int): DataFrame =
      spark.range(baseN * k).select(col("id"),
        (col("id") * 1103515245L % 999983L).as("v"))

    for (k <- ks) {
      val df = corpus(k).persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = df.count()

      def profile(ranked: DataFrame): (Long, Double) =
        timed(ranked.groupBy("t")
          .agg(count(lit(1)).as("n"), min("v").as("mn"), max("v").as("mx"))
          .collect().map(_.getLong(1)).sum)

      val dist = DistRank.withNtile(df, "t", 8, col("v"), col("id"))
      val (dn, tDist) = profile(dist)
      def naiveDf() = df.withColumn("t",
        ntile(8).over(Window.orderBy(col("v"), col("id"))))
      // the ENGINE path: the same naive window, auto-planned by
      // GlobalRankRewrite (threshold −1 forces the rewrite; the rule is
      // otherwise identical to what fires on >10 MB inputs)
      val (rn_, tRule) = {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try profile(naiveDf())
        finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
          "10485760")
      }
      val excl = "spark.sql.optimizer.excludedRules" ->
        "graft.plans.GlobalRankRewrite"
      spark.conf.set(excl._1, excl._2)
      val (nn, tNaive) = if (k <= naiveMaxK) profile(naiveDf())
      else (-1L, -1.0)
      if (k <= naiveMaxK) {
        val naive = naiveDf()
        val diff = dist.select("id", "t").exceptAll(naive.select("id", "t"))
          .count() +
          naive.select("id", "t").exceptAll(dist.select("id", "t")).count()
        require(diff == 0, s"distributed ntile diverged at k=$k")
      }
      spark.conf.unset(excl._1)
      // engine path must agree with the library path exactly
      val ruled = {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try {
          val r = naiveDf()
          require(r.queryExecution.executedPlan.toString
            .contains("graft_rank_pid"), s"rule did not fire at k=$k")
          val diff = dist.select("id", "t").exceptAll(r.select("id", "t"))
            .count() +
            r.select("id", "t").exceptAll(dist.select("id", "t")).count()
          require(diff == 0, s"rule-planned ntile diverged at k=$k")
        } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
          "10485760")
      }
      println(s"""{"k":$k,"n":$n,"t_dist":${f"$tDist%.2f"},""" +
        s""""t_rule":${f"$tRule%.2f"},"t_naive":${f"$tNaive%.2f"},""" +
        s""""rows_dist":$dn,"rows_rule":$rn_,"rows_naive":$nn}""")
      df.unpersist()
    }

    // skew arm: the rule's documented equal-width caveat, quantified.
    // v = 10⁶/(id%997+1) piles most rows into the low end of the value
    // range — equal-width slices go hot while DistRank's frequency-
    // balanced range shuffle stays even. Outputs still asserted equal.
    {
      val k = ks.max
      val df = spark.range(baseN * k).select(col("id"),
        call_function("div", lit(1000000L), col("id") % 997L + 1L).as("v"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = df.count()
      def profile(ranked: DataFrame): (Long, Double) =
        timed(ranked.groupBy("t")
          .agg(count(lit(1)).as("n"), min("v").as("mn"), max("v").as("mx"))
          .collect().map(_.getLong(1)).sum)
      val dist = DistRank.withNtile(df, "t", 8, col("v"), col("id"))
      val (_, tDist) = profile(dist)
      val (_, tRule) = {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try profile(df.withColumn("t",
          ntile(8).over(Window.orderBy(col("v"), col("id")))))
        finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
          "10485760")
      }
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val ruled = df.withColumn("t",
          ntile(8).over(Window.orderBy(col("v"), col("id"))))
        val diff = dist.select("id", "t").exceptAll(ruled.select("id", "t"))
          .count() +
          ruled.select("id", "t").exceptAll(dist.select("id", "t")).count()
        require(diff == 0, "skew-keyed rule ntile diverged")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        "10485760")
      println(s"""{"shape":"skew","k":$k,"n":$n,""" +
        s""""t_dist":${f"$tDist%.2f"},"t_rule":${f"$tRule%.2f"}}""")
      df.unpersist()
    }
    spark.stop()
  }
}
