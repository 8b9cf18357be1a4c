package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Sessions

/** Scale stress proof for the MULTI-KEY LOCF arm of
  * [[graft.plans.GlobalRankRewrite]] (round 11): naive
  * `last_value(w, true) OVER (ORDER BY k, id UP..CR)` — the
  * forward-fill-with-tiebreak spelling every ordered-log consumer
  * writes — is ONE single-partition WindowExec task holding the whole
  * corpus; the rewrite slices on the head key and combines per-slice
  * struct-key max_by totals, corpus-parallel. Both fill directions
  * (LOCF forward + NOCB backward, q252's two passes) run in one plan.
  * Checksums asserted identical at every k.
  *
  * `q252` mode A/Bs the registered propensity-matching query itself
  * (its two three-key fill passes are exactly this arm's shape) on a
  * real corpus dir — the end-to-end payoff measurement.
  *
  * Usage: sbt "runMain graft.tools.MkLocfProbe [ks] [naiveMaxK]"
  *        sbt "runMain graft.tools.MkLocfProbe q252 <sfDir> [reps]"
  * (SPARK_GRAFT_CPUS=16 to reproduce BASELINE.md records)
  */
object MkLocfProbe {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private val threshold = "spark.sql.autoBroadcastJoinThreshold"
  private val rule = "graft.plans.GlobalRankRewrite"

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("q252")) return q252Mode(args)
    val ks = args.headOption.getOrElse("1,2,4,8")
      .split(",").map(_.trim.toInt).toSeq
    val naiveMaxK = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = Sessions.local("graft-mklocf-scale")
    val baseN = 1000000L

    // nullable duplicated head key (tie runs + a null run), id
    // tiebreak; input null-or-not per RUN of the head key, so every
    // (k, id) tie run is value-constant (the arm's admission)
    def corpus(k: Int): DataFrame =
      spark.range(baseN * k).select(col("id"),
        when(col("id") % 97 === 0, lit(null).cast("long"))
          .otherwise((col("id") * 1103515245L) % 9973L).as("k"))
        .withColumn("w",
          when(col("k") % 7 < 2 || col("k").isNull,
            lit(null).cast("long"))
            .otherwise((col("k") * 11) % 131071L))

    for (k <- ks) {
      // NOT persisted: caching would wrap the corpus in an
      // InMemoryRelation, hiding w's definition from the arm's
      // key-function proof (expandOnce cannot pierce a cache) — the
      // rule would correctly stand down and the probe would measure
      // nothing. range-born corpora are deterministic, so both arms
      // regenerate identical data.
      val df = corpus(k)
      val n = df.count()
      def build() = df
        .withColumn("ff", last(col("w"), ignoreNulls = true).over(
          Window.orderBy(col("k").asc, col("id").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("bf", last(col("w"), ignoreNulls = true).over(
          Window.orderBy(col("k").desc, col("id").desc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      def profile(r: DataFrame): (Long, Double) =
        timed(r.select(
          sum(coalesce(col("ff"), lit(0L)) % 1000003L).as("a"),
          sum(coalesce(col("bf"), lit(0L)) % 1000003L).as("b"),
          count(col("ff")).as("c"))
          .collect().map(x => x.getLong(0) + x.getLong(1) + x.getLong(2))
          .sum)

      val (ruleSum, tRule) = {
        spark.conf.set(threshold, "-1")
        try {
          val r = build()
          require(r.queryExecution.executedPlan.toString
            .contains("graft_rank_pid"), s"multi-key LOCF absent at k=$k")
          profile(r)
        } finally spark.conf.set(threshold, "10485760")
      }
      val (naiveSum, tNaive) = if (k <= naiveMaxK) {
        RuleToggle.withExcluded(spark, rule)(profile(build()))
      } else (Long.MinValue, -1.0)
      if (tNaive >= 0) require(ruleSum == naiveSum,
        s"multi-key LOCF diverged at k=$k: $ruleSum vs $naiveSum")
      println(s"""{"k":$k,"n":$n,"t_rule":${f"$tRule%.2f"},""" +
        s""""t_naive":${f"$tNaive%.2f"}}""")
      spark.sqlContext.clearCache()
    }
    spark.stop()
  }

  /** A/B the registered q252 on a real corpus: rule-on (threshold −1
    * so the fill passes re-plan even at fixture stats) vs rule
    * excluded, min-of-reps, final row asserted identical. */
  private def q252Mode(args: Array[String]): Unit = {
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = Sessions.local("graft-mklocf-q252")
    val fn = graft.SparkEntry.queries.toMap.apply("q252_propensity_match")
    def run(): (Seq[Any], Double) =
      timed(fn(spark, dir).collect().head.toSeq)
    def best(label: String): (Seq[Any], Double) = {
      val rs = (1 to reps).map(_ => run())
      println(s"  $label reps: ${rs.map(r => f"${r._2}%.2f").mkString(", ")}")
      rs.minBy(_._2)
    }
    val (rowRule, tRule) = {
      spark.conf.set(threshold, "-1")
      try {
        val p = fn(spark, dir).queryExecution.executedPlan.toString
        require(p.contains("graft_rank_pid"), "fill passes did not re-plan")
        best("rule")
      } finally spark.conf.set(threshold, "10485760")
    }
    // same threshold in both arms so the strata joins are identical
    // and the arms differ ONLY in the fill passes
    val (rowNaive, tNaive) = {
      spark.conf.set(threshold, "-1")
      try RuleToggle.withExcluded(spark, rule)(best("naive"))
      finally spark.conf.set(threshold, "10485760")
    }
    require(rowRule == rowNaive,
      s"q252 diverged:\n  rule : $rowRule\n  naive: $rowNaive")
    println(s"""{"mode":"q252","dir":"$dir","t_rule":${f"$tRule%.2f"},""" +
      s""""t_naive":${f"$tNaive%.2f"},"row_identical":true}""")
    spark.stop()
  }
}
