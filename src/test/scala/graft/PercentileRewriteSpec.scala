package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The PercentileRewrite optimizer rule: a naive GLOBAL exact
  * `percentile`/`median` aggregate over an above-threshold input must
  * re-plan as distributed order-statistic selection (count + global
  * row_number — itself re-planned by GlobalRankRewrite — + positional
  * filter + 1-row interpolation) with BIT-EQUAL results, and must stand
  * down for grouped aggregates, mixed columns, DISTINCT, non-unit
  * frequency, and below-threshold inputs.
  */
class PercentileRewriteSpec extends SparkSpecBase {

  private val threshold = "spark.sql.autoBroadcastJoinThreshold"

  private def forced[T](body: => T): T = {
    val old = spark.conf.get(threshold)
    spark.conf.set(threshold, "-1")
    try body finally spark.conf.set(threshold, old)
  }

  /** Both rules excluded — the true naive OpenHashMap aggregate. */
  private def naive[T](body: => T): T = {
    val key = "spark.sql.optimizer.excludedRules"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "graft.plans.PercentileRewrite,graft.plans.GlobalRankRewrite")
    try body
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def bits(d: Any): Any = d match {
    case x: Double => java.lang.Double.doubleToLongBits(x)
    case s: collection.Seq[_] => s.map(bits)
    case other => other
  }

  /** Collect a 1-row aggregate and normalize doubles to bit patterns so
    * NaN compares equal and ulp drift fails loudly. */
  private def row(df: DataFrame): Seq[Any] =
    df.collect().head.toSeq.map(bits)

  private def corpus(n: Int): DataFrame =
    spark.range(n.toLong).select(col("id"),
      (col("id") * 1103515245L % 9973L).cast("double").as("v"))

  private def check(build: () => DataFrame,
      expectFire: Boolean = true): Unit = {
    val expected = naive(row(build()))
    forced {
      val r = build()
      val p = r.queryExecution.executedPlan.toString
      if (expectFire) {
        assert(!p.toLowerCase.contains("percentile"),
          s"rule must remove the hash-map aggregate:\n${p.take(3000)}")
        assert(p.contains("graft_pct_rn") && p.contains("graft_rank_pid"),
          s"rank selection must compose with GlobalRankRewrite:\n${p.take(3000)}")
      }
      assert(row(r) === expected)
    }
  }

  test("global median: distributed selection, bit-equal (odd and even n)") {
    check(() => corpus(4001).agg(expr("median(v)").as("m")))
    check(() => corpus(4000).agg(expr("median(v)").as("m")))
  }

  test("percentile ladder p50/p90/p99 over one column shares one pipeline") {
    val build = () => corpus(5000).agg(
      expr("percentile(v, 0.5d)").as("p50"),
      expr("percentile(v, 0.9d)").as("p90"),
      expr("percentile(v, 0.99d)").as("p99"))
    val expected = naive(row(build()))
    forced {
      val r = build()
      val p = r.queryExecution.executedPlan.toString
      assert(!p.toLowerCase.contains("percentile"))
      // one shared rank pipeline: a single graft_pct_rn window chain
      assert(p.linesIterator.count(_.contains("graft_pct_n#")) > 0)
      assert(row(r) === expected)
    }
  }

  test("array percentage returns array<double>, bit-equal") {
    check(() => corpus(3000).agg(
      expr("percentile(v, array(0.25d, 0.5d, 0.75d))").as("qs")))
  }

  test("integer column, interpolated position") {
    check(() => spark.range(1000).select((col("id") % 97).cast("int").as("k"))
      .agg(expr("percentile(k, 0.37d)").as("p")))
  }

  test("p=0 and p=1 hit the extremes") {
    check(() => corpus(2000).agg(
      expr("percentile(v, 0.0d)").as("lo"),
      expr("percentile(v, 1.0d)").as("hi")))
  }

  test("nulls ignored; all-null and empty inputs yield null") {
    check(() => corpus(3000)
      .select(when(col("id") % 7 === 0, col("v")).as("v"))
      .agg(expr("median(v)").as("m")))
    // all-null / empty: the selection plan collapses to a null row just
    // like the native aggregate (fire not asserted — empty relations
    // constant-fold before the window survives)
    val allNull = spark.range(500).select(lit(null).cast("double").as("v"))
      .agg(expr("median(v)").as("m"))
    val empty = corpus(100).where(col("id") < -1)
      .agg(expr("median(v)").as("m"))
    forced {
      assert(row(allNull) === Seq(null))
      assert(row(empty) === Seq(null))
    }
  }

  test("NaN and infinities follow the native ordering") {
    val df = corpus(2000).select(
      when(col("id") === 0, lit(Double.NaN))
        .when(col("id") === 1, lit(Double.PositiveInfinity))
        .when(col("id") === 2, lit(Double.NegativeInfinity))
        .otherwise(col("v")).as("v"))
    check(() => df.agg(
      expr("percentile(v, 0.999d)").as("hi"),
      expr("percentile(v, 0.001d)").as("lo")))
  }

  test("percentile_cont DESC (reverse) flips the selection order") {
    val t = corpus(3000)
    t.createOrReplaceTempView("graft_pct_rev")
    check(() => spark.sql(
      """SELECT percentile_cont(0.9d) WITHIN GROUP (ORDER BY v DESC) AS p
        |FROM graft_pct_rev""".stripMargin))
  }

  test("ties: duplicate boundary values take the equal-key short-circuit") {
    // 10 distinct values × 500 copies: most positions land inside a run
    // of equal keys, where the native path returns the value without
    // interpolating — the rewrite must hit the same branch bit-for-bit
    check(() => spark.range(5000).select((col("id") % 10).cast("double").as("v"))
      .agg(expr("percentile(v, 0.45d)").as("p"),
        expr("percentile(v, 0.5d)").as("q")))
  }

  test("stand-downs: grouped, mixed columns, distinct, frequency, disc") {
    def keepsNative(df: DataFrame): Unit = forced {
      val p = df.queryExecution.executedPlan.toString
      assert(p.toLowerCase.contains("percentile"),
        s"must stand down:\n${p.take(2000)}")
    }
    val t = corpus(3000)
    keepsNative(t.groupBy((col("id") % 3).as("g"))
      .agg(expr("percentile(v, 0.5d)").as("p")))
    keepsNative(t.agg(expr("percentile(v, 0.5d)").as("a"),
      expr("percentile(id, 0.5d)").as("b")))
    keepsNative(t.agg(expr("percentile(DISTINCT v, 0.5d)").as("p")))
    keepsNative(t.agg(expr("percentile(v, 0.5d, 2)").as("p")))
    t.createOrReplaceTempView("graft_pct_disc")
    keepsNative(spark.sql(
      "SELECT percentile_disc(0.5d) WITHIN GROUP (ORDER BY v) AS p " +
        "FROM graft_pct_disc"))
    // mixed percentile + other aggregate stands down too
    keepsNative(t.agg(expr("percentile(v, 0.5d)").as("p"),
      sum(col("v")).as("s")))
  }

  test("below-threshold inputs keep the native hash-map aggregate") {
    // default 10 MB threshold; 3000 projected doubles are far below it
    val df = corpus(3000).agg(expr("median(v)").as("m"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("percentile"),
      s"small input must stand down:\n${p.take(2000)}")
  }
}
