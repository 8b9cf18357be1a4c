package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The ModeRewrite optimizer rule: a naive deterministic
  * `mode() WITHIN GROUP (ORDER BY v)` aggregate must re-plan as
  * two-level hash aggregation (count per (group, value) → per-group
  * argmax over (count, value)) with results identical to the native
  * OpenHashMap aggregate — including count-tie resolution (ASC → smallest
  * tied value, DESC → largest), null-value skipping, and all-null-group
  * row survival — and must stand down for plain `mode(x)` (hash-order
  * ties), float values (±0.0 hash/GROUP-BY divergence), and
  * below-threshold inputs.
  */
class ModeRewriteSpec extends SparkSpecBase {

  private val threshold = "spark.sql.autoBroadcastJoinThreshold"

  private def forced[T](body: => T): T = {
    val old = spark.conf.get(threshold)
    spark.conf.set(threshold, "-1")
    try body finally spark.conf.set(threshold, old)
  }

  private def naive[T](body: => T): T = {
    val key = "spark.sql.optimizer.excludedRules"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "graft.plans.ModeRewrite")
    try body
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  /** skewed value distribution with a unique per-group winner */
  private def corpus(n: Int): DataFrame =
    spark.range(n.toLong).select(
      (col("id") % 7).cast("string").as("g"),
      (col("id") * col("id") % 101).as("v"))

  private def fired(df: DataFrame): Unit = {
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("mode("),
      s"rule must remove the hash-map mode:\n${p.take(3000)}")
    assert(p.contains("graft_mode_v"), s"rewrite shape:\n${p.take(3000)}")
  }

  private def keptNative(df: DataFrame): Unit = {
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("mode("), s"must stand down:\n${p.take(2000)}")
  }

  test("global deterministic mode: two-level plan, identical result") {
    val build = () => corpus(5000)
      .agg(expr("mode() WITHIN GROUP (ORDER BY v)").as("m"))
    val expected = naive(rows(build()))
    forced {
      val r = build()
      fired(r)
      assert(rows(r) === expected)
    }
  }

  test("count ties: ASC picks the smallest tied value, DESC the largest") {
    // values 10 and 20 both appear 50×, everything else once
    val df = spark.range(100).select(
      when(col("id") < 50, 10L).otherwise(20L).as("v"))
      .union(spark.range(30).select((col("id") + 100).as("v")))
    val asc = () => df.agg(
      expr("mode() WITHIN GROUP (ORDER BY v)").as("m"))
    val desc = () => df.agg(
      expr("mode() WITHIN GROUP (ORDER BY v DESC)").as("m"))
    val (ea, ed) = naive((rows(asc()), rows(desc())))
    // native contract (pinned empirically): ASC ties → smallest tied
    // value, DESC ties → largest
    assert(ea.head.head === 10L && ed.head.head === 20L,
      s"native tie contract drifted: asc=$ea desc=$ed")
    forced {
      val (ra, rd) = (asc(), desc())
      fired(ra); fired(rd)
      assert(rows(ra) === ea && rows(rd) === ed)
    }
  }

  test("grouped by attribute: fires at any grouping, groups survive " +
      "all-null values") {
    val df = corpus(4200).select(col("g"),
      when(col("g") === "3", lit(null).cast("long")).otherwise(col("v"))
        .as("v"))
    val build = () => df.groupBy(col("g"))
      .agg(expr("mode() WITHIN GROUP (ORDER BY v)").as("m"))
    val expected = naive(rows(build()))
    assert(expected.exists(r => r.head == "3" && r(1) == null),
      "fixture must contain an all-null group")
    forced {
      val r = build()
      fired(r)
      assert(rows(r) === expected)
    }
  }

  test("string values and empty input") {
    val build = () => corpus(3000)
      .select(concat(lit("s"), col("v")).as("v"))
      .agg(expr("mode() WITHIN GROUP (ORDER BY v)").as("m"))
    val expected = naive(rows(build()))
    forced { val r = build(); fired(r); assert(rows(r) === expected) }
    forced {
      val empty = corpus(100).where(col("id") < -1)
        .agg(expr("mode() WITHIN GROUP (ORDER BY v)").as("m"))
      assert(rows(empty) === Seq(Seq(null)))
    }
  }

  test("stand-downs: plain mode, float values, small input") {
    forced {
      keptNative(corpus(3000).agg(expr("mode(v)").as("m")))
      keptNative(corpus(3000).select(col("v").cast("double").as("v"))
        .agg(expr("mode() WITHIN GROUP (ORDER BY v)").as("m")))
    }
    // default threshold: tiny input keeps the native map
    keptNative(corpus(1000)
      .agg(expr("mode() WITHIN GROUP (ORDER BY v)").as("m")))
  }

  test("ride-along exact aggregates join back at group grain") {
    // count/min/max next to the mode — the side aggregate joins back
    // on null-safe group keys at the grouping's own grain
    val build = () => corpus(5000)
      .groupBy(col("g"))
      .agg(expr("mode() WITHIN GROUP (ORDER BY v)").as("m"),
        count(lit(1)).as("n"),
        min(col("v")).as("lo"),
        max(col("v")).as("hi"))
    val expected = naive(rows(build()))
    forced {
      val r = build()
      fired(r)
      assert(rows(r) === expected)
    }
    // global grain: 1-row cross assembly
    val bg = () => corpus(5000)
      .agg(expr("mode() WITHIN GROUP (ORDER BY v)").as("m"),
        count(lit(1)).as("n"))
    val eg = naive(rows(bg()))
    forced {
      val r = bg()
      fired(r)
      assert(rows(r) === eg)
    }
    // double-typed ride-alongs stand down (fold-order ulps)
    forced {
      keptNative(corpus(3000)
        .agg(expr("mode() WITHIN GROUP (ORDER BY v)").as("m"),
          sum(col("v").cast("double")).as("s")))
    }
  }

  test("mode next to percentile: rule composition both re-plan") {
    // one aggregate list carrying BOTH cliff families — whichever rule
    // fires first defers the other's slot into its side Aggregate,
    // which the other re-plans in the same fixed-point batch
    val build = () => corpus(5000)
      .groupBy(pmod(col("v"), lit(4)).as("g"))
      .agg(expr("mode() WITHIN GROUP (ORDER BY v)").as("m"),
        expr("median(v)").as("p50"),
        count(lit(1)).as("n"))
    val expected = naive(rows(build()))
    forced {
      val r = build()
      val p = r.queryExecution.executedPlan.toString
      assert(!p.contains("mode(") &&
        !p.toLowerCase.contains("percentile"),
        s"both cliff families must re-plan:\n${p.take(3000)}")
      assert(p.contains("graft_mode_v") && p.contains("graft_pct_rn"),
        s"both rewrite shapes must appear:\n${p.take(3000)}")
      assert(rows(r) === expected)
    }
  }

  test("stand-downs: binary values (native map keys bytes by reference)") {
    // native mode()'s OpenHashMap keys Array[Byte] by REFERENCE, so
    // duplicate binary values never merge their counts natively, while
    // the rewrite's GROUP BY merges by content — the two plans can pick
    // different winners (e.g. values [1,1,1,2] ORDER BY v DESC: native
    // returns 2, content-merged returns 1). Bit-equal doctrine: the
    // rule must not replace the native answer, divergent as it is.
    forced {
      keptNative(corpus(3000)
        .select(col("v").cast("string").cast("binary").as("v"))
        .agg(expr("mode() WITHIN GROUP (ORDER BY v)").as("m")))
      keptNative(corpus(3000)
        .select(col("v").cast("string").cast("binary").as("v"))
        .agg(expr("mode() WITHIN GROUP (ORDER BY v DESC)").as("m")))
    }
  }
}
