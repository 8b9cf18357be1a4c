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

  test("mixed ASC+DESC percentile ladders share one pipeline") {
    // real profiling queries ask for p01 and a DESC-ordered spec
    // together: the pipeline runs ascending and the DESC targets select
    // MIRRORED positions n+1−k (the multiset order-statistic identity),
    // bit-equal to the native descending sort
    val t = corpus(4000)
    t.createOrReplaceTempView("graft_pct_mix")
    check(() => spark.sql(
      """SELECT percentile(v, 0.01d) AS a01,
        | percentile(v, 0.99d) AS a99,
        | percentile_cont(0.01d) WITHIN GROUP (ORDER BY v DESC) AS d01,
        | percentile_cont(0.9d) WITHIN GROUP (ORDER BY v DESC) AS d90
        |FROM graft_pct_mix""".stripMargin))
    // ties: mirrored positions must read through runs of equal keys
    // and hit the same equal-value short-circuit
    spark.range(5000).select((col("id") % 10).cast("double").as("v"))
      .createOrReplaceTempView("graft_pct_mixt")
    check(() => spark.sql(
      """SELECT percentile(v, 0.45d) AS a45,
        | percentile_cont(0.45d) WITHIN GROUP (ORDER BY v DESC) AS d45
        |FROM graft_pct_mixt""".stripMargin))
  }

  test("mixed-direction disc + cont, and grouped mixed ladders") {
    val t = corpus(4000)
    t.createOrReplaceTempView("graft_pct_mixg")
    check(() => spark.sql(
      """SELECT percentile_disc(0.25d) WITHIN GROUP (ORDER BY v) AS q1,
        | percentile_disc(0.25d) WITHIN GROUP (ORDER BY v DESC) AS q3d,
        | percentile_cont(0.5d) WITHIN GROUP (ORDER BY v DESC) AS md
        |FROM graft_pct_mixg""".stripMargin))
    // grouped: bounded pmod domain, per-group mirrored selection
    val build = () => spark.sql(
      """SELECT pmod(id, 5) AS g,
        | percentile(v, 0.9d) AS a90,
        | percentile_cont(0.9d) WITHIN GROUP (ORDER BY v DESC) AS d90
        |FROM graft_pct_mixg GROUP BY pmod(id, 5)""".stripMargin)
    val expected = naive(rows(build()))
    forced {
      val r = build()
      assert(!r.queryExecution.executedPlan.toString.toLowerCase
        .contains("percentile"))
      assert(rows(r) === expected)
    }
  }

  test("ride-along exact aggregates join back: the profile query fires") {
    // count/min/max/exact-sum next to the median — the canonical
    // profile query, re-emitted in a 1-row side aggregate and
    // cross-joined back; every slot bit-equal to the one-pass naive
    val build = () => corpus(5000)
      .select(col("id"), col("v"), (col("id") % 1000L).as("w"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("w")).as("ndv"), // DISTINCT is set-based —
        // order-insensitive, rides along like any exact aggregate
        min(col("v")).as("lo"),
        max(col("v")).as("hi"),
        sum(col("w")).as("sw"),
        expr("median(v)").as("p50"),
        expr("percentile(v, 0.95d)").as("p95"))
    val expected = naive(row(build()))
    forced {
      val r = build()
      val p = r.queryExecution.executedPlan.toString
      assert(!p.toLowerCase.contains("percentile"),
        s"profile query must fire:\n${p.take(3000)}")
      assert(row(r) === expected)
    }
    // grouped: per-group side aggregate joins on the bounded keys
    val gb = () => corpus(5000)
      .select(col("id"), col("v"), (col("id") % 1000L).as("w"))
      .groupBy(pmod(col("id"), lit(5)).as("g"))
      .agg(count(lit(1)).as("n"), max(col("v")).as("hi"),
        expr("median(v)").as("p50"))
    val eg = naive(rows(gb()))
    forced {
      val r = gb()
      assert(!r.queryExecution.executedPlan.toString.toLowerCase
        .contains("percentile"))
      assert(rows(r) === eg)
    }
    // all-null-value tier keeps its row with live ride-alongs
    val gn = () => corpus(5000)
      .select(col("id"),
        when(pmod(col("id"), lit(3)) === 0, lit(null).cast("double"))
          .otherwise(col("v")).as("v"))
      .groupBy(pmod(col("id"), lit(3)).as("g"))
      .agg(count(lit(1)).as("n"), expr("median(v)").as("p50"))
    val en = naive(rows(gn()))
    forced { assert(rows(gn()) === en) }
    // double-typed ride-alongs stand down (fold-order ulps): sum(v)
    // over doubles keeps the native one-pass plan
    forced {
      val p = corpus(5000).agg(sum(col("v")).as("s"),
        expr("median(v)").as("m"))
        .queryExecution.executedPlan.toString
      assert(p.toLowerCase.contains("percentile"),
        s"double sum must stand down:\n${p.take(2000)}")
    }
  }

  test("ties: duplicate boundary values take the equal-key short-circuit") {
    // 10 distinct values × 500 copies: most positions land inside a run
    // of equal keys, where the native path returns the value without
    // interpolating — the rewrite must hit the same branch bit-for-bit
    check(() => spark.range(5000).select((col("id") % 10).cast("double").as("v"))
      .agg(expr("percentile(v, 0.45d)").as("p"),
        expr("percentile(v, 0.5d)").as("q")))
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.map(bits)).toSeq
      .sortBy(_.mkString("|"))

  test("bounded-group percentile ladder: per-group distributed, bit-equal") {
    // pmod key: provable 5-group domain → the grouped path fires and the
    // emitted bounded-partition window is GlobalRankRewrite's to re-plan
    val build = () => corpus(5000)
      .groupBy(pmod(col("id"), lit(5)).as("g"))
      .agg(expr("median(v)").as("p50"),
        expr("percentile(v, 0.9d)").as("p90"))
    val expected = naive(rows(build()))
    forced {
      val r = build()
      val p = r.queryExecution.executedPlan.toString
      assert(!p.toLowerCase.contains("percentile"),
        s"grouped rule must remove the hash-map aggregate:\n${p.take(3000)}")
      assert(p.contains("graft_pct_rn") && p.contains("graft_rank_pid"),
        s"bounded-group rank must compose with GlobalRankRewrite:\n${p.take(3000)}")
      assert(rows(r) === expected)
    }
  }

  test("CASE-ladder groups with an all-null-value tier keep their row") {
    // tier 'd' (id%7==3) has only null values — the native plan still
    // emits its group row with a null percentile; the left-outer
    // assembly must reproduce it
    val df = corpus(4000).select(
      when(col("id") % 7 === 0, "a").when(col("id") % 7 === 1, "b")
        .when(col("id") % 7 === 3, "d").otherwise("c").as("tier"),
      when(col("id") % 7 === 3, lit(null).cast("double"))
        .otherwise(col("v")).as("v"))
    val build = () => df.groupBy(col("tier"))
      .agg(expr("percentile(v, 0.5d)").as("p"))
    // tier is an ATTRIBUTE of df here — push the CASE into the groupBy
    // so the domain is provable
    val build2 = () => corpus(4000).select(col("id"),
      when(col("id") % 7 === 3, lit(null).cast("double"))
        .otherwise(col("v")).as("v"))
      .groupBy(
        when(col("id") % 7 === 0, "a").when(col("id") % 7 === 1, "b")
          .when(col("id") % 7 === 3, "d").otherwise("c").as("tier"))
      .agg(expr("percentile(v, 0.5d)").as("p"))
    val expected = naive(rows(build2()))
    forced {
      val r = build2()
      val p = r.queryExecution.executedPlan.toString
      assert(!p.toLowerCase.contains("percentile"),
        s"CASE-ladder groups must fire:\n${p.take(3000)}")
      assert(rows(r) === expected)
      assert(rows(r).exists(row => row(1) == null),
        "the all-null tier must surface with a null percentile")
    }
    // the ATTRIBUTE-grouped spelling fires too: expandOnce pierces the
    // tier alias to the CASE ladder one Project below, so the domain
    // proof survives the select() hop (a SOURCE column with no defining
    // expression in the plan — q38's l_returnflag — still stands down;
    // the stand-downs test pins groupBy(id))
    forced {
      val r = build()
      val p = r.queryExecution.executedPlan.toString
      assert(!p.toLowerCase.contains("percentile"),
        s"alias-pierced CASE groups must fire:\n${p.take(3000)}")
      assert(rows(r) === expected)
    }
  }

  test("grouped array percentage and null group key") {
    val build = () => corpus(4000)
      .groupBy(when(col("id") % 3 === 0, lit(null).cast("int"))
        .otherwise(pmod(col("id"), lit(3)).cast("int")).as("g"))
      .agg(expr("percentile(v, array(0.25d, 0.75d))").as("iqr"))
    val expected = naive(rows(build()))
    forced {
      val r = build()
      val p = r.queryExecution.executedPlan.toString
      assert(!p.toLowerCase.contains("percentile"),
        s"null-capable bounded groups must fire:\n${p.take(3000)}")
      assert(rows(r) === expected)
    }
  }

  test("percentile_disc: positional selection, global and grouped") {
    val t = corpus(4001)
    t.createOrReplaceTempView("graft_pct_d")
    // adversarial positions: exact hits (p = k/n), boundaries, and the
    // ceil law between them
    val build = () => spark.sql(
      """SELECT
        | percentile_disc(0.0d)  WITHIN GROUP (ORDER BY v) AS d0,
        | percentile_disc(0.25d) WITHIN GROUP (ORDER BY v) AS d25,
        | percentile_disc(0.5d)  WITHIN GROUP (ORDER BY v) AS d50,
        | percentile_disc(0.75d) WITHIN GROUP (ORDER BY v) AS d75,
        | percentile_disc(1.0d)  WITHIN GROUP (ORDER BY v) AS d100
        |FROM graft_pct_d""".stripMargin)
    val expected = naive(row(build()))
    forced {
      val r = build()
      val p = r.queryExecution.executedPlan.toString
      assert(!p.toLowerCase.contains("percentile"),
        s"disc must rewrite:\n${p.take(3000)}")
      assert(row(r) === expected)
    }
    // DESC + exact-hit counts (n divisible by 4) + ties + grouped
    val t2 = spark.range(4000).select(
      pmod(col("id"), lit(4)).as("g"), (col("id") % 40).cast("double").as("v"))
    t2.createOrReplaceTempView("graft_pct_d2")
    // one shared direction per pipeline (mixed ASC+DESC stands down —
    // the ladder shares one rank order by design)
    val build2 = () => spark.sql(
      """SELECT g,
        | percentile_disc(0.5d) WITHIN GROUP (ORDER BY v DESC) AS d50r,
        | percentile_disc(0.31d) WITHIN GROUP (ORDER BY v DESC) AS d31r
        |FROM graft_pct_d2 GROUP BY g""".stripMargin)
    val expected2 = naive(rows(build2()))
    forced {
      val r = build2()
      assert(!r.queryExecution.executedPlan.toString.toLowerCase
        .contains("percentile"))
      assert(rows(r) === expected2)
    }
  }

  test("weighted global percentile: cumulative-weight selection") {
    // integral value column (the weighted path's exact-grouping gate),
    // nulls in both value and frequency, zero weights, duplicate values
    val df = spark.range(4000L).select(
      when(col("id") % 11 === 0, lit(null).cast("long"))
        .otherwise(col("id") * 1103515245L % 997L).as("v"),
      when(col("id") % 13 === 0, lit(null).cast("long"))
        .otherwise(col("id") % 7L).as("f"))
    val build = () => df.agg(
      expr("percentile(v, 0.5d, f)").as("p50"),
      expr("percentile(v, array(0.25d, 0.9d, 0.99d), f)").as("ps"))
    val expected = naive(row(build()))
    forced {
      val r = build()
      val p = r.queryExecution.executedPlan.toString
      assert(!p.toLowerCase.contains("percentile"),
        s"rule must remove the hash-map aggregate:\n${p.take(3000)}")
      assert(p.contains("graft_pct_cw") && p.contains("graft_rank_pid"),
        s"cumulative weight must compose with GlobalRankRewrite:\n${
          p.take(3000)}")
      assert(row(r) === expected)
    }
  }

  test("weighted percentile edges: all-zero weights and negative throw") {
    val zeros = spark.range(2000L).select(
      (col("id") % 101L).as("v"), lit(0L).as("f"))
    val build = () => zeros.agg(expr("percentile(v, 0.5d, f)").as("p"))
    val expected = naive(row(build()))
    assert(expected === Seq(null))
    forced { assert(row(build()) === expected) }
    // a negative frequency next to a non-null value throws on BOTH paths
    val neg = spark.range(2000L).select((col("id") % 101L).as("v"),
      when(col("id") === 1500, lit(-2L)).otherwise(col("id") % 5L).as("f"))
    val negBuild = () => neg.agg(expr("percentile(v, 0.5d, f)").as("p"))
    naive { assertThrows[Exception](row(negBuild())) }
    forced { assertThrows[Exception](row(negBuild())) }
  }

  test("weighted bounded-group percentiles: per-group pipeline") {
    // CASE-ladder tiers (provable domain), nulls in value and weight,
    // one all-null-value tier and one all-zero-weight tier keep their
    // native null row
    val df = spark.range(6000L).select(col("id"),
      when(col("id") % 5 === 4, lit(null).cast("long"))
        .otherwise(col("id") * 1103515245L % 797L).as("v"),
      when(col("id") % 5 === 3, lit(0L))
        .when(col("id") % 17 === 0, lit(null).cast("long"))
        .otherwise(col("id") % 9L).as("f"))
    val tier = when(col("id") % 5 === 4, lit("znull"))
      .when(col("id") % 5 === 3, lit("zzero"))
      .when(col("id") % 5 === 2, lit("c"))
      .when(col("id") % 5 === 1, lit("b")).otherwise(lit("a"))
    val build = () => df.groupBy(tier.as("tier")).agg(
      expr("percentile(v, 0.5d, f)").as("p50"),
      expr("percentile(v, array(0.1d, 0.95d), f)").as("ps"))
    def rows(r: DataFrame): Seq[Seq[Any]] =
      r.orderBy("tier").collect().toSeq.map(_.toSeq.map(bits))
    val expected = naive(rows(build()))
    forced {
      val r = build()
      val p = r.queryExecution.executedPlan.toString
      assert(!p.toLowerCase.contains("percentile"),
        s"rule must remove the hash-map aggregate:\n${p.take(3000)}")
      assert(p.contains("graft_pct_cw") && p.contains("graft_rank_pid"),
        s"per-group cumulative weight must compose:\n${p.take(3000)}")
      assert(rows(r) === expected)
    }
    // the select-then-group shape whose Project DROPPED the defining
    // column: the pipeline still fires and matches (group keys evaluate
    // as the original attribute), but the inner cumulative window keeps
    // its naive bounded plan — nothing below the Aggregate can
    // recompute the proof form
    val dropped = df.select(tier.as("tier"), col("v"), col("f"))
    val build2 = () => dropped.groupBy(col("tier")).agg(
      expr("percentile(v, 0.5d, f)").as("p50"),
      expr("percentile(v, array(0.1d, 0.95d), f)").as("ps"))
    val expected2 = naive(rows(build2()))
    forced {
      val r = build2()
      val p = r.queryExecution.executedPlan.toString
      assert(!p.toLowerCase.contains("percentile"),
        s"rule must still fire on the dropped-column shape:\n${
          p.take(3000)}")
      assert(rows(r) === expected2)
    }
  }

  test("weighted stand-downs: float column, grouped, mixed frequency") {
    def keepsNative(df: DataFrame): Unit = forced {
      val p = df.queryExecution.executedPlan.toString
      assert(p.toLowerCase.contains("percentile"),
        s"must stand down:\n${p.take(2000)}")
    }
    val t = spark.range(3000L).select(col("id"),
      (col("id") % 997L).as("v"),
      (col("id") % 997L).cast("double").as("vd"),
      (col("id") % 7L).as("f"))
    // floating value column: the naive buffer keys −0.0 ≠ 0.0, a hash
    // aggregate merges them — exactness doctrine stand-down
    keepsNative(t.agg(expr("percentile(vd, 0.5d, f)").as("p")))
    // weighted grouped by an ATTRIBUTE: no domain proof, stands down
    keepsNative(t.groupBy(col("v"))
      .agg(expr("percentile(v, 0.5d, f)").as("p")))
    // mixed unit and weighted frequency in one aggregate list
    keepsNative(t.agg(expr("percentile(v, 0.5d, f)").as("a"),
      expr("percentile(v, 0.5d)").as("b")))
    // mixed frequency EXPRESSIONS in one aggregate list
    keepsNative(t.agg(expr("percentile(v, 0.5d, f)").as("a"),
      expr("percentile(v, 0.5d, f + 1)").as("b")))
  }

  test("stand-downs: grouped, mixed columns, distinct, frequency") {
    def keepsNative(df: DataFrame): Unit = forced {
      val p = df.queryExecution.executedPlan.toString
      assert(p.toLowerCase.contains("percentile"),
        s"must stand down:\n${p.take(2000)}")
    }
    val t = corpus(3000)
    // an attribute group key has no provable domain bound (id%3 WOULD
    // fire since the grouped path landed — boundedDomain proves it)
    keepsNative(t.groupBy(col("id")).agg(
      expr("percentile(v, 0.5d)").as("p")))
    keepsNative(t.agg(expr("percentile(v, 0.5d)").as("a"),
      expr("percentile(id, 0.5d)").as("b")))
    keepsNative(t.agg(expr("percentile(DISTINCT v, 0.5d)").as("p")))
    keepsNative(t.agg(expr("percentile(v, 0.5d, 2)").as("p")))
    // mixed percentile + other aggregate stands down too
    keepsNative(t.agg(expr("percentile(v, 0.5d)").as("p"),
      sum(col("v")).as("s")))
  }

  test("catalog ndv stats admit attribute GROUP BY keys under CBO") {
    val t = spark
    // an ATTRIBUTE group key (seg, 23 values) only the catalog can
    // bound — `median(v) GROUP BY country` over an analyzed table is
    // the everyday spelling of the bounded-group pipeline
    corpus(5000).select(col("id"), col("v"), (col("id") % 23L).as("seg"))
      .write.mode("overwrite").saveAsTable("graft_pct_stats")
    def withCbo[T](on: Boolean)(body: => T): T = {
      val key = "spark.sql.cbo.enabled"
      val old = t.conf.get(key)
      t.conf.set(key, on.toString)
      try body finally t.conf.set(key, old)
    }
    try {
      val build = () => t.sql(
        """SELECT seg, median(v) AS m FROM graft_pct_stats
          |GROUP BY seg""".stripMargin)
      def norm(r: DataFrame) =
        r.collect().map(_.toSeq.map(bits)).sortBy(_.toString).toSeq
      forced(withCbo(true) {
        assert(build().queryExecution.executedPlan.toString
          .toLowerCase.contains("percentile"), "no stats → native")
      })
      t.sql("ANALYZE TABLE graft_pct_stats COMPUTE STATISTICS " +
        "FOR COLUMNS seg")
      forced(withCbo(false) {
        assert(build().queryExecution.executedPlan.toString
          .toLowerCase.contains("percentile"), "CBO off → native")
      })
      val expected = naive(norm(build()))
      forced(withCbo(true) {
        val r = build()
        val p = r.queryExecution.executedPlan.toString
        assert(!p.toLowerCase.contains("percentile"),
          s"ndv stats must admit the group key:\n${p.take(3000)}")
        assert(norm(r) === expected)
      })
    } finally t.sql("DROP TABLE IF EXISTS graft_pct_stats")
  }

  test("below-threshold inputs keep the native hash-map aggregate") {
    // default 10 MB threshold; 3000 projected doubles are far below it
    val df = corpus(3000).agg(expr("median(v)").as("m"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("percentile"),
      s"small input must stand down:\n${p.take(2000)}")
  }
}
