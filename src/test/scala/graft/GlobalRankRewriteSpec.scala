package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The GlobalRankRewrite optimizer rule: a user-written
  * `row_number()/ntile(k) OVER (ORDER BY …)` with no PARTITION BY must
  * plan as the distributed-rank shape (range shuffle + pid-partitioned
  * window + broadcast offsets, ONE physical shuffle via ReuseExchange)
  * with output IDENTICAL to the naive single-partition window — and
  * must stand down for unsupported functions, partitioned windows, and
  * below-threshold inputs.
  */
class GlobalRankRewriteSpec extends SparkSpecBase {

  private val threshold = "spark.sql.autoBroadcastJoinThreshold"

  /** Run `body` with the broadcast threshold disabled so the rewrite
    * fires at fixture scale (its size guard treats −1 as "always"). */
  private def forced[T](body: => T): T = {
    val old = spark.conf.get(threshold)
    spark.conf.set(threshold, "-1")
    try body finally spark.conf.set(threshold, old)
  }

  /** The naive plan, with the rule excluded — the semantics oracle. */
  private def naive[T](body: => T): T = {
    val key = "spark.sql.optimizer.excludedRules"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "graft.plans.GlobalRankRewrite")
    try body
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def corpus(n: Int): DataFrame =
    spark.range(n.toLong).select(col("id"),
      (col("id") * 1103515245L % 9973L).as("v"))

  test("global row_number plans distributed, output identical to naive") {
    val df = corpus(5000)
    val build = () => df.withColumn("rn",
      row_number().over(Window.orderBy(col("v"), col("id"))))
    val expected = naive {
      val r = build()
      assert(!r.queryExecution.executedPlan.toString.contains("graft_rank"),
        "exclusion must yield the naive plan")
      r.collect().map(x => (x.getLong(0), x.getInt(2))).sorted.toSeq
    }
    forced {
      val r = build()
      val p = r.queryExecution.executedPlan.toString
      assert(p.contains("graft_rank_pid"), s"rule must fire:\n${p.take(3000)}")
      val windows = p.linesIterator.filter(_.contains("Window ")).toList
      assert(windows.forall(_.contains("graft_rank_pid")),
        s"no corpus-grain unpartitioned window may remain:\n${p.take(4000)}")
      val got = r.collect().map(x => (x.getLong(0), x.getInt(2))).sorted.toSeq
      assert(got === expected)
    }
  }

  test("string-keyed global row_number and ntile: distributed, exact") {
    // round-6 gap: a string first key stood down to the single-partition
    // plan. Split points now stay NATIVE strings (UTF8-binary byte order
    // is shared by LessThan, sort_array, and the window ORDER BY).
    val df = corpus(5000).withColumn("fp", md5(col("v").cast("string")))
    val build = () => df
      .withColumn("rn", row_number().over(Window.orderBy(col("fp"), col("id"))))
      .withColumn("nt", ntile(7).over(Window.orderBy(col("fp"), col("id"))))
    val expected = naive(build().collect()
      .map(x => (x.getLong(0), x.getInt(3), x.getInt(4))).sorted.toSeq)
    forced {
      val r = build()
      val p = r.queryExecution.executedPlan.toString
      assert(p.contains("graft_rank_pid"),
        s"rule must fire on a string key:\n${p.take(3000)}")
      val windows = p.linesIterator.filter(_.contains("Window ")).toList
      assert(windows.forall(_.contains("graft_rank_pid")),
        s"no corpus-grain unpartitioned window may remain:\n${p.take(4000)}")
      val got = r.collect()
        .map(x => (x.getLong(0), x.getInt(3), x.getInt(4))).sorted.toSeq
      assert(got === expected)
    }
  }

  test("non-binary collation first key stands down") {
    val df = corpus(500)
      .withColumn("fp", expr("collate(cast(v as string), 'UNICODE_CI')"))
    forced {
      val r = df.withColumn("rn",
        row_number().over(Window.orderBy(col("fp"), col("id"))))
      assert(!r.queryExecution.executedPlan.toString.contains("graft_rank"),
        "collated keys must keep the naive plan")
    }
  }

  test("joined + cached child ranks exactly (the q220 regression shape)") {
    // the first rule design derived slices from RangePartitioner's
    // rdd-id-seeded sampling — two branch executions could disagree on
    // boundaries whenever exchange reuse didn't collapse them (caught by
    // q220's hilbert branch: broadcast-LUT join over a cached distinct).
    // The deterministic min/max slice must rank this shape exactly.
    val s = spark
    import s.implicits._
    val cells = spark.range(4000)
      .select((col("id") % 64).cast("int").as("x"),
        (col("id") / 64).cast("int").as("y"))
      .distinct().persist()
    try {
      val lut = (for { hx <- 0 until 64; hy <- 0 until 64 }
        yield (hx, hy, (hx * 131 + hy * 17).toLong)).toDF("hx", "hy", "h")
      val keyed = cells.join(broadcast(lut),
        col("x") === col("hx") && col("y") === col("hy"))
        .select(col("x"), col("y"), col("h"))
      val build = () => keyed.withColumn("rn",
        row_number().over(Window.orderBy(col("h"), col("x"), col("y"))))
      val expected = naive(build().collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(3))).sorted.toSeq)
      forced {
        val r = build()
        assert(r.queryExecution.executedPlan.toString
          .contains("graft_rank_pid"), "rule must fire on the joined child")
        val got = r.collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getInt(3))).sorted.toSeq
        assert(got === expected)
        // ranks must be a permutation of 1..n — no gaps, no duplicates
        val rns = got.map(_._3).sorted
        assert(rns === (1 to rns.size).toList)
      }
    } finally cells.unpersist()
  }

  test("global ntile reconstructs exactly: divisible, remainder, n < k") {
    for ((n, k) <- Seq((4000, 8), (1777, 3), (2, 5))) {
      val df = corpus(n)
      val build = () => df.withColumn("t",
        ntile(k).over(Window.orderBy(col("v"), col("id"))))
      val expected = naive(build().collect()
        .map(x => (x.getLong(0), x.getInt(2))).sorted.toSeq)
      forced {
        val r = build()
        assert(r.queryExecution.executedPlan.toString
          .contains("graft_rank_pid"), s"rule must fire at n=$n k=$k")
        val got = r.collect().map(x => (x.getLong(0), x.getInt(2)))
          .sorted.toSeq
        assert(got === expected, s"ntile mismatch at n=$n k=$k")
      }
    }
  }

  test("date and timestamp first keys slice as epoch days/micros") {
    val df = spark.range(2000).select(col("id"),
      date_add(lit(java.sql.Date.valueOf("2020-01-01")),
        (col("id") * 37 % 365).cast("int")).as("d"),
      timestamp_seconds(col("id") * 1103515245L % 999983L).as("ts"))
    for (key <- Seq("d", "ts")) {
      val build = () => df.withColumn("rn",
        row_number().over(Window.orderBy(col(key), col("id"))))
      val expected = naive(build().collect()
        .map(x => (x.getLong(0), x.getInt(3))).sorted.toSeq)
      forced {
        val r = build()
        assert(r.queryExecution.executedPlan.toString
          .contains("graft_rank_pid"), s"rule must fire on $key key")
        val got = r.collect().map(x => (x.getLong(0), x.getInt(3)))
          .sorted.toSeq
        assert(got === expected, s"$key-keyed rank mismatch")
      }
    }
  }

  test("descending keys and multiple rank columns in one window") {
    val df = corpus(3000)
    val build = () => df.select(col("id"),
      row_number().over(Window.orderBy(col("v").desc, col("id"))).as("rn"),
      ntile(7).over(Window.orderBy(col("v").desc, col("id"))).as("t"))
    val expected = naive(build().collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getInt(2))).sorted.toSeq)
    forced {
      val got = build().collect()
        .map(x => (x.getLong(0), x.getInt(1), x.getInt(2))).sorted.toSeq
      assert(got === expected)
    }
  }

  test("q285: the naively-authored corpus decile plans via the rule, same rows") {
    val build = () =>
      SparkEntry.queries("q285_global_ntile_rule")(spark,
        "/root/testdata/sf0.001")
    val expected = naive(build().collect().map(_.toString).toSeq)
    forced {
      val r = build()
      assert(r.queryExecution.executedPlan.toString
        .contains("graft_rank_pid"),
        "the engine must own q285's scale plan under a forced threshold")
      assert(r.collect().map(_.toString).toSeq === expected)
    }
  }

  test("skewed keys: frequency-adaptive slices stay balanced, output exact") {
    // value-skewed key (most rows pile into the low end): equal-width
    // slicing went hot here; the sampled split points must keep the
    // biggest slice within a small multiple of the mean
    val df = spark.range(60000).select(col("id"),
      call_function("div", lit(1000000L), col("id") % 997L + 1L).as("v"))
    val build = () => df.withColumn("rn",
      row_number().over(Window.orderBy(col("v"), col("id"))))
    val expected = naive(build().collect()
      .map(x => (x.getLong(0), x.getInt(2))).sorted.toSeq)
    forced {
      val r = build()
      val p = r.queryExecution.executedPlan.toString
      assert(p.contains("graft_rank_pid"), "rule must fire")
      val got = r.collect().map(x => (x.getLong(0), x.getInt(2))).sorted.toSeq
      assert(got === expected)
      // balance: reconstruct the slice histogram from contiguous rank
      // runs — with P slices over n rows, the hottest slice must hold
      // well under the whole relation (equal-width put ~all rows in one)
      val nSlices = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val byV = df.groupBy("v").count().collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      // the 997 distinct values imply ≥ P−1 split candidates, so a
      // degenerate one-slice plan would only happen if sampling broke
      assert(byV.length > nSlices, "fixture must have enough distinct keys")
    }
  }

  test("constant and 2-value first keys: bounded sample, output exact") {
    // the first sampling cut hashed ONLY the first key, so a constant
    // key either collected the whole relation into the 1-row boundary
    // aggregate or sampled nothing; the full-row hash + collect_set
    // bounds the buffer at min(NDV, ~targetSamples) — here ≤ 2 elements
    // — while slices degenerate gracefully (ties can never split)
    for (ndv <- Seq(1L, 2L)) {
      val df = spark.range(5000).select(col("id"),
        (col("id") % ndv).as("v"))
      val build = () => df.withColumn("rn",
        row_number().over(Window.orderBy(col("v"), col("id"))))
      val expected = naive(build().collect()
        .map(x => (x.getLong(0), x.getInt(2))).sorted.toSeq)
      forced {
        val r = build()
        assert(r.queryExecution.executedPlan.toString
          .contains("graft_rank_pid"), s"rule must fire at ndv=$ndv")
        val got = r.collect().map(x => (x.getLong(0), x.getInt(2)))
          .sorted.toSeq
        assert(got === expected, s"rank mismatch at ndv=$ndv")
      }
    }
  }

  test("stand-downs: partitioned, mixed agg, below threshold") {
    val df = corpus(1000)
    forced {
      // attribute-partitioned window: the domain of `v` is not provable
      // from the plan, so the pigeonhole gate cannot admit it (bounded
      // DERIVED partitions like id % 3 rewrite since round 8)
      val part = df.withColumn("rn", row_number().over(
        Window.partitionBy(col("v")).orderBy(col("v"), col("id"))))
      assert(!part.queryExecution.executedPlan.toString
        .contains("graft_rank_pid"))
      // bounded shape but bound above maxGroups: id % 100 proves only
      // |domain| ≤ 200 — too many groups to justify the machinery
      val wide = df.withColumn("rn", row_number().over(
        Window.partitionBy(col("id") % 100).orderBy(col("v"), col("id"))))
      assert(!wide.queryExecution.executedPlan.toString
        .contains("graft_rank_pid"))
      // DOUBLE running sum: accumulation order differs by ulps from the
      // naive row-by-row fold — exact-type doctrine stands it down
      // (integral/decimal sums rewrite since round 7)
      val dbl = df.withColumn("d", col("v").cast("double"))
        .select(col("id"),
          sum("d").over(Window.orderBy(col("v"), col("id"))).as("s"))
      assert(!dbl.queryExecution.executedPlan.toString
        .contains("graft_rank_pid"))
      // (a moving DOUBLE sum used to stand down here — since the ghost-
      // block path it rewrites bit-exactly; see the ghost-frame test)
    }
    // default threshold: a tiny input executes fine in one task
    val small = df.withColumn("rn",
      row_number().over(Window.orderBy(col("v"), col("id"))))
    assert(!small.queryExecution.executedPlan.toString
      .contains("graft_rank_pid"),
      "below-threshold inputs must keep the naive plan")
  }

  test("rank/dense_rank/percent_rank with heavy ties: distributed, exact") {
    // round-6 stood these down ("tie semantics need a total order") —
    // over-conservative: equal ORDER BY tuples share a first key and
    // therefore a slice, so per-slice ranks + whole-slice offsets are
    // exact. v % 40 gives ~125-row tie groups across slice boundaries.
    val df = corpus(5000).withColumn("t", col("v") % 40)
    val w = Window.orderBy(col("t"))
    val build = () => df.select(col("id"), col("t"),
      rank().over(w).as("rk"),
      dense_rank().over(w).as("dr"),
      percent_rank().over(w).as("pr"),
      cume_dist().over(w).as("cd"))
    val expected = naive(build().collect()
      .map(x => (x.getLong(0), x.getInt(2), x.getInt(3), x.getDouble(4),
        x.getDouble(5))).sorted.toSeq)
    forced {
      val r = build()
      val p = r.queryExecution.executedPlan.toString
      assert(p.contains("graft_rank_pid"),
        s"rule must fire on rank family:\n${p.take(3000)}")
      val windows = p.linesIterator.filter(_.contains("Window ")).toList
      assert(windows.forall(_.contains("graft_rank")),
        s"no corpus-grain unpartitioned window may remain:\n${p.take(4000)}")
      val got = r.collect()
        .map(x => (x.getLong(0), x.getInt(2), x.getInt(3), x.getDouble(4),
          x.getDouble(5))).sorted.toSeq
      assert(got === expected)
    }
  }

  test("cumulative aggregates: running sum/count/min/max/avg, exact") {
    // round-7 extension: global UP..CR aggregate windows decompose as
    // per-slice running value + exclusive prefix-combine of slice
    // totals. ROWS frame over a TOTAL order (exactness needs a
    // deterministic row sequence, same as row_number).
    val df = corpus(5000).withColumn("m",
      when(col("id") % 11 === 0, lit(null)).otherwise(col("v") - 5000))
    val w = Window.orderBy(col("v"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val build = () => df.select(col("id"),
      sum("m").over(w).as("s"),
      count("m").over(w).as("c"),
      min("m").over(w).as("mn"),
      max("m").over(w).as("mx"),
      avg("m").over(w).as("a"))
    def collect(r: org.apache.spark.sql.DataFrame) = r.collect()
      .map(x => (x.getLong(0),
        if (x.isNullAt(1)) None else Some(x.getLong(1)),
        x.getLong(2),
        if (x.isNullAt(3)) None else Some(x.getLong(3)),
        if (x.isNullAt(4)) None else Some(x.getLong(4)),
        if (x.isNullAt(5)) None else Some(x.getDouble(5))))
      .sorted.toSeq
    val expected = naive(collect(build()))
    forced {
      val r = build()
      val p = r.queryExecution.executedPlan.toString
      assert(p.contains("graft_rank_pid"),
        s"rule must fire on cumulative aggs:\n${p.take(3000)}")
      val windows = p.linesIterator.filter(_.contains("Window ")).toList
      assert(windows.forall(_.contains("graft_rank")),
        s"no corpus-grain unpartitioned window may remain:\n${p.take(4000)}")
      assert(collect(r) === expected)
    }
  }

  test("cumulative RANGE frame with ties matches naive (default frame)") {
    // default agg-with-ORDER-BY frame is RANGE UP..CR: all tied rows
    // share the group total — well-defined under ties, slice-safe
    val df = corpus(4000).withColumn("t", col("v") % 37)
    val w = Window.orderBy(col("t")) // ties + default RANGE frame
    val build = () => df.select(col("id"),
      sum("v").over(w).as("s"),
      count(lit(1)).over(w).as("c"))
    val expected = naive(build().collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).sorted.toSeq)
    forced {
      val r = build()
      assert(r.queryExecution.executedPlan.toString
        .contains("graft_rank_pid"))
      val got = r.collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).sorted.toSeq
      assert(got === expected)
    }
  }

  test("rank family combined with row_number and ntile in one window") {
    val df = corpus(3000).withColumn("t", col("v") % 17)
    val w = Window.orderBy(col("t"), col("id"))
    val build = () => df.select(col("id"),
      row_number().over(w).as("rn"),
      rank().over(w).as("rk"),
      dense_rank().over(w).as("dr"),
      ntile(6).over(w).as("nt"))
    val expected = naive(build().collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getInt(2), x.getInt(3),
        x.getInt(4))).sorted.toSeq)
    forced {
      val r = build()
      assert(r.queryExecution.executedPlan.toString
        .contains("graft_rank_pid"))
      val got = r.collect()
        .map(x => (x.getLong(0), x.getInt(1), x.getInt(2), x.getInt(3),
          x.getInt(4))).sorted.toSeq
      assert(got === expected)
    }
  }

  // --- round-8: global lead/lag of ORDER-key-derived inputs ----------------

  test("global lag/lead of key functions: distributed, exact per row") {
    val df = corpus(5000)
    val w = Window.orderBy(col("v"), col("id"))
    val build = () => df.select(col("id"), col("v"),
      lag(col("v"), 1).over(w).as("prev"),
      lead(col("v") * 2L, 2, -1L).over(w).as("nxt2"),
      row_number().over(w).as("rn"))
    def rows(r: DataFrame) = r.collect().map(x => (x.getLong(0),
      if (x.isNullAt(2)) -999L else x.getLong(2),
      x.getLong(3), x.getInt(4))).sorted.toSeq
    val expected = naive {
      val r = build()
      assert(!r.queryExecution.executedPlan.toString.contains("graft_rank"))
      rows(r)
    }
    forced {
      val r = build()
      val p = r.queryExecution.executedPlan.toString
      assert(p.contains("graft_rank_jrn"),
        s"lead/lag rewrite must fire:\n${p.take(3000)}")
      val windows = p.linesIterator.filter(_.contains("Window ")).toList
      assert(windows.forall(_.contains("graft_rank_pid")),
        s"no corpus-grain unpartitioned window may remain:\n${p.take(4000)}")
      assert(rows(r) === expected)
    }
  }

  test("lag under heavy key ties: exact as a (key, lag) bag") {
    // with a non-total order, tied ROWS may swap positions between the
    // two executions the rewrite joins — eligibility restricts inputs
    // to functions of the ORDER BY tuple precisely so the VALUE at each
    // sorted position is still unique. Per-row ids are not comparable
    // under ties (true of the naive plan across runs too), so the
    // contract is the (key, lag-value) multiset.
    val df = corpus(4000).withColumn("b", col("v") % 5L)
    val w = Window.orderBy(col("b"))
    val build = () => df.select(col("b"), lag(col("b"), 1).over(w).as("p"))
    def bag(r: DataFrame) = r.collect().map(x => (x.getLong(0),
      if (x.isNullAt(1)) -1L else x.getLong(1))).sorted.toSeq
    val expected = naive(bag(build()))
    forced {
      val r = build()
      assert(r.queryExecution.executedPlan.toString
        .contains("graft_rank_jrn"))
      assert(bag(build()) === expected)
    }
  }

  test("lag of a NON-key column stands down (tie-stitch hazard)") {
    val df = corpus(3000).withColumn("payload", col("id") * 31L)
    forced {
      val r = df.select(col("id"),
        lag(col("payload"), 1).over(Window.orderBy(col("v"))).as("p"))
      assert(!r.queryExecution.executedPlan.toString.contains("graft_rank"),
        "payload is not a function of the order keys — must stand down")
    }
  }

  test("global moving sum/count: distributed, exact incl. null runs, " +
    "over-wide frames, and a mixed window") {
    // moving(i) = cum(i) − cum(i−n−1); the paired cumulative count
    // restores SQL null semantics exactly (x has both scattered nulls
    // and a solid null run longer than the frame, so fully-null frames
    // occur), the 100000-row frame degenerates to the cumulative case,
    // and row_number shares the node to exercise unit mixing.
    val df = corpus(5000).withColumn("x",
      when(col("v") % 7 === 0 || col("v") < 600, lit(null).cast("long"))
        .otherwise(col("v")))
    val w = Window.orderBy(col("v"), col("id")).rowsBetween(-9, 0)
    val wAll = Window.orderBy(col("v"), col("id")).rowsBetween(-100000, 0)
    val build = () => df.select(col("id"),
      sum(col("x")).over(w).as("ms"),
      count(col("x")).over(w).as("mc"),
      count(lit(1)).over(w).as("mn"),
      sum(col("x")).over(wAll).as("mw"),
      row_number().over(Window.orderBy(col("v"), col("id"))).as("rn"))
    def rows(r: DataFrame) = r.collect().map(x => (x.getLong(0),
      if (x.isNullAt(1)) Long.MinValue else x.getLong(1),
      x.getLong(2), x.getLong(3),
      if (x.isNullAt(4)) Long.MinValue else x.getLong(4),
      x.getInt(5))).sorted.toSeq
    val expected = naive(rows(build()))
    forced {
      val r = build()
      val p = r.queryExecution.executedPlan.toString
      assert(p.contains("graft_rank_pid"), s"rule must fire:\n${p.take(3000)}")
      assert(p.contains("graft_rank_jrn"),
        "the cum-fetch self-join must exist")
      val windows = p.linesIterator.filter(_.contains("Window ")).toList
      assert(windows.forall(_.contains("graft_rank_pid")),
        s"no corpus-grain unpartitioned window may remain:\n${p.take(4000)}")
      assert(rows(build()) === expected)
    }
  }

  test("moving sum under heavy key ties: exact as a (key, values) bag") {
    // with ties, WHICH tied row holds position i is arbitrary in the
    // naive plan too — the deterministic object is the multiset of
    // (key, moving values) pairs, which both plans must share exactly
    val df = corpus(4000).withColumn("b", col("v") % 5L)
    val w = Window.orderBy(col("b")).rowsBetween(-6, 0)
    val build = () => df.select(col("b"),
      sum(col("b") * 3L).over(w).as("ms"),
      count(lit(1)).over(w).as("mn"))
    def bag(r: DataFrame) = r.collect().map(x =>
      (x.getLong(0), x.getLong(1), x.getLong(2))).sorted.toSeq
    val expected = naive(bag(build()))
    forced {
      assert(build().queryExecution.executedPlan.toString
        .contains("graft_rank_jrn"))
      assert(bag(build()) === expected)
    }
  }

  test("bounded-domain partitioned windows: whole family, exact per row") {
    // PARTITION BY id % 3 — a provably ≤4-value domain, so the naive
    // plan's parallelism is capped at 4 tasks at ANY size (pigeonhole);
    // the rewrite runs every family member per (group, slice) with
    // per-group offsets. Unique in-group order → per-row parity.
    val df = corpus(6000)
    val w = Window.partitionBy(col("id") % 3).orderBy(col("v"), col("id"))
    val build = () => df.select(col("id"),
      row_number().over(w).as("rn"),
      rank().over(w).as("rk"),
      dense_rank().over(w).as("dr"),
      ntile(5).over(w).as("nt"),
      sum(col("v")).over(w.rowsBetween(
        Window.unboundedPreceding, Window.currentRow)).as("cs"))
    def rows(r: DataFrame) = r.collect().map(x => (x.getLong(0),
      x.getInt(1), x.getInt(2), x.getInt(3), x.getInt(4), x.getLong(5)))
      .sorted.toSeq
    val expected = naive(rows(build()))
    forced {
      val r = build()
      val p = r.queryExecution.executedPlan.toString
      assert(p.contains("graft_rank_pid"), s"rule must fire:\n${p.take(3000)}")
      val windows = p.linesIterator.filter(_.contains("Window ")).toList
      assert(windows.forall(_.contains("graft_rank_pid")),
        s"every window must carry the slice id:\n${p.take(4000)}")
      assert(rows(build()) === expected)
    }
  }

  test("partitioned lead/lag + moving sum stay group-confined") {
    // lag at each group's first row must be null (no cross-group
    // stitch), moving frames must not leak across groups; a NULLABLE
    // pmod partition key exercises the null group end-to-end
    val df = corpus(4000).withColumn("x",
      when(col("id") % 11 === 0, lit(null).cast("long"))
        .otherwise(col("v")))
    val w = Window.partitionBy(pmod(col("x"), lit(3L)))
      .orderBy(col("v"), col("id"))
    val build = () => df.select(col("id"),
      lag(col("v"), 1).over(w).as("pv"),
      sum(col("v")).over(w.rowsBetween(-7, 0)).as("ms"),
      count(lit(1)).over(w.rowsBetween(-7, 0)).as("mn"))
    def rows(r: DataFrame) = r.collect().map(x => (x.getLong(0),
      if (x.isNullAt(1)) Long.MinValue else x.getLong(1),
      x.getLong(2), x.getLong(3))).sorted.toSeq
    val expected = naive(rows(build()))
    forced {
      val r = build()
      val p = r.queryExecution.executedPlan.toString
      assert(p.contains("graft_rank_jrn"), s"self-join must exist:\n${p.take(2500)}")
      assert(rows(build()) === expected)
    }
  }

  test("CASE-ladder partition key (all-literal tiers) rewrites exactly") {
    val df = corpus(5000)
    val tier = when(col("v") < 3000, lit("low"))
      .when(col("v") < 7000, lit("mid")).otherwise(lit("high"))
    val w = Window.partitionBy(tier).orderBy(col("v"), col("id"))
    val build = () => df.select(col("id"), tier.as("tier"),
      row_number().over(w).as("rn"),
      cume_dist().over(w).as("cd"))
    def rows(r: DataFrame) = r.collect().map(x => (x.getLong(0),
      x.getString(1), x.getInt(2),
      BigDecimal(x.getDouble(3)).setScale(9, BigDecimal.RoundingMode.HALF_UP)))
      .sorted.toSeq
    val expected = naive(rows(build()))
    forced {
      val r = build()
      assert(r.queryExecution.executedPlan.toString
        .contains("graft_rank_pid"))
      assert(rows(build()) === expected)
    }
  }

  test("moving frames stand down: non-key input; RANGE goes value-band") {
    val df = corpus(3000).withColumn("payload", col("id") * 31L)
    forced {
      // ROWS frame with a non-key input: tie-order-dependent even in
      // the naive plan — stands down entirely
      val rows = df.select(
        sum(col("payload")).over(Window.orderBy(col("v"))
          .rowsBetween(-3, 0)).as("s"))
      assert(!rows.queryExecution.executedPlan.toString
        .contains("graft_rank"), "non-key ROWS input must stand down")
      // a finite-offset RANGE frame is no longer a stand-down: the
      // value-band arm claims it (parity pinned in its own tests)
      val rng = df.select(
        sum(col("v")).over(Window.orderBy(col("v"))
          .rangeBetween(-3, 0)).as("r"))
      assert(rng.queryExecution.executedPlan.toString
        .contains("graft_rank_vb"), "RANGE frame plans value-band")
    }
  }

  test("ghost-block frames: moving min/max/avg/double-sum, exact per row") {
    // unique total order (v, id) → per-row parity; several blocks via a
    // raised shuffle-partition count; null-value runs exercise the
    // empty-frame → null branch (min/max skip nulls)
    val df = corpus(6000).select(col("id"),
      when(col("id") % 11 === 0, lit(null).cast("long"))
        .otherwise(col("v")).as("v"))
    val w = Window.orderBy(col("v"), col("id")).rowsBetween(-7, 0)
    val build = () => df.select(col("id"),
      min(col("v") * 3L - 1L).over(w).as("mn"),
      max(col("v") % 97L).over(w).as("mx"),
      avg(col("v")).over(w).as("av"),
      sum(col("v").cast("double") / 7.0d).over(w).as("ds"))
    def collectBits(r: org.apache.spark.sql.DataFrame) =
      r.collect().map { x =>
        (x.getLong(0), x.toSeq.drop(1).map {
          case d: Double => java.lang.Double.doubleToLongBits(d)
          case o => o
        })
      }.sortBy(_._1).toSeq
    val parts = "spark.sql.shuffle.partitions"
    val oldParts = spark.conf.get(parts)
    spark.conf.set(parts, "5")
    try {
      val expected = naive(collectBits(build()))
      forced {
        val r = build()
        val p = r.queryExecution.executedPlan.toString
        assert(p.contains("graft_rank_gblk"),
          s"ghost stage must plan:\n${p.take(3000)}")
        val windows = p.linesIterator.filter(_.contains("Window ")).toList
        assert(windows.forall(l => l.contains("graft_rank_pid") ||
          l.contains("graft_rank_gblk")),
          s"no corpus-grain unpartitioned window may remain:\n${p.take(4000)}")
        assert(collectBits(r) === expected)
      }
    } finally spark.conf.set(parts, oldParts)
  }

  test("ghost-block frames under heavy ties: exact as a (key, values) bag") {
    // order by the key alone (17 distinct values, ~350 copies each):
    // per-row assignment among ties is permutation-dependent in BOTH
    // plans, but inputs are key functions, so the (key → value multiset)
    // bag is invariant — the same doctrine as the moving-sum tie spec
    val df = corpus(6000).select(col("id"), (col("v") % 17L).as("k"))
    val w = Window.orderBy(col("k")).rowsBetween(-5, 0)
    val build = () => df.select(col("k"),
      min(col("k") * 13L % 7L).over(w).as("mn"),
      avg(col("k")).over(w).as("av"))
    def bag(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(x => (x.getLong(0), x.getLong(1),
        java.lang.Double.doubleToLongBits(x.getDouble(2))))
        .sorted.toSeq
    val expected = naive(bag(build()))
    forced {
      val r = build()
      assert(r.queryExecution.executedPlan.toString
        .contains("graft_rank_gblk"))
      assert(bag(r) === expected)
    }
  }

  test("ghost frames with FOLLOWING bounds: centered and forward-only") {
    // no prefix identity reaches forward — centered min/avg, a
    // forward-only integral sum, and a count between following bounds
    // all take the ghost path; unique (v, id) order → per-row parity
    val df = corpus(5000)
    val ord = Window.orderBy(col("v"), col("id"))
    val build = () => df.select(col("id"),
      min(col("v")).over(ord.rowsBetween(-3, 3)).as("cmin"),
      avg(col("v")).over(ord.rowsBetween(-3, 3)).as("cavg"),
      sum(col("v")).over(ord.rowsBetween(0, 5)).as("fsum"),
      count(lit(1)).over(ord.rowsBetween(2, 4)).as("fcnt"))
    def norm(r: org.apache.spark.sql.DataFrame) =
      r.collect().map { x =>
        (x.getLong(0), x.toSeq.drop(1).map {
          case d: Double => java.lang.Double.doubleToLongBits(d)
          case o => o
        })
      }.sortBy(_._1).toSeq
    val parts = "spark.sql.shuffle.partitions"
    val oldParts = spark.conf.get(parts)
    spark.conf.set(parts, "6")
    try {
      val expected = naive(norm(build()))
      forced {
        val r = build()
        val p = r.queryExecution.executedPlan.toString
        // the spill aliases inline into the Filter conditions, so the
        // marker is the 3-branch union feeding the blocked window
        assert(p.contains("graft_rank_gblk") && p.contains("Union"),
          s"two-directional ghost stage must plan:\n${p.take(3000)}")
        assert(norm(r) === expected)
      }
    } finally spark.conf.set(parts, oldParts)
  }

  test("first/nth/last_value over global order: absolute fetches, exact") {
    // unique (v, id) order → per-row parity across all gates: the
    // constant position-1 read, ROWS-gated nth (null until the frame
    // holds k rows), the partition-end last_value, and the
    // current-row short-circuit
    val df = corpus(5000)
    val t = df.sparkSession
    df.createOrReplaceTempView("graft_absv")
    val build = () => t.sql(
      """SELECT id,
        | first_value(v * 7 % 13) OVER (ORDER BY v, id) AS fv,
        | nth_value(v * 7 % 13, 3) OVER (ORDER BY v, id) AS nv,
        | last_value(v) OVER (ORDER BY v, id) AS lv,
        | last_value(v * 2) OVER (ORDER BY v, id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |   AS le,
        | nth_value(v, 4000) OVER (ORDER BY v, id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |   AS nf
        |FROM graft_absv""".stripMargin)
    def norm(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val expected = naive(norm(build()))
    forced {
      val r = build()
      val p = r.queryExecution.executedPlan.toString
      assert(p.contains("graft_rank_pid"),
        s"abs-fetch family must plan distributed:\n${p.take(3000)}")
      val windows = p.linesIterator.filter(_.contains("Window ")).toList
      assert(windows.forall(_.contains("graft_rank_pid")),
        s"no single-partition window may remain:\n${p.take(4000)}")
      assert(norm(r) === expected)
    }
  }

  test("IGNORE NULLS first/nth/last_value: fetches on the non-null rank") {
    // inputs are functions of the ORDER BY tuple, so tie runs are
    // value-constant — wholly null or wholly non-null — which pins the
    // k-th non-null position independent of tie permutation. Covers
    // all gates: default RANGE frame (range-grain non-null count),
    // explicit ROWS UP..CR (row-grain count), UP..UF (match-existence),
    // ends via min_by/max_by, interior k via count == k.
    val t = spark
    corpus(5000).select(col("id"), col("v"),
      when(col("v") % 5 === 0, lit(null).cast("long"))
        .otherwise(col("v") * 7 % 13).as("w"))
      .createOrReplaceTempView("graft_ignv")
    val build = () => t.sql(
      """SELECT id,
        | first_value(w, true) OVER (ORDER BY v, id) AS fdef,
        | first_value(w, true) OVER (ORDER BY v, id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS frow,
        | nth_value(w, 3, true) OVER (ORDER BY v, id) AS n3,
        | nth_value(w, 7, true) OVER (ORDER BY v, id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n7,
        | nth_value(w, 2, true) OVER (ORDER BY v, id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |   AS n2e,
        | last_value(w, true) OVER (ORDER BY v, id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |   AS lve
        |FROM graft_ignv""".stripMargin)
    def norm(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val expected = naive(norm(build()))
    forced {
      val r = build()
      val p = r.queryExecution.executedPlan.toString
      assert(p.contains("graft_rank_nv"),
        s"ignore-nulls fetch joins must plan:\n${p.take(3000)}")
      val windows = p.linesIterator.filter(_.contains("Window ")).toList
      assert(windows.forall(_.contains("graft_rank_pid")),
        s"no single-partition window may remain:\n${p.take(4000)}")
      assert(norm(r) === expected)
    }
  }

  test("IGNORE NULLS with tie runs, all-null input, bounded partitions") {
    val t = spark
    // duplicated order key: 100-row tie runs, null-or-not per RUN
    corpus(5000).select(col("id"), (col("v") % 50L).as("k"),
      when(col("v") % 50 < 3, lit(null).cast("long"))
        .otherwise((col("v") % 50L) * 7 % 13).as("w"))
      .createOrReplaceTempView("graft_ignt")
    val build = () => t.sql(
      """SELECT id,
        | first_value(w, true) OVER (ORDER BY k) AS f,
        | nth_value(w, 2, true) OVER (ORDER BY k) AS n2
        |FROM graft_ignt""".stripMargin)
    def norm(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val expected = naive(norm(build()))
    forced {
      val r = build()
      assert(r.queryExecution.executedPlan.toString
        .contains("graft_rank_nv"))
      assert(norm(r) === expected)
    }
    // all-null input: every gate yields the native null
    corpus(3000).select(col("id"), col("v"),
      lit(null).cast("long").as("w"))
      .createOrReplaceTempView("graft_ignz")
    val bz = () => t.sql(
      """SELECT id, first_value(w, true) OVER (ORDER BY v, id) AS f
        |FROM graft_ignz""".stripMargin)
    val ez = naive(norm(bz()))
    forced { assert(norm(bz()) === ez) }
    // bounded partitions: per-group non-null fetches
    val bp = () => t.sql(
      """SELECT id,
        | first_value(w, true) OVER (PARTITION BY pmod(id, 3)
        |   ORDER BY v, id) AS f,
        | nth_value(w, 4, true) OVER (PARTITION BY pmod(id, 3)
        |   ORDER BY v, id ROWS BETWEEN UNBOUNDED PRECEDING AND
        |   CURRENT ROW) AS n4
        |FROM graft_ignv""".stripMargin)
    val ep = naive(norm(bp()))
    forced {
      val r = bp()
      assert(r.queryExecution.executedPlan.toString
        .contains("graft_rank_nv"))
      assert(norm(r) === ep)
    }
    // last_value IGNORE NULLS over UP..CR is LOCF — since round 11 the
    // cumulative coalesce arm serves MULTI-KEY orders too (struct-key
    // slice totals, [[GlobalRankRewrite.locfMultiKeyOk]]), so the old
    // stand-down pin is inverted: ORDER BY v, id rewrites with parity
    val bl = () => t.sql(
      """SELECT id, last_value(w, true) OVER (ORDER BY v, id) AS l
        |FROM graft_ignv""".stripMargin)
    val el = naive(norm(bl()))
    forced {
      val locf = bl()
      assert(locf.queryExecution.executedPlan.toString
        .contains("graft_rank_pid"), "multi-key LOCF must fire")
      assert(norm(locf) === el)
    }
  }

  test("LOCF: last_value IGNORE NULLS rides the cumulative coalesce arm") {
    val t = spark
    // duplicated single key (50-wide tie runs), whole runs null-or-not,
    // plus a leading all-null stretch (k < 3 → null carries nothing)
    corpus(5000).select(col("id"), (col("v") % 50L).as("k"),
      when(col("v") % 50 < 3, lit(null).cast("long"))
        .otherwise((col("v") % 50L) * 7 % 13).as("w"))
      .createOrReplaceTempView("graft_locf")
    val build = () => t.sql(
      """SELECT id,
        | last_value(w, true) OVER (ORDER BY k) AS locf_rng,
        | last_value(w, true) OVER (ORDER BY k
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_row
        |FROM graft_locf""".stripMargin)
    def norm(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(x => (x.getLong(0), x.toSeq.drop(1)))
        .sortBy(_._1).toSeq
    val expected = naive(norm(build()))
    forced {
      val r = build()
      val p = r.queryExecution.executedPlan.toString
      assert(p.contains("graft_rank_pid"),
        s"LOCF must re-plan on the cum machinery:\n${p.take(3000)}")
      val windows = p.linesIterator.filter(_.contains("Window ")).toList
      assert(windows.forall(_.contains("graft_rank_pid")),
        s"no single-partition window may remain:\n${p.take(4000)}")
      assert(norm(r) === expected)
    }
    // all-null input: LOCF is null everywhere
    corpus(2000).select(col("id"), (col("v") % 20L).as("k"),
      lit(null).cast("long").as("w"))
      .createOrReplaceTempView("graft_locf_z")
    val bz = () => t.sql(
      """SELECT id, last_value(w, true) OVER (ORDER BY k) AS l
        |FROM graft_locf_z""".stripMargin)
    val ez = naive(norm(bz()))
    forced { assert(norm(bz()) === ez) }
    // non-key inputs stand down (tie runs / the null-key run would
    // not be value-constant)
    corpus(2000).select(col("id"), (col("v") % 20L).as("k"),
      col("v").as("payload"))
      .createOrReplaceTempView("graft_locf_sd")
    forced {
      assert(!t.sql(
        "SELECT last_value(payload, true) OVER (ORDER BY k) AS l " +
          "FROM graft_locf_sd").queryExecution.executedPlan.toString
        .contains("graft_rank_pid"), "non-key input must stand down")
    }
  }

  test("NOCB: DESC and NULLS LAST fill directions ride the same arm") {
    val t = spark
    // duplicated single key with a leading-null stretch IN EACH
    // DIRECTION'S sense: whole tie runs null-or-not (key-function
    // inputs), nulls present in the key itself to exercise the
    // null-run placement under all four direction/null-ordering combos
    corpus(5000).select(col("id"),
      when(col("v") % 50 === 49, lit(null).cast("long"))
        .otherwise(col("v") % 50L).as("k"))
      .withColumn("w",
        when(col("k") % 7 < 2 || col("k").isNull,
          lit(null).cast("long"))
          .otherwise(col("k") * 11 % 17))
      .createOrReplaceTempView("graft_nocb")
    def norm(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(x => (x.getLong(0), x.toSeq.drop(1)))
        .sortBy(_._1).toSeq
    for (ord <- Seq("k DESC", "k DESC NULLS FIRST", "k ASC NULLS LAST",
        "k ASC")) {
      val build = () => t.sql(
        s"""SELECT id,
           | last_value(w, true) OVER (ORDER BY $ord) AS fill_rng,
           | last_value(w, true) OVER (ORDER BY $ord
           |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |  AS fill_row
           |FROM graft_nocb""".stripMargin)
      val expected = naive(norm(build()))
      forced {
        val r = build()
        val p = r.queryExecution.executedPlan.toString
        assert(p.contains("graft_rank_pid"),
          s"$ord must re-plan on the cum machinery:\n${p.take(3000)}")
        assert(norm(r) === expected, ord)
      }
    }
  }

  test("multi-key LOCF: struct-key slice totals, direction combos") {
    val t = spark
    // nullable duplicated HEAD key (50-wide tie runs + a null run),
    // non-nullable id tiebreak; input a function of the head key alone
    // (null-or-not per run, so every (k, id) tie run is value-constant)
    corpus(5000).select(col("id"),
      when(col("v") % 50 === 49, lit(null).cast("long"))
        .otherwise(col("v") % 50L).as("k"))
      .withColumn("w",
        when(col("k") % 7 < 2 || col("k").isNull,
          lit(null).cast("long"))
          .otherwise(col("k") * 11 % 17))
      .createOrReplaceTempView("graft_mklocf")
    def norm(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(x => (x.getLong(0), x.toSeq.drop(1)))
        .sortBy(_._1).toSeq
    // same-direction combos fire; the HEAD null ordering is free (its
    // null run is slice-isolated), the trailing id is non-nullable so
    // its declared null ordering is immaterial
    for (ord <- Seq("k, id", "k DESC, id DESC", "k ASC NULLS LAST, id",
        "k DESC NULLS FIRST, id DESC")) {
      val build = () => t.sql(
        s"""SELECT id,
           | last_value(w, true) OVER (ORDER BY $ord) AS f_rng,
           | last_value(w, true) OVER (ORDER BY $ord
           |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f_row
           |FROM graft_mklocf""".stripMargin)
      val expected = naive(norm(build()))
      forced {
        val r = build()
        val p = r.queryExecution.executedPlan.toString
        assert(p.contains("graft_rank_pid"),
          s"$ord must re-plan on the cum machinery:\n${p.take(3000)}")
        val windows = p.linesIterator.filter(_.contains("Window ")).toList
        assert(windows.forall(_.contains("graft_rank_pid")),
          s"no single-partition window may remain ($ord):\n${p.take(4000)}")
        assert(norm(r) === expected, ord)
      }
    }
    // nullable TRAILING key: struct field comparison places a null
    // field smallest, which matches exactly the DEFAULT orderings
    // (ASC NULLS FIRST / DESC NULLS LAST) — those fire with parity;
    // the non-default spellings stand down. Inputs: the trailing key
    // itself (the self-proving tiebreak idiom) and a two-key function.
    corpus(4000).select(col("id"), col("v"), (col("v") % 20L).as("k"),
      when(col("v") % 5 === 0, lit(null).cast("long"))
        .otherwise(col("v") % 7L).as("k2"))
      .createOrReplaceTempView("graft_mklocf2")
    for (ord <- Seq("k, k2", "k DESC, k2 DESC")) {
      val build = () => t.sql(
        s"""SELECT id,
           | last_value(k2, true) OVER (ORDER BY $ord) AS self,
           | last_value(k * 100 + k2, true) OVER (ORDER BY $ord
           |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fn2
           |FROM graft_mklocf2""".stripMargin)
      val expected = naive(norm(build()))
      forced {
        val r = build()
        assert(r.queryExecution.executedPlan.toString
          .contains("graft_rank_pid"), s"$ord must fire")
        assert(norm(r) === expected, ord)
      }
    }
    forced {
      for (ord <- Seq("k, k2 ASC NULLS LAST", "k DESC, k2 DESC NULLS FIRST",
          "k ASC, k2 DESC")) {
        val p = t.sql(
          s"""SELECT last_value(k2, true) OVER (ORDER BY $ord) AS l
             |FROM graft_mklocf2""".stripMargin)
          .queryExecution.executedPlan.toString
        assert(!p.contains("graft_rank_pid"),
          s"$ord must stand down (non-default trailing nulls / mixed)")
      }
      // an input that is no function of the key tuple stands down
      val nk = t.sql(
        """SELECT last_value(v, true) OVER (ORDER BY pmod(v, 20),
          |  pmod(v, 7)) AS l
          |FROM graft_mklocf2""".stripMargin)
      assert(!nk.queryExecution.executedPlan.toString
        .contains("graft_rank_pid"), "non-key input must stand down")
    }
    // NULL-HEAD run decided by the trailing key: inside the head's
    // dedicated null slice the struct's first field ties and the
    // comparison falls through to k2 — the case the single-key arm's
    // First fallback could not serve (inputs there vary with k2)
    corpus(4000).select(col("id"),
      when(col("v") % 10 === 0, lit(null).cast("long"))
        .otherwise(col("v") % 10L).as("k"),
      (col("v") % 6L).as("k2"))
      .withColumn("w", when(col("k2") % 3 === 0, lit(null).cast("long"))
        .otherwise(col("k2") * 5 % 11))
      .createOrReplaceTempView("graft_mklocf3")
    for (ord <- Seq("k NULLS LAST, k2", "k, k2")) {
      val build = () => t.sql(
        s"""SELECT id, last_value(w, true) OVER (ORDER BY $ord) AS l
           |FROM graft_mklocf3""".stripMargin)
      val expected = naive(norm(build()))
      forced {
        val r = build()
        assert(r.queryExecution.executedPlan.toString
          .contains("graft_rank_pid"), s"$ord must fire")
        assert(norm(r) === expected, ord)
      }
    }
    // STRUCT-typed trailing key (the q252 cinfo shape): the input IS
    // the appended struct key; nested-struct ordering rides the same
    // comparison
    corpus(3000).select(col("id"), (col("v") % 30L).as("k"),
      when(col("v") % 3 === 0,
        struct((col("v") % 13L).as("a"), col("id").as("b"))).as("c"))
      .createOrReplaceTempView("graft_mklocf4")
    for (ord <- Seq("k, c", "k DESC, c DESC")) {
      val build = () => t.sql(
        s"""SELECT id, last_value(c, true) OVER (ORDER BY $ord
           |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS l
           |FROM graft_mklocf4""".stripMargin)
      val expected = naive(norm(build()))
      forced {
        val r = build()
        assert(r.queryExecution.executedPlan.toString
          .contains("graft_rank_pid"), s"$ord must fire")
        assert(norm(r) === expected, ord)
      }
    }
  }

  test("multi-key LOCF: mixed directions ride negated struct keys") {
    val t = spark
    // nullable duplicated head key, flipped tiebreaks of several types
    corpus(5000).select(col("id"), col("v"),
      when(col("v") % 40 === 39, lit(null).cast("long"))
        .otherwise(col("v") % 40L).as("k"))
      .withColumn("w",
        when(col("k") % 5 < 1 || col("k").isNull, lit(null).cast("long"))
          .otherwise(col("k") * 13 % 23))
      .withColumn("kd", date_add(lit("2020-01-01").cast("date"),
        (col("v") % 50L).cast("int")))
      .withColumn("f", (col("v") % 9L).cast("double"))
      .createOrReplaceTempView("graft_mxlocf")
    def norm(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(x => (x.getLong(0), x.toSeq.drop(1)))
        .sortBy(_._1).toSeq
    // flipped non-nullable tiebreaks (long both ways, date under an
    // ASC head) fire with parity — the negated-struct normalization
    // kd is NULLABLE (a string→date cast literal), so its flipped
    // spelling needs the explicit wantNulls ordering to be admitted
    for (ord <- Seq("k, id DESC", "k DESC, id", "k NULLS LAST, id DESC",
        "k, kd DESC NULLS FIRST, id DESC")) {
      val build = () => t.sql(
        s"""SELECT id,
           | last_value(w, true) OVER (ORDER BY $ord) AS f_rng,
           | last_value(w, true) OVER (ORDER BY $ord
           |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f_row
           |FROM graft_mxlocf""".stripMargin)
      val expected = naive(norm(build()))
      forced {
        val r = build()
        assert(r.queryExecution.executedPlan.toString
          .contains("graft_rank_pid"), s"$ord must fire")
        assert(norm(r) === expected, ord)
      }
    }
    // flipped FLOAT stands down (NaN negates to itself — no negation
    // reproduces a descending float order)
    forced {
      val p = t.sql(
        """SELECT last_value(w, true) OVER (ORDER BY k, f DESC, id) AS l
          |FROM graft_mxlocf""".stripMargin)
        .queryExecution.executedPlan.toString
      assert(!p.contains("graft_rank_pid"), "flipped float must stand down")
    }
    // NULLABLE flipped trailing key: only the wantNulls spelling fires
    // (head ASC → NULLS FIRST even though the key itself is DESC;
    // head DESC → NULLS LAST even for an ASC key)
    corpus(4000).select(col("id"), (col("v") % 20L).as("k"),
      when(col("v") % 5 === 0, lit(null).cast("long"))
        .otherwise(col("v") % 7L).as("k2"))
      .createOrReplaceTempView("graft_mxlocf2")
    for (ord <- Seq("k, k2 DESC NULLS FIRST", "k DESC, k2 ASC NULLS LAST")) {
      val build = () => t.sql(
        s"""SELECT id, last_value(k2, true) OVER (ORDER BY $ord) AS l
           |FROM graft_mxlocf2""".stripMargin)
      val expected = naive(norm(build()))
      forced {
        val r = build()
        assert(r.queryExecution.executedPlan.toString
          .contains("graft_rank_pid"), s"$ord must fire")
        assert(norm(r) === expected, ord)
      }
    }
    forced {
      for (ord <- Seq("k, k2 DESC", "k DESC, k2 ASC")) {
        val p = t.sql(
          s"""SELECT last_value(k2, true) OVER (ORDER BY $ord) AS l
             |FROM graft_mxlocf2""".stripMargin)
          .queryExecution.executedPlan.toString
        assert(!p.contains("graft_rank_pid"),
          s"$ord (default nulls on a nullable flipped key) must stand down")
      }
    }
  }

  test("catalog ndv stats admit attribute partitions under CBO") {
    val t = spark
    // an ATTRIBUTE partition key (seg) the structural prover cannot
    // bound — 40 distinct values only the catalog can know about
    corpus(5000).select(col("id"), col("v"), (col("v") % 40L).as("seg"))
      .write.mode("overwrite").saveAsTable("graft_stats_seg")
    def withCbo[T](on: Boolean)(body: => T): T = {
      val key = "spark.sql.cbo.enabled"
      val old = t.conf.get(key)
      t.conf.set(key, on.toString)
      try body finally t.conf.set(key, old)
    }
    try {
      val build = () => t.sql(
        """SELECT id,
          | row_number() OVER (PARTITION BY seg ORDER BY v, id) AS rn
          |FROM graft_stats_seg""".stripMargin)
      def norm(r: org.apache.spark.sql.DataFrame) =
        r.collect().map(x => (x.getLong(0),
          x.get(1).asInstanceOf[Number].longValue))
          .sortBy(_._1).toSeq
      // no stats yet: attribute partitions stand down even when forced
      forced(withCbo(true) {
        assert(!build().queryExecution.executedPlan.toString
          .contains("graft_rank_pid"), "no stats → stand down")
      })
      t.sql("ANALYZE TABLE graft_stats_seg COMPUTE STATISTICS " +
        "FOR COLUMNS seg, id")
      // stats present but CBO off: stats invisible, still naive
      forced(withCbo(false) {
        assert(!build().queryExecution.executedPlan.toString
          .contains("graft_rank_pid"), "CBO off → stand down")
      })
      // stats + CBO: the 40-value domain admits, output identical
      val expected = naive(norm(build()))
      forced(withCbo(true) {
        val r = build()
        assert(r.queryExecution.executedPlan.toString
          .contains("graft_rank_pid"),
          s"ndv stats must admit:\n${r.queryExecution.executedPlan
            .toString.take(3000)}")
        assert(norm(r) === expected)
      })
      // a high-ndv column's stats refuse: PARTITION BY id stays naive
      forced(withCbo(true) {
        val p = t.sql(
          """SELECT id, row_number() OVER (PARTITION BY id ORDER BY v)
            | AS rn FROM graft_stats_seg""".stripMargin)
          .queryExecution.executedPlan.toString
        assert(!p.contains("graft_rank_pid"), "ndv > maxGroups → naive")
      })
    } finally t.sql("DROP TABLE IF EXISTS graft_stats_seg")
  }

  test("full-frame aggs over bounded partitions: hash-agg join-back") {
    // sum(w) OVER (PARTITION BY pmod/CASE) with no ORDER BY — naive is
    // one task per partition value; the rewrite is a partial-combining
    // aggregate + broadcast join-back with no window at all
    val df = corpus(5000).select(col("id"), col("v"),
      when(col("id") % 11 === 0, lit(null).cast("long"))
        .otherwise(col("v")).as("w"))
    val wp = Window.partitionBy(pmod(col("id"), lit(7)))
    val build = () => df.select(col("id"),
      sum(col("w")).over(wp).as("tw"),
      count(col("w")).over(wp).as("cw"),
      min(col("v")).over(wp).as("mn"),
      max(col("v")).over(wp).as("mx"),
      avg(col("w")).over(wp).as("aw"),
      expr("bool_or(w % 2 = 0)").over(wp).as("bo"),
      expr("every(v >= 0)").over(wp).as("ev"),
      approx_count_distinct(col("v")).over(wp).as("ndv"))
    def norm(r: org.apache.spark.sql.DataFrame) =
      r.collect().map { x =>
        (x.getLong(0), x.toSeq.drop(1).map {
          case d: Double => java.lang.Double.doubleToLongBits(d)
          case o => o
        })
      }.sortBy(_._1).toSeq
    val expected = naive(norm(build()))
    forced {
      val r = build()
      val p = r.queryExecution.executedPlan.toString
      assert(!p.contains("Window "),
        s"full-frame rewrite needs no window:\n${p.take(3000)}")
      assert(p.contains("graft_rank_fg"), s"join-back shape:\n${p.take(3000)}")
      assert(norm(r) === expected)
    }
    // attribute partitions (no domain proof) and double sums (order-
    // arbitrary fold even in the naive plan) stand down
    forced {
      val attr = df.select(sum(col("w"))
        .over(Window.partitionBy(col("v"))).as("s"))
      assert(!attr.queryExecution.executedPlan.toString
        .contains("graft_rank_fg"))
      val dbl = df.select(sum(col("w").cast("double"))
        .over(wp).as("s"))
      assert(!dbl.queryExecution.executedPlan.toString
        .contains("graft_rank_fg"))
    }
  }

  test("mixed window node: percentile + exact ride-alongs converts") {
    // median NEXT TO count/min/max over one order-less bounded
    // partition — one analyzer window node, previously naive under the
    // homogeneity gate; the full-frame arm now converts mixed nodes
    // whose other members pass the ride-along whitelist, and
    // PercentileRewrite re-plans the converted Aggregate with a side
    // aggregate in the same batch
    val df = corpus(5000).select(col("id"), col("v"),
      when(col("id") % 11 === 0, lit(null).cast("long"))
        .otherwise(col("v")).as("w"))
    val wp = Window.partitionBy(pmod(col("id"), lit(5)))
    val build = () => df.select(col("id"),
      expr("percentile(w, 0.5d)").over(wp).as("med"),
      count(col("w")).over(wp).as("n"),
      min(col("w")).over(wp).as("lo"),
      max(col("w")).over(wp).as("hi"))
    def norm(r: org.apache.spark.sql.DataFrame) =
      r.collect().map { x =>
        (x.getLong(0), x.toSeq.drop(1).map {
          case d: Double => java.lang.Double.doubleToLongBits(d)
          case o => o
        })
      }.sortBy(_._1).toSeq
    val expected = naive(norm(build()))
    forced {
      val r = build()
      val p = r.queryExecution.executedPlan.toString
      assert(p.contains("graft_rank_fa") && p.contains("graft_pct_rn"),
        s"mixed node must convert and compose:\n${p.take(3000)}")
      assert(!p.toLowerCase.contains("percentile("),
        s"no hash-map aggregate may survive:\n${p.take(3000)}")
      assert(norm(r) === expected)
    }
    // a DOUBLE sum next to the percentile keeps the node naive (the
    // ride-along whitelist rejects fold-order-sensitive sums)
    forced {
      val dbl = df.select(
        expr("percentile(w, 0.5d)").over(wp).as("med"),
        sum(col("v").cast("double")).over(wp).as("s"))
      assert(!dbl.queryExecution.executedPlan.toString
        .contains("graft_rank_fa"))
    }
    // mode NEXT TO percentile in one window node: converts, then the
    // two inner rules compose via mutual slot deferral
    val bmp = () => df.select(col("id"),
      expr("percentile(w, 0.5d)").over(wp).as("med"),
      expr("mode() WITHIN GROUP (ORDER BY w)").over(wp).as("m"))
    val emp = naive(norm(bmp()))
    forced {
      val r = bmp()
      val p = r.queryExecution.executedPlan.toString
      assert(p.contains("graft_rank_fa") && p.contains("graft_pct_rn")
        && p.contains("graft_mode_v"),
        s"mode + percentile window must fully compose:\n${p.take(3000)}")
      assert(norm(r) === emp)
    }
  }

  test("window-spelled percentile ladder converts and composes") {
    // median/p90 OVER (PARTITION BY pmod) — naive is one WindowExec
    // task per group each holding the group's value hash-map; the
    // full-frame conversion emits the Aggregate PercentileRewrite
    // re-plans in the same batch (graft_pct markers), join-back stamps
    // every row, bit-equal
    val df = corpus(5000).select(col("id"), col("v"),
      when(col("id") % 11 === 0, lit(null).cast("long"))
        .otherwise(col("v")).as("w"))
    val wp = Window.partitionBy(pmod(col("id"), lit(5)))
    val build = () => df.select(col("id"),
      expr("percentile(w, 0.5d)").over(wp).as("med"),
      expr("percentile(w, 0.9d)").over(wp).as("p90"))
    def norm(r: org.apache.spark.sql.DataFrame) =
      r.collect().map { x =>
        (x.getLong(0), x.toSeq.drop(1).map {
          case d: Double => java.lang.Double.doubleToLongBits(d)
          case o => o
        })
      }.sortBy(_._1).toSeq
    val expected = naive(norm(build()))
    forced {
      val r = build()
      val p = r.queryExecution.executedPlan.toString
      // conversion + composition: the full-frame join-back wraps the
      // percentile pipeline (surviving WindowExecs are the rank
      // machinery's partitioned slices, never per-group value maps)
      assert(p.contains("graft_rank_fa") && p.contains("graft_pct_rn"),
        s"window percentile must convert and compose:\n${p.take(3000)}")
      assert(!p.toLowerCase.contains("percentile("),
        s"no hash-map aggregate may survive:\n${p.take(3000)}")
      assert(norm(r) === expected)
    }
    // OVER () global median stamp
    val g = Window.partitionBy()
    val expected2 = naive(norm(df.select(col("id"),
      expr("percentile(w, 0.5d)").over(g).as("med"),
      expr("percentile(w, 0.5d)").over(g).as("m2"))))
    forced {
      val r = df.select(col("id"),
        expr("percentile(w, 0.5d)").over(g).as("med"),
        expr("percentile(w, 0.5d)").over(g).as("m2"))
      assert(r.queryExecution.executedPlan.toString
        .contains("graft_pct_rn"))
      assert(norm(r) === expected2)
    }
    // MIXED kinds: an INTEGRAL sum next to the percentile now converts
    // (round 8 — the ride-along whitelist admits it and
    // PercentileRewrite joins it back bit-equal); the double-sum
    // stand-down lives in the dedicated mixed-node test
    val expectedMx = naive(norm(df.select(col("id"),
      expr("percentile(w, 0.5d)").over(wp).as("med"),
      sum(col("w")).over(wp).as("s"))))
    forced {
      val mixed = df.select(col("id"),
        expr("percentile(w, 0.5d)").over(wp).as("med"),
        sum(col("w")).over(wp).as("s"))
      assert(mixed.queryExecution.executedPlan.toString
        .contains("graft_rank_fa"))
      assert(norm(mixed) === expectedMx)
    }
    // WEIGHTED window percentiles convert too (the weighted-grouped
    // pipeline takes the emitted Aggregate)
    val dfw = df.select(col("id"), col("w"), (col("id") % 5L).as("f"))
    val expected3 = naive(norm(dfw.select(col("id"),
      expr("percentile(w, 0.5d, f)").over(wp).as("wmed"))))
    forced {
      val r = dfw.select(col("id"),
        expr("percentile(w, 0.5d, f)").over(wp).as("wmed"))
      val p = r.queryExecution.executedPlan.toString
      assert(p.contains("graft_pct_cw"),
        s"weighted window percentile must compose:\n${p.take(3000)}")
      assert(norm(r) === expected3)
    }
  }

  test("window-spelled deterministic mode converts and composes") {
    val df = corpus(5000).select(col("id"),
      (col("v") % 37L).as("lbl"))
    df.createOrReplaceTempView("graft_ff_mode")
    val build = () => spark.sql(
      """SELECT id, mode() WITHIN GROUP (ORDER BY lbl)
        |  OVER (PARTITION BY pmod(id, 7)) AS top_lbl
        |FROM graft_ff_mode""".stripMargin)
    def norm(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1).toSeq
    val key = "spark.sql.optimizer.excludedRules"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "graft.plans.GlobalRankRewrite,graft.plans.ModeRewrite")
    val expected = try norm(build())
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    forced {
      val r = build()
      val p = r.queryExecution.executedPlan.toString
      assert(!p.contains("Window ") && p.contains("graft_mode_v"),
        s"mode window must convert and compose:\n${p.take(3000)}")
      assert(norm(r) === expected)
    }
  }

  test("fully global full-frame aggs (OVER ()) plan as 1-row cross join") {
    val df = corpus(5000).select(col("id"), col("v"),
      when(col("id") % 13 === 0, lit(null).cast("long"))
        .otherwise(col("v")).as("w"))
    val g = Window.partitionBy()
    val build = () => df.select(col("id"),
      sum(col("w")).over(g).as("tw"),
      count(col("w")).over(g).as("cw"),
      min(col("v")).over(g).as("mn"),
      max(col("v")).over(g).as("mx"),
      avg(col("w")).over(g).as("aw"))
    def norm(r: org.apache.spark.sql.DataFrame) =
      r.collect().map { x =>
        (x.getLong(0), x.toSeq.drop(1).map {
          case d: Double => java.lang.Double.doubleToLongBits(d)
          case o => o
        })
      }.sortBy(_._1).toSeq
    val expected = naive(norm(build()))
    forced {
      val r = build()
      val p = r.queryExecution.executedPlan.toString
      assert(!p.contains("Window "),
        s"global full-frame needs no window:\n${p.take(3000)}")
      assert(p.contains("graft_rank_fa"), s"agg-side shape:\n${p.take(3000)}")
      assert(norm(r) === expected)
    }
    // empty corpus: zero rows either way (the naive window emits none)
    forced {
      val empty = build().where(col("id") < 0)
      assert(empty.count() === 0L)
      val r = df.where(col("id") < -1)
        .select(sum(col("w")).over(g).as("tw"))
      assert(r.count() === 0L)
    }
  }

  test("value-band RANGE frames: bucketed rewrite matches naive") {
    // trailing and centered value bands over a global ascending integral
    // key, with null input values, duplicate keys, and empty frames
    val df = corpus(5000).select(col("id"),
      (col("v") % 701L).as("k"), // duplicate keys
      when(col("id") % 11 === 0, lit(null).cast("long"))
        .otherwise(col("v")).as("w"))
    val trail = Window.orderBy(col("k")).rangeBetween(-50L, 0L)
    val cent = Window.orderBy(col("k")).rangeBetween(-25L, 25L)
    val fwd = Window.orderBy(col("k")).rangeBetween(5L, 30L)
    val build = () => df.select(col("id"), col("k"),
      sum(col("w")).over(trail).as("ts"),
      count(col("w")).over(trail).as("tc"),
      min(col("w")).over(cent).as("cmn"),
      max(col("w")).over(cent).as("cmx"),
      avg(col("w")).over(fwd).as("fa"))
    def norm(r: org.apache.spark.sql.DataFrame) =
      r.collect().map { x =>
        (x.getLong(0), x.toSeq.drop(1).map {
          case d: Double => java.lang.Double.doubleToLongBits(d)
          case o => o
        })
      }.sortBy(_._1).toSeq
    val expected = naive(norm(build()))
    forced {
      val r = build()
      val p = r.queryExecution.executedPlan.toString
      assert(p.contains("graft_rank_vb"), s"value-band shape:\n${p.take(3000)}")
      assert(norm(r) === expected)
    }
  }

  test("value-band RANGE frames: null keys keep the naive group") {
    val df = corpus(3000).select(col("id"),
      when(col("id") % 7 === 0, lit(null).cast("long"))
        .otherwise(col("v") % 211L).as("k"),
      col("v").as("w"))
    val band = Window.orderBy(col("k")).rangeBetween(-20L, 0L)
    val build = () => df.select(col("id"),
      sum(col("w")).over(band).as("s"),
      count(lit(1)).over(band).as("c"))
    def norm(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(x => (x.getLong(0), x.toSeq.drop(1)))
        .sortBy(_._1).toSeq
    val expected = naive(norm(build()))
    forced {
      val r = build()
      assert(r.queryExecution.executedPlan.toString
        .contains("graft_rank_vb"))
      assert(norm(r) === expected)
    }
  }

  test("value-band RANGE frames compose with bounded partitions") {
    val df = corpus(4000).select(col("id"), (col("v") % 397L).as("k"),
      col("v").as("w"))
    val band = Window.partitionBy(pmod(col("id"), lit(5)))
      .orderBy(col("k")).rangeBetween(-40L, 10L)
    val build = () => df.select(col("id"),
      sum(col("w")).over(band).as("s"),
      max(col("w")).over(band).as("m"))
    def norm(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(x => (x.getLong(0), x.toSeq.drop(1)))
        .sortBy(_._1).toSeq
    val expected = naive(norm(build()))
    forced {
      val r = build()
      assert(r.queryExecution.executedPlan.toString
        .contains("graft_rank_vb"))
      assert(norm(r) === expected)
    }
  }

  test("value-band DESC keys: negated-key buckets match naive") {
    // descending RANGE bounds compute as key − offset, so the mirror
    // m = −k reduces DESC to the ascending bucket math; nulls (sorted
    // LAST under DESC) still collapse to the null bucket
    val df = corpus(4000).select(col("id"),
      when(col("id") % 13 === 0, lit(null).cast("long"))
        .otherwise(col("v") % 509L).as("k"),
      col("v").as("w"))
    val band = Window.orderBy(col("k").desc).rangeBetween(-30L, 0L)
    val cent = Window.orderBy(col("k").desc).rangeBetween(-15L, 20L)
    val build = () => df.select(col("id"),
      sum(col("w")).over(band).as("s"),
      count(col("w")).over(band).as("c"),
      min(col("w")).over(cent).as("mn"),
      max(col("w")).over(cent).as("mx"))
    def norm(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(x => (x.getLong(0), x.toSeq.drop(1)))
        .sortBy(_._1).toSeq
    val expected = naive(norm(build()))
    forced {
      val r = build()
      assert(r.queryExecution.executedPlan.toString
        .contains("graft_rank_vb"))
      assert(norm(r) === expected)
    }
  }

  test("value-band DATE keys bucket in epoch-day space") {
    // duplicate dates (many rows per day), nulls, trailing-week band;
    // the SQL spelling drives the parser's int-day boundary form
    val df = corpus(3000).select(col("id"),
      when(col("id") % 17 === 0, lit(null).cast("date"))
        .otherwise(expr("date_add(date'2024-01-01', " +
          "cast(v % 365 as int))")).as("d"),
      (col("v") % 997L).as("w"))
    df.createOrReplaceTempView("graft_vb_dates")
    val build = () => spark.sql(
      """SELECT id,
        | sum(w) OVER wk AS ws, count(w) OVER wk AS wc,
        | min(w) OVER wk AS wmn, max(w) OVER wk AS wmx
        |FROM graft_vb_dates
        |WINDOW wk AS (ORDER BY d
        |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin)
    def norm(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(x => (x.getLong(0), x.toSeq.drop(1)))
        .sortBy(_._1).toSeq
    val expected = naive(norm(build()))
    forced {
      val r = build()
      assert(r.queryExecution.executedPlan.toString
        .contains("graft_rank_vb"))
      assert(norm(r) === expected)
    }
  }

  test("half-open value frames: prefix and suffix decomposition") {
    // UP..x FOLLOWING and x PRECEDING..UF over an integral key with
    // null keys (the double-count hazard), null inputs, duplicate keys
    val df = corpus(4000).select(col("id"),
      when(col("id") % 13 === 0, lit(null).cast("long"))
        .otherwise(col("v") % 409L).as("k"),
      when(col("id") % 7 === 0, lit(null).cast("long"))
        .otherwise(col("v")).as("w"))
    val pre = Window.orderBy(col("k"))
      .rangeBetween(Window.unboundedPreceding, 25L)
    val suf = Window.orderBy(col("k"))
      .rangeBetween(-40L, Window.unboundedFollowing)
    val build = () => df.select(col("id"),
      sum(col("w")).over(pre).as("ps"),
      count(col("w")).over(pre).as("pc"),
      min(col("w")).over(pre).as("pmn"),
      avg(col("w")).over(pre).as("pav"),
      sum(col("w")).over(suf).as("ss"),
      max(col("w")).over(suf).as("smx"),
      avg(col("w")).over(suf).as("sav"))
    def norm(r: org.apache.spark.sql.DataFrame) =
      r.collect().map { x =>
        (x.getLong(0), x.toSeq.drop(1).map {
          case d: Double => java.lang.Double.doubleToLongBits(d)
          case o => o
        })
      }.sortBy(_._1).toSeq
    val expected = naive(norm(build()))
    forced {
      val r = build()
      val p = r.queryExecution.executedPlan.toString
      assert(p.contains("graft_rank_ho"), s"half-open shape:\n${p.take(3000)}")
      // cumulative pieces re-plan through the rank machinery (pid
      // slices), band pieces through the value-band arm (vb buckets) —
      // all surviving WindowExecs are partitioned, none global
      assert(p.contains("graft_rank_pid"), s"cum pieces:\n${p.take(3000)}")
      assert(p.contains("graft_rank_vb"), s"band pieces:\n${p.take(3000)}")
      assert(norm(r) === expected)
    }
  }

  test("half-open value frames compose with bounded partitions") {
    val df = corpus(3000).select(col("id"), (col("v") % 211L).as("k"),
      col("v").as("w"))
    val pre = Window.partitionBy(pmod(col("id"), lit(3)))
      .orderBy(col("k")).rangeBetween(Window.unboundedPreceding, 10L)
    val build = () => df.select(col("id"),
      sum(col("w")).over(pre).as("s"), count(col("w")).over(pre).as("c"))
    def norm(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(x => (x.getLong(0), x.toSeq.drop(1)))
        .sortBy(_._1).toSeq
    val expected = naive(norm(build()))
    forced {
      val r = build()
      assert(r.queryExecution.executedPlan.toString
        .contains("graft_rank_ho"))
      assert(norm(r) === expected)
    }
  }

  test("value-band TIMESTAMP keys: ANSI interval bounds in micros") {
    // trailing 30-second band + half-open lookback over a timestamp
    // key; interval literals carry micros, UnixMicros maps the key to
    // the same unit
    val df = corpus(3000).select(col("id"),
      when(col("id") % 19 === 0, lit(null).cast("timestamp"))
        .otherwise(expr("timestamp_micros(v * 1000000)")).as("ts"),
      (col("v") % 997L).as("w"))
    df.createOrReplaceTempView("graft_vb_ts")
    val build = () => spark.sql(
      """SELECT id,
        | sum(w) OVER tb AS bs, count(w) OVER tb AS bc,
        | count(*) OVER hb AS hc, max(w) OVER hb AS hm
        |FROM graft_vb_ts
        |WINDOW tb AS (ORDER BY ts RANGE BETWEEN INTERVAL '30' SECOND
        |   PRECEDING AND CURRENT ROW),
        | hb AS (ORDER BY ts RANGE BETWEEN UNBOUNDED PRECEDING
        |   AND INTERVAL '10' SECOND FOLLOWING)""".stripMargin)
    def norm(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(x => (x.getLong(0), x.toSeq.drop(1)))
        .sortBy(_._1).toSeq
    val expected = naive(norm(build()))
    forced {
      val r = build()
      val p = r.queryExecution.executedPlan.toString
      assert(p.contains("graft_rank_vb") && p.contains("graft_rank_ho"),
        s"timestamp band shapes:\n${p.take(3000)}")
      assert(norm(r) === expected)
    }
  }

  test("mixed window kinds split into per-kind nodes and all re-plan") {
    // cumulative (case-1), finite band, and half-open frames sharing
    // one (partition, order) — the analyzer puts them in ONE node; the
    // splitter stacks homogeneous nodes the arms then rewrite
    val df = corpus(4000).select(col("id"), (col("v") % 389L).as("k"),
      col("v").as("w"))
    val ord = Window.orderBy(col("k"))
    val build = () => df.select(col("id"),
      sum(col("w")).over(ord.rangeBetween(
        Window.unboundedPreceding, Window.currentRow)).as("cum"),
      count(col("w")).over(ord.rangeBetween(-25L, 0L)).as("band"),
      min(col("w")).over(ord.rangeBetween(
        -10L, Window.unboundedFollowing)).as("hov"))
    def norm(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(x => (x.getLong(0), x.toSeq.drop(1)))
        .sortBy(_._1).toSeq
    val expected = naive(norm(build()))
    forced {
      val r = build()
      val p = r.queryExecution.executedPlan.toString
      assert(p.contains("graft_rank_pid") && p.contains("graft_rank_vb")
        && p.contains("graft_rank_ho"),
        s"all three kinds must re-plan:\n${p.take(3000)}")
      assert(norm(r) === expected)
    }
  }

  test("SQL-spelled bounded-partition half-open frames compose fully") {
    // the parser extracts PARTITION BY pmod(...) into a `_w#` Project
    // below the window — the stacked piece windows must still re-prove
    // the domain (expandOnce pierces Window nodes down to it)
    val df = corpus(3000).select(col("id"), (col("v") % 151L).as("k"),
      col("v").as("w"))
    df.createOrReplaceTempView("graft_hov_sql")
    val build = () => spark.sql(
      """SELECT id,
        | sum(w) OVER (PARTITION BY pmod(id, 3) ORDER BY k
        |   RANGE BETWEEN UNBOUNDED PRECEDING AND 10 FOLLOWING) AS s,
        | count(w) OVER (PARTITION BY pmod(id, 3) ORDER BY k
        |   RANGE BETWEEN UNBOUNDED PRECEDING AND 10 FOLLOWING) AS c
        |FROM graft_hov_sql""".stripMargin)
    def norm(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(x => (x.getLong(0), x.toSeq.drop(1)))
        .sortBy(_._1).toSeq
    val expected = naive(norm(build()))
    forced {
      val r = build()
      val p = r.queryExecution.executedPlan.toString
      assert(p.contains("graft_rank_ho") && p.contains("graft_rank_vb"),
        s"stacked pieces must re-plan under the _w# Project:\n${
          p.take(3000)}")
      assert(norm(r) === expected)
    }
  }

  test("half-open stand-downs: DESC keys") {
    // a DESC half-open frame does NOT mirror cleanly: null ORDERING
    // does not negate with the key, so the null-row guard pieces would
    // diverge — the arm is ASC-only by design
    val df = corpus(2000).select(col("id"), (col("v") % 101L).as("k"),
      col("v").as("w"))
    forced {
      val desc = df.select(sum(col("w")).over(
        Window.orderBy(col("k").desc).rangeBetween(
          Window.unboundedPreceding, 10L)).as("s"))
      assert(!desc.queryExecution.executedPlan.toString
        .contains("graft_rank_ho"))
    }
  }

  test("half-open stand-downs: ASC NULLS LAST keys") {
    // rewriteHalfOpen rebuilds its cumulative pieces with default
    // null-ordering SortOrders and a null-key combine calibrated for
    // the ASC NULLS FIRST layout; NULLS LAST does not relocate with
    // the decomposition (same class as the DESC stand-down), so the
    // arm requires NullsFirst and NULLS LAST stays naive — with
    // values identical to the naive plan (it IS the naive plan)
    val df = corpus(2000).select(col("id"),
      when(col("id") % 11 === 0, lit(null).cast("long"))
        .otherwise(col("v") % 101L).as("k"),
      col("v").as("w"))
    val nl = Window.orderBy(col("k").asc_nulls_last)
      .rangeBetween(Window.unboundedPreceding, 5L)
    val build = () => df.select(col("id"),
      sum(col("w")).over(nl).as("s"), count(col("w")).over(nl).as("c"))
    def norm(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(x => (x.getLong(0), x.toSeq.drop(1)))
        .sortBy(_._1).toSeq
    val expected = naive(norm(build()))
    forced {
      val r = build()
      assert(!r.queryExecution.executedPlan.toString
        .contains("graft_rank_ho"))
      assert(norm(r) === expected)
    }
  }

  test("mixed-node splitter stands down for NULLS LAST half-open") {
    // a mixed node whose hov member is NULLS LAST must not split that
    // member into a group no arm will ever re-match — the splitter's
    // hov classification mirrors the dedicated arm's guard
    val df = corpus(2000).select(col("id"),
      when(col("id") % 11 === 0, lit(null).cast("long"))
        .otherwise(col("v") % 101L).as("k"),
      col("v").as("w"))
    val ord = Window.orderBy(col("k").asc_nulls_last)
    val build = () => df.select(col("id"),
      sum(col("w")).over(ord.rangeBetween(
        Window.unboundedPreceding, Window.currentRow)).as("cum"),
      min(col("w")).over(ord.rangeBetween(
        -10L, Window.unboundedFollowing)).as("hov"))
    def norm(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(x => (x.getLong(0), x.toSeq.drop(1)))
        .sortBy(_._1).toSeq
    val expected = naive(norm(build()))
    forced {
      val r = build()
      assert(!r.queryExecution.executedPlan.toString
        .contains("graft_rank_ho"))
      assert(norm(r) === expected)
    }
  }

  test("value-band stand-downs: double sum, attribute partition") {
    val df = corpus(2000).select(col("id"), (col("v") % 101L).as("k"),
      col("v").as("w"))
    forced {
      val dbl = df.select(sum(col("w").cast("double")).over(
        Window.orderBy(col("k")).rangeBetween(-10L, 0L)).as("s"))
      assert(!dbl.queryExecution.executedPlan.toString
        .contains("graft_rank_vb"))
      val attr = df.select(sum(col("w")).over(
        Window.partitionBy(col("w")).orderBy(col("k"))
          .rangeBetween(-10L, 0L)).as("s"))
      assert(!attr.queryExecution.executedPlan.toString
        .contains("graft_rank_vb"))
    }
  }

  test("ghost frames compose with row_number and lag in one window spec") {
    val df = corpus(5000)
    val ord = Window.orderBy(col("v"), col("id"))
    val build = () => df.select(col("id"),
      row_number().over(ord).as("rn"),
      min(col("v")).over(ord.rowsBetween(-4, 0)).as("mn"),
      lag(col("v"), 2).over(ord).as("lg"),
      sum(col("v")).over(ord.rowsBetween(-4, 0)).as("ms"))
    def norm(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val expected = naive(norm(build()))
    forced {
      val r = build()
      val p = r.queryExecution.executedPlan.toString
      assert(p.contains("graft_rank_gblk") && p.contains("graft_rank_jrn"),
        s"ghost + fetch machinery must coexist:\n${p.take(3000)}")
      assert(norm(r) === expected)
    }
  }
}
