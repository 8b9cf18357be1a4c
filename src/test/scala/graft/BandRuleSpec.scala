package graft

import org.apache.spark.sql.functions._

/** The BandJoinBlocking optimizer rule: a naive band theta join
  * (`lo ≤ X − Y ≤ hi` in any comparison spelling) must plan as a
  * bucketed equi-join with EXACTLY the naive join's bag of rows, must
  * COMPOSE with user equi keys (the as-of shape), and must stand down
  * when the query is already blocked or a broadcastable side + equi
  * key make the rewrite a pessimization.
  */
class BandRuleSpec extends SparkSpecBase {

  private val tol = 1000L

  // ~30 users, event times dense enough that every purchase has a few
  // views inside [t − tol, t] and several outside
  private def events = {
    val s = spark
    import s.implicits._
    val rows = (0 until 4000).map { i =>
      (i.toLong, i.toLong % 29L,
        (i.toLong * 7919L) % 100000L) // scrambled event time
    }
    val df = rows.toDF("id", "user", "ts")
    (df.select(col("id").as("p_id"), col("user").as("p_user"),
      col("ts").as("p_ts")),
      df.select(col("id").as("v_id"), col("user").as("v_user"),
        col("ts").as("v_ts")))
  }

  private def naiveBand: Seq[(Long, Long)] = {
    val rows = (0 until 4000).map { i =>
      (i.toLong, i.toLong % 29L, (i.toLong * 7919L) % 100000L)
    }
    (for {
      (p, pu, pt) <- rows; (v, vu, vt) <- rows
      if pu == vu && vt <= pt && vt >= pt - tol
    } yield (p, v)).sorted
  }

  private def noBroadcast[T](body: => T): T = {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  private def excluded[T](body: => T): T = {
    val key = "spark.sql.optimizer.excludedRules"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "graft.plans.BandJoinBlocking")
    try body
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("as-of shape: band composes with the user equi key, exact bag") {
    val (p, v) = events
    noBroadcast {
      val joined = p.join(v,
        col("p_user") === col("v_user") &&
          col("v_ts") <= col("p_ts") &&
          col("v_ts") >= col("p_ts") - tol)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("graft_band"),
        s"rule must fire and compose:\n${plan.take(3000)}")
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan.take(3000))
      val joinLine = plan.linesIterator.find(l =>
        l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
          l.contains("BroadcastHashJoin")).getOrElse("")
      assert(joinLine.contains("p_user") && joinLine.contains("graft_band"),
        s"join keys must include user AND bucket:\n$joinLine")
      val got = joined.select("p_id", "v_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(naiveBand.nonEmpty && got === naiveBand)
    }
  }

  test("comparison spellings and literal offsets all normalize") {
    val (p, v) = events
    noBroadcast {
      val spellings = Seq(
        // canonical
        col("v_ts") <= col("p_ts") && col("v_ts") >= col("p_ts") - tol,
        // reversed comparisons
        col("p_ts") >= col("v_ts") && col("p_ts") - tol <= col("v_ts"),
        // offset moved across: v + tol >= p
        col("v_ts") <= col("p_ts") && col("v_ts") + tol >= col("p_ts"),
        // strict upper recovers ≤ via integer tightening
        col("v_ts") < col("p_ts") + 1L && col("v_ts") >= col("p_ts") - tol)
      for (band <- spellings) {
        val joined = p.join(v, col("p_user") === col("v_user") && band)
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("graft_band"),
          s"spelling must rewrite:\n${plan.take(2000)}")
        val got = joined.select("p_id", "v_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
        assert(got === naiveBand)
      }
    }
  }

  test("difference spellings: x − y, abs, and offset forms all band") {
    val (p, v) = events
    noBroadcast {
      val spellings = Seq(
        // the subtraction the band IS: 0 ≤ p − v ≤ tol
        col("p_ts") - col("v_ts") <= tol && col("p_ts") - col("v_ts") >= 0L,
        // literal-first
        lit(tol) >= col("p_ts") - col("v_ts") &&
          lit(0L) <= col("p_ts") - col("v_ts"),
        // abs with a centering offset: |p − v − 500| ≤ 500 ⟺ 0 ≤ p − v ≤ 1000
        abs(col("p_ts") - col("v_ts") - lit(500L)) <= lit(500L),
        // strict abs recovers via integer tightening: |…| < 501
        abs(col("p_ts") - col("v_ts") - lit(500L)) < lit(501L))
      for (band <- spellings) {
        val joined = p.join(v, col("p_user") === col("v_user") && band)
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("graft_band"),
          s"difference spelling must rewrite:\n${plan.take(2000)}")
        val got = joined.select("p_id", "v_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
        assert(got === naiveBand)
      }
    }
  }

  test("datediff and timestamp-subtraction spellings band in their units") {
    noBroadcast {
      // DATE: |datediff(a, b)| ≤ 2
      val dbase = spark.range(1500).select(col("id"),
        date_add(lit("2020-01-01").cast("date"),
          (col("id") * 37 % 365).cast("int")).as("d"))
      val da = dbase.select(col("id").as("a_id"), col("d").as("a_d"))
      val db = dbase.select(col("id").as("b_id"), col("d").as("b_d"))
      val dj = da.join(db,
        abs(datediff(col("a_d"), col("b_d"))) <= 2 &&
          col("a_id") < col("b_id"))
      val dplan = dj.queryExecution.executedPlan.toString
      assert(dplan.contains("graft_band"),
        s"abs(datediff) must rewrite:\n${dplan.take(2500)}")
      val days = (0 until 1500).map(i => (i.toLong, i * 37 % 365))
      val dexp = (for {
        (ai, ad) <- days; (bi, bd) <- days
        if ai < bi && math.abs(ad - bd) <= 2
      } yield (ai, bi)).sorted
      val dgot = dj.select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(dexp.nonEmpty && dgot === dexp)

      // TIMESTAMP: ts1 − ts2 bounded by INTERVALs (SubtractTimestamps)
      val tbase = spark.range(1500).select(col("id"),
        timestamp_micros(col("id") * 7919L % 100000000L).as("t"))
      val ta = tbase.select(col("id").as("a_id"), col("t").as("a_t"))
      val tb = tbase.select(col("id").as("b_id"), col("t").as("b_t"))
      val tj = ta.join(tb,
        expr("a_t - b_t <= INTERVAL '10' SECOND") &&
          expr("a_t - b_t >= INTERVAL '0' SECOND"))
      val tplan = tj.queryExecution.executedPlan.toString
      assert(tplan.contains("graft_band"),
        s"timestamp subtraction must rewrite:\n${tplan.take(2500)}")
      val us = (0 until 1500).map(i => (i.toLong, i * 7919L % 100000000L))
      val texp = (for {
        (ai, at) <- us; (bi, bt) <- us
        if at - bt <= 10000000L && at - bt >= 0L
      } yield (ai, bi)).sorted
      val tgot = tj.select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(texp.nonEmpty && tgot === texp)
    }
  }

  test("bare band join (no equi key): fires, bag identical to excluded") {
    val (p, v) = events
    noBroadcast {
      // restrict sides to keep the true nested-loop baseline cheap
      val ps = p.filter(col("p_id") < 400)
      val vs = v.filter(col("v_id") < 400)
      def build(pp: org.apache.spark.sql.DataFrame,
          vv: org.apache.spark.sql.DataFrame) =
        pp.join(vv, col("v_ts") <= col("p_ts") &&
          col("v_ts") >= col("p_ts") - tol)
      val expected = excluded {
        val r = build(ps, vs)
        assert(!r.queryExecution.executedPlan.toString
          .contains("graft_band"))
        r.select("p_id", "v_id").collect()
          .map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted
      }
      val r = build(ps, vs)
      assert(r.queryExecution.executedPlan.toString.contains("graft_band"))
      val got = r.select("p_id", "v_id").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted
      assert(expected.nonEmpty && got === expected)
    }
  }

  test("bag semantics: duplicated probe rows multiply") {
    val (p, v) = events
    noBroadcast {
      val ps = p.filter(col("p_id") < 300)
      val vs = v.filter(col("v_id") < 300)
      val once = ps.join(vs, col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - tol).count()
      val twice = ps.union(ps).join(vs, col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - tol).count()
      assert(twice === 2L * once && once > 0L)
    }
  }

  test("stand-downs: already-blocked manual bucket; equi + broadcastable") {
    val (p, v) = events
    noBroadcast {
      // manual q261-style blocking: bucket equi key derived from the
      // band base — a second bucket key would double the probe side.
      // (Built over spark.range, not a local Seq: ConvertToLocalRelation
      // would fold a local fixture's bucket column into the data and
      // leave no alias for the guard to expand — parquet-backed plans,
      // the real case, keep the Project.)
      val base = spark.range(4000).select(col("id"),
        (col("id") % 29).as("user"),
        (col("id") * 7919L % 100000L).as("ts"))
      val p = base.select(col("id").as("p_id"), col("user").as("p_user"),
        col("ts").as("p_ts"))
      val v = base.select(col("id").as("v_id"), col("user").as("v_user"),
        col("ts").as("v_ts"))
      val pm = p.withColumn("bkt",
        call_function("div", col("p_ts"), lit(tol)))
      val vm = v.withColumn("bkt2",
        call_function("div", col("v_ts"), lit(tol)))
      val manual = pm.join(vm,
        col("bkt") === col("bkt2") &&
          col("v_ts") <= col("p_ts") && col("v_ts") >= col("p_ts") - tol)
      assert(!manual.queryExecution.executedPlan.toString
        .contains("graft_band"),
        "manually-blocked band joins must stand down")
    }
    // broadcastable side + user equi key: Spark's broadcast hash join
    // on the equi key (band as residual) wins — leave it alone
    val joined = p.join(v,
      col("p_user") === col("v_user") &&
        col("v_ts") <= col("p_ts") && col("v_ts") >= col("p_ts") - tol)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("graft_band") &&
      plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("DATE bands: date_sub spelling fires, exact bag in days") {
    val s = spark
    import s.implicits._
    noBroadcast {
      val base = spark.range(2000).select(col("id"),
        date_add(lit(java.sql.Date.valueOf("2020-01-01")),
          (col("id") * 37 % 365).cast("int")).as("d"))
      val a = base.select(col("id").as("a_id"), col("d").as("a_d"))
      val b = base.select(col("id").as("b_id"), col("d").as("b_d"))
      val joined = a.join(b,
        col("b_d") >= date_sub(col("a_d"), 30) && col("b_d") <= col("a_d"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("graft_band"),
        s"date band must rewrite:\n${plan.take(2500)}")
      val got = joined.select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val days = (0 until 2000).map(i => (i.toLong, (i * 37 % 365)))
      val expected = (for {
        (ai, ad) <- days; (bi, bd) <- days
        if bd >= ad - 30 && bd <= ad
      } yield (ai, bi)).sorted
      assert(expected.nonEmpty && got === expected)
    }
  }

  test("TIMESTAMP bands: INTERVAL spelling fires, exact bag in micros") {
    noBroadcast {
      val base = spark.range(2000).select(col("id"),
        timestamp_micros(col("id") * 7919L % 100000000L).as("t"))
      val a = base.select(col("id").as("a_id"), col("t").as("a_t"))
      val b = base.select(col("id").as("b_id"), col("t").as("b_t"))
      val joined = a.join(b,
        col("b_t") >= col("a_t") - expr("INTERVAL '10' SECOND") &&
          col("b_t") <= col("a_t"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("graft_band"),
        s"timestamp band must rewrite:\n${plan.take(2500)}")
      val got = joined.select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val us = (0 until 2000).map(i => (i.toLong, i * 7919L % 100000000L))
      val expected = (for {
        (ai, at) <- us; (bi, bt) <- us
        if bt >= at - 10000000L && bt <= at
      } yield (ai, bi)).sorted
      assert(expected.nonEmpty && got === expected)
    }
  }

  // --- round-8: per-left-row variants --------------------------------------

  // narrower band than `tol`: the outer/anti fixtures need UNMATCHED
  // probes to exist (at width 1000 every probe finds a view)
  private val tol2 = 251L

  test("left-outer band join: matched bag + one null row per unmatched") {
    val (p, v) = events
    noBroadcast {
      val ps = p.filter(col("p_id") < 400)
      val vs = v.filter(col("v_id") % 3 === 0 && col("v_id") < 400)
      def build = ps.join(vs, col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - tol2, "left")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("p_id", "v_id").collect()
          .map(r => (r.getLong(0),
            if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq.sorted
      val expected = excluded {
        val r = build
        assert(!r.queryExecution.executedPlan.toString
          .contains("graft_band"))
        rows(r)
      }
      val r = build
      assert(r.queryExecution.executedPlan.toString.contains("graft_band"),
        "left-outer band must rewrite")
      val got = rows(r)
      assert(expected.exists(_._2 == -1L) && expected.exists(_._2 >= 0L),
        "fixture must have both matched and unmatched probes")
      assert(got === expected)
    }
  }

  test("left-semi and left-anti band joins: exact left-grain partition") {
    val (p, v) = events
    noBroadcast {
      val ps = p.filter(col("p_id") < 400)
      val vs = v.filter(col("v_id") % 3 === 0 && col("v_id") < 400)
      for (jt <- Seq("left_semi", "left_anti")) {
        def build = ps.join(vs, col("v_ts") <= col("p_ts") &&
          col("v_ts") >= col("p_ts") - tol2, jt)
        val expected = excluded {
          val r = build
          assert(!r.queryExecution.executedPlan.toString
            .contains("graft_band"))
          r.select("p_id").collect().map(_.getLong(0)).toSeq.sorted
        }
        val r = build
        assert(r.queryExecution.executedPlan.toString
          .contains("graft_band"), s"$jt band must rewrite")
        val got = r.select("p_id").collect().map(_.getLong(0)).toSeq.sorted
        assert(expected.nonEmpty && got === expected, jt)
      }
    }
  }

  test("left-outer/semi/anti preserve duplicate left rows") {
    val (p, v) = events
    noBroadcast {
      val ps = p.filter(col("p_id") < 300)
      val vs = v.filter(col("v_id") % 3 === 0 && col("v_id") < 300)
      val band = col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - tol2
      for (jt <- Seq("left", "left_semi", "left_anti")) {
        val once = ps.join(vs, band, jt).count()
        val twice = ps.union(ps).join(vs, band, jt).count()
        assert(once > 0L && twice === 2L * once, jt)
      }
    }
  }

  test("half-bounded ranges do not fire") {
    val (p, v) = events
    noBroadcast {
      val joined = p.filter(col("p_id") < 200).join(
        v.filter(col("v_id") < 200), col("v_ts") <= col("p_ts"))
      assert(!joined.queryExecution.executedPlan.toString
        .contains("graft_band"),
        "a one-sided bound has no bucket width — must stand down")
    }
  }

  // variable-width intervals: [s, s + 0..499), a sprinkle of REVERSED
  // rows (e < s — the raw two-conjunct predicate can still hold
  // against a wide partner, so the rewrite must reproduce even those)
  private def intervals = {
    val s0 = spark
    import s0.implicits._
    val rows = (0 until 3000).map { i =>
      val s = (i.toLong * 7919L) % 100000L
      val e = if (i % 97 == 0) s - 50L else s + (i.toLong * 31L) % 500L
      (i.toLong, i.toLong % 23L, s, e)
    }
    val df = rows.toDF("id", "user", "s", "e")
    (df.select(col("id").as("a_id"), col("user").as("a_user"),
      col("s").as("a_s"), col("e").as("a_e")),
      df.select(col("id").as("b_id"), col("user").as("b_user"),
        col("s").as("b_s"), col("e").as("b_e")))
  }

  test("variable-width interval overlap: tiles both sides, exact bag") {
    val (a, b) = intervals
    val cond = col("a_user") === col("b_user") &&
      col("a_s") <= col("b_e") && col("b_s") <= col("a_e")
    val expected = excluded { noBroadcast {
      a.join(b, cond).select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    } }
    noBroadcast {
      val joined = a.join(b, cond)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("graft_band") && plan.contains("Generate"),
        s"interval arm must tile:\n${plan.take(3000)}")
      // the adaptive tile width adds a legitimate 1-row Cross
      // broadcast (graft_band_b*); the INTERVAL JOIN itself must
      // still never nested-loop
      assert("BroadcastNestedLoopJoin Build(Left|Right), Inner".r
        .findFirstIn(plan).isEmpty
        && !plan.contains("CartesianProduct"), plan.take(3000))
      val got = joined.select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(expected.nonEmpty && got === expected)
    }
  }

  test("interval overlap with literal offsets and strict spellings") {
    val (a, b) = intervals
    // a_s − 10 < b_e ∧ b_s ≤ a_e + 5 — offsets fold into the endpoints
    val cond = col("a_user") === col("b_user") &&
      col("a_s") - 10L < col("b_e") && col("b_s") <= col("a_e") + 5L
    val expected = excluded { noBroadcast {
      a.join(b, cond).count()
    } }
    noBroadcast {
      val joined = a.join(b, cond)
      assert(joined.queryExecution.executedPlan.toString
        .contains("graft_band"))
      assert(expected > 0L && joined.count() === expected)
    }
  }

  test("point-in-variable-interval joins block as degenerate intervals") {
    val (a, b) = intervals
    // the point a_s against [b_s, b_e]: L = [a_s, a_s]
    val cond = col("a_user") === col("b_user") &&
      col("a_s") <= col("b_e") && col("b_s") <= col("a_s")
    val expected = excluded { noBroadcast {
      a.join(b, cond).count()
    } }
    noBroadcast {
      val joined = a.join(b, cond)
      assert(joined.queryExecution.executedPlan.toString
        .contains("graft_band"))
      assert(expected > 0L && joined.count() === expected)
    }
  }

  test("DATE intervals stay unique next to integral id tiebreakers") {
    val s0 = spark
    import s0.implicits._
    val rows = (0 until 2000).map { i =>
      (i.toLong, i.toLong % 17L, (i * 7919) % 3000, (i * 37) % 90 + 1)
    }
    val df = rows.toDF("id", "user", "d0", "w")
      .select(col("id"), col("user"),
        expr("date_add(DATE '1995-01-01', d0)").as("s"),
        expr("date_add(DATE '1995-01-01', d0 + w)").as("e"))
    val a = df.select(col("id").as("a_id"), col("user").as("a_user"),
      col("s").as("a_s"), col("e").as("a_e"))
    val b = df.select(col("id").as("b_id"), col("user").as("b_user"),
      col("s").as("b_s"), col("e").as("b_e"))
    // the id tiebreaker ALSO parses as an upper bound, but it cannot
    // kind-cross with the DATE endpoints — exactly one quadruple
    // remains and the arm tiles the dates, never id-spans
    val cond = col("a_user") === col("b_user") &&
      col("a_id") < col("b_id") &&
      col("a_s") <= col("b_e") && col("b_s") <= col("a_e")
    val expected = excluded { noBroadcast {
      a.join(b, cond).count()
    } }
    noBroadcast {
      val joined = a.join(b, cond)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("graft_band"), plan.take(3000))
      assert(expected > 0L && joined.count() === expected)
    }
  }

  test("interval arm stand-downs: broadcastable, ambiguity, bands win") {
    val (a, b) = intervals
    val cond = col("a_s") <= col("b_e") && col("b_s") <= col("a_e")
    noBroadcast {
      // an all-integral id tiebreaker inside the condition adds a
      // second endpoint quadruple — the arm never guesses which pair
      // to tile (id-spans would explode) and stands down whole
      val amb = a.join(b, cond && col("a_user") === col("b_user") &&
        col("a_id") < col("b_id"))
      assert(!amb.queryExecution.executedPlan.toString
        .contains("graft_band"),
        "ambiguous endpoint quadruples must stand down")
    }
    // default threshold: tiny sides → broadcast nested loop is fine
    assert(!a.join(b, cond && col("a_user") === col("b_user"))
      .queryExecution.executedPlan.toString.contains("graft_band"))
    noBroadcast {
      // a fixed-width band spelling keeps the 2-bucket band arm (no
      // Generate-both-sides explode)
      val bandJ = a.join(b, col("a_user") === col("b_user") &&
        col("b_s") <= col("a_s") && col("b_s") >= col("a_s") - 100L)
      val p = bandJ.queryExecution.executedPlan.toString
      assert(p.contains("graft_band"), p.take(2000))
      assert(p.linesIterator.count(_.contains("Generate")) === 1,
        s"band arm explodes the probe side only:\n${p.take(3000)}")
    }
  }

  test("TIMESTAMP interval overlap: micros tiling, exact bag") {
    val s0 = spark
    import s0.implicits._
    val rows = (0 until 2000).map { i =>
      (i.toLong, i.toLong % 19L, (i * 7919) % 86400, (i * 37) % 3600 + 60)
    }
    val df = rows.toDF("id", "user", "off", "w")
      .select(col("id"), col("user"),
        expr("timestamp_micros(cast(off as bigint) * 1000000)").as("s"),
        expr("timestamp_micros(cast(off + w as bigint) * 1000000)")
          .as("e"))
    val a = df.select(col("id").as("a_id"), col("user").as("a_user"),
      col("s").as("a_s"), col("e").as("a_e"))
    val b = df.select(col("id").as("b_id"), col("user").as("b_user"),
      col("s").as("b_s"), col("e").as("b_e"))
    val cond = col("a_user") === col("b_user") &&
      col("a_s") <= col("b_e") && col("b_s") <= col("a_e")
    val expected = excluded { noBroadcast {
      a.join(b, cond).count()
    } }
    noBroadcast {
      val joined = a.join(b, cond)
      assert(joined.queryExecution.executedPlan.toString
        .contains("graft_band"))
      assert(expected > 0L && joined.count() === expected)
    }
  }

  test("non-inner interval overlaps: left-grain semi/anti/outer parity") {
    val (a, b) = intervals
    val cond = col("a_user") === col("b_user") &&
      col("a_s") <= col("b_e") && col("b_s") <= col("a_e")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toSeq.mkString("|")).toSeq.sorted
    for (jt <- Seq("left_semi", "left_anti", "left_outer")) {
      val expected = excluded { noBroadcast { rows(a.join(b, cond, jt)) } }
      noBroadcast {
        val joined = a.join(b, cond, jt)
        assert(joined.queryExecution.executedPlan.toString
          .contains("graft_band"), s"$jt must fire")
        assert(expected.nonEmpty && rows(joined) === expected, jt)
      }
    }
    // duplicate left rows survive the rid regroup (bag semantics)
    noBroadcast {
      for (jt <- Seq("left_semi", "left_anti")) {
        val once = a.join(b, cond, jt).count()
        val twice = a.union(a).join(b, cond, jt).count()
        assert(once > 0L && twice === 2L * once, jt)
      }
    }
  }
}
