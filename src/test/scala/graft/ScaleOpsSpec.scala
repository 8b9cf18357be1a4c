package graft

import java.security.MessageDigest

/** ScaleOps pack checks: JVM recompute of the Bloom filter's pass/join
  * ledger (zero false negatives by construction), exactness of the
  * maintained join view, the histogram-quantile error bound, and physical
  * plan pins for the broadcast shapes the scale story depends on.
  */
class ScaleOpsSpec extends SparkSpecBase {

  private val sf0001 = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf0001)

  private def md5u32(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  test("q234: JVM bloom recompute — no false negatives, ledger exact") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val hot = orders.filter(_._2 > 400000.0).map(_._1).toSet
    val bits = hot.flatMap(k =>
      (0 until 3).map(j => md5u32(s"bj$j|$k") % 8192))
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .selectExpr("l_orderkey").collect().map(_.getLong(0))
    def passes(k: Long): Boolean =
      (0 until 3).forall(j => bits.contains(md5u32(s"bj$j|$k") % 8192))
    val nPass = li.count(passes)
    val nJoined = li.count(hot.contains)
    val r = run("q234_bloom_join").collect().head
    assert(r.getLong(0) === li.length.toLong)
    assert(r.getLong(1) === nPass.toLong, "bloom pass count")
    assert(r.getLong(2) === nJoined.toLong, "exact join count")
    assert(r.getLong(3) === (nPass - nJoined).toLong, "false passes")
    // the whole point: every truly-hot lineitem survives the filter
    assert(li.filter(hot.contains).forall(passes), "false negative!")
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) < 1.0)
  }

  test("q235: maintained join view is cell-exact vs direct recompute") {
    val r = run("q235_ivm_join").collect().head
    assert(r.getLong(0) > 0)
    assert(r.getLong(1) === 0L, "maintained view must equal recompute")
    assert(r.getDouble(2) === r.getDouble(3), "revenue totals equal")
  }

  test("q236: histogram decile sits in the right bin (bounded-below error)") {
    val chars = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("n_chars").collect().map(_.getLong(0)).sorted
    val (lo, hi, n) = (chars.head, chars.last, chars.length)
    val span = hi - lo + 1
    val rows = run("q236_histogram_quantiles").collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val (k, rank, exact, approx, err) = (r.getInt(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(rank === math.ceil(k * n / 10.0).toLong)
      assert(exact === chars(rank.toInt - 1), s"decile $k exact")
      // approx is the containing bin's lower edge: never above the true
      // value, never more than one bin width below
      assert(err <= 0, s"decile $k err $err")
      assert(-err <= span / 64 + 1, s"decile $k err $err vs width")
    }
  }

  test("q237: JVM IPS recompute; ESS bounded by n") {
    val ev = graft.catalog.Tables.load(spark, sf0001, "events")
      .selectExpr("user_id", "event_type",
        "CAST(round(value * 100) AS LONG)").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val k = ev.map(_._2).distinct.length
    val nU = ev.groupBy(_._1).map { case (u, g) => u -> g.length }
    val nUA = ev.groupBy(e => (e._1, e._2)).map { case (p, g) => p -> g.length }
    val ws = ev.map { case (u, a, r) =>
      (nU(u).toDouble / (k.toLong * nUA((u, a))), r)
    }
    val n = ev.length
    val row = run("q237_ips_policy_eval").collect().head
    assert(row.getLong(0) === n.toLong)
    assert(row.getLong(1) === k.toLong)
    assert(row.getDouble(2) === ev.map(_._3).sum.toDouble / n / 100.0)
    val ips = ws.map { case (w, r) => w * r }.sum / n / 100.0
    assert(math.abs(row.getDouble(3) - ips) <= 0.01, "ips value")
    val sw = ws.map(_._1).sum
    val ess = sw * sw / ws.map(w => w._1 * w._1).sum
    assert(math.abs(row.getDouble(4) - ess) <= 0.01, "ess")
    assert(row.getDouble(4) <= n + 0.01, "Kish ESS can't exceed n")
  }

  test("q238: every lineitem resolves exactly one SCD2 version or (none)") {
    val rows = run("q238_scd2_pit_join").collect()
    val nLi = spark.read.parquet(s"$sf0001/lineitem.parquet").count()
    // conservation incl. the explicit pre-history bucket: the PIT ranges
    // partition [first-order, ∞) per customer, facts before that land in
    // '(none)' — nothing is dropped, nothing duplicates
    assert(rows.map(_.getLong(1)).sum === nLi)
    assert(rows.exists(_.getString(0) == "(none)"),
      "testdata ships some items pre-history; the bucket must surface")
    val rev = rows.map(_.getDouble(3)).sum
    val direct = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .selectExpr(
        "CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS LONG)")
      .collect().map(_.getLong(0)).sum / 10000.0
    assert(math.abs(rev - direct) < 1e-6, "revenue conserved")
  }

  test("q239: backtest shares q196's fold (same forecast), positive MAE") {
    val bt = run("q239_holt_backtest").collect()
      .map(r => r.getString(0) ->
        ((r.getInt(1), r.getDouble(2), r.getDouble(3)))).toMap
    val holt = SparkEntry.queries("q196_holt_trend")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getDouble(4)))).toMap
    assert(bt.keySet === holt.keySet)
    bt.foreach { case (p, (nDays, mae, fc)) =>
      assert(nDays === holt(p)._1, s"$p n_days")
      assert(fc === holt(p)._2, s"$p same final state ⇒ same forecast")
      assert(mae > 0.0, s"$p mae")
    }
  }

  test("q240: JVM recompute; uniformity is a Cauchy-Schwarz lower bound") {
    val cnts = graft.catalog.Tables.load(spark, sf0001, "events")
      .groupBy("user_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = cnts.map(_._2).sum
    val ndv = cnts.length.toLong
    val actual = cnts.map(c => c._2 * c._2).sum
    val top = cnts.sortBy(c => (-c._2, c._1)).take(10)
    val estTopk = top.map(c => c._2 * c._2).sum + {
      val rest = n - top.map(_._2).sum
      if (ndv > 10) rest * rest / (ndv - 10) else 0L
    }
    val r = run("q240_join_card_estimate").collect().head
    assert(r.getLong(0) === n)
    assert(r.getLong(1) === ndv)
    assert(r.getLong(2) === actual)
    assert(r.getLong(3) === n * n / ndv)
    assert(r.getLong(4) === estTopk)
    // n²/ndv ≤ Σc² always (Cauchy-Schwarz) — the uniform estimate can
    // only UNDERestimate a skewed self-join
    assert(r.getLong(3) <= actual)
    assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0)
  }

  test("q241: decile edges are matrix elements, monotone per dim, 640 rows") {
    val rows = run("q241_embedding_quantiles").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    assert(rows.length === 640)
    val byDim = rows.groupBy(_._1)
    assert(byDim.size === 64)
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .selectExpr("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    byDim.foreach { case (d, g) =>
      val sorted = emb.map(_(d).toDouble).sorted
      val edges = g.sortBy(_._2).map(_._3)
      assert(edges.zip(edges.tail).forall { case (a, b) => a <= b })
      // exact rank selection: decile k = element ⌈k·n/10⌉
      g.foreach { case (_, k, e) =>
        assert(e === sorted(math.ceil(k * sorted.length / 10.0).toInt - 1),
          s"dim $d decile $k")
      }
    }
  }

  test("q242: rendezvous moves ~2/10 of docs; mod-N moves most of them") {
    val r = run("q242_rendezvous_reshard").collect().head
    val n = r.getLong(0)
    assert(n > 0)
    // JVM recompute of the rendezvous owners
    val ids = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("doc_id").collect().map(_.getLong(0))
    def owner(id: Long, shards: Int): Int =
      (0 until shards).maxBy(sh => (md5u32(s"rdv|$id#$sh"), sh))
    val movedRdv = ids.count(id => owner(id, 8) != owner(id, 10))
    assert(r.getLong(2) === movedRdv.toLong, "rendezvous moved count")
    // expectation: rendezvous ≈ 2/10 moved, mod-N ≈ 9/10 moved
    assert(r.getDouble(4) < 0.35, s"rdv frac ${r.getDouble(4)}")
    assert(r.getDouble(3) > 0.7, s"mod frac ${r.getDouble(3)}")
    assert(r.getDouble(4) < r.getDouble(3))
  }

  test("q243: no bloom-missed hits; contaminated docs agree with q143") {
    val r = run("q243_bloom_decontam").collect().head
    assert(r.getLong(4) === 0L, "a Bloom filter can't have false negatives")
    assert(r.getLong(1) >= r.getLong(2), "pass ⊇ exact hits")
    assert(r.getLong(3) === r.getLong(1) - r.getLong(2))
    val q143 = SparkEntry.queries("q143_decontamination")(spark, sf0001)
      .collect().map(_.getLong(2)).sum
    assert(r.getLong(5) === q143,
      "bloom path must reach the same exact contamination verdicts")
    assert(r.getDouble(6) > 0.0 && r.getDouble(6) < 1.0)
  }

  test("q244: JVM least-squares recompute from exact integer sums") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("o_orderpriority", "CAST(o_orderdate AS DATE)",
        "CAST(round(o_totalprice * 100) AS LONG)").collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val d0 = orders.map(_._2).min
    val daily = orders.groupBy(o => (o._1, o._2))
      .map { case ((p, d), g) =>
        (p, java.time.temporal.ChronoUnit.DAYS.between(d0, d),
          g.map(_._3).sum)
      }.toSeq
    val expect = daily.groupBy(_._1).map { case (p, g) =>
      val n = g.size.toLong
      val sx = g.map(_._2).sum; val sy = g.map(_._3).sum
      val sxy = g.map(t => t._2 * t._3).sum
      val sxx = g.map(t => t._2 * t._2).sum
      val syy = g.map(t => BigInt(t._3) * BigInt(t._3)).sum
      val num = (n * sxy - sx * sy).toDouble
      val den = (n * sxx - sx * sx).toDouble
      val deny = n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble
      p -> ((n, num / den, num * num / (den * deny)))
    }
    val got = run("q244_ols_trend").collect()
    assert(got.length === expect.size)
    got.foreach { r =>
      val (n, slope, r2) = expect(r.getString(0))
      assert(r.getLong(1) === n)
      assert(r.getDouble(2) === slope, s"${r.getString(0)} slope")
      assert(r.getDouble(4) === r2, s"${r.getString(0)} r2")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("q245: Wilson interval brackets the rate; counts match q199 levels") {
    val levels = SparkEntry.queries("q199_window_funnel")(spark, sf0001)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    def atLeast(k: Int) = levels.filter(_._1 >= k).values.sum
    val got = run("q245_wilson_funnel").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(got("view_to_click")._1 === atLeast(1))
    assert(got("view_to_click")._2 === atLeast(2))
    assert(got("click_to_purchase")._1 === atLeast(2))
    assert(got("click_to_purchase")._2 === atLeast(3))
    got.foreach { case (step, (n, k, rate, lo, hi)) =>
      assert(rate === k.toDouble / n)
      // p̂ = 1 is a real case here (every viewer clicked at sf0.001) and
      // Wilson's upper bound is then exactly 1.0 — bracket inclusively
      assert(lo <= rate && rate <= hi, s"$step interval brackets the rate")
      assert(lo >= 0.0 && hi <= 1.0, s"$step Wilson stays inside [0,1]")
    }
  }

  // --- plan pins -----------------------------------------------------------

  private def planOf(name: String): String =
    run(name).queryExecution.executedPlan.toString

  test("q234 plan: bloom probe and exact join are all broadcast joins") {
    val p = planOf("q234_bloom_join")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"),
      "fact stream must never shuffle-sort")
  }

  test("q225 plan: median/MAD thresholds broadcast back to the row stream") {
    val p = planOf("q225_mad_outliers")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
  }

  test("rank-grid quantile family plans: target grids broadcast") {
    // q226/q236/q241 all join a ranked stream against a tiny target-rank
    // grid — the grid must broadcast; a shuffle join would sort the
    // corpus twice at 100 TB
    for (q <- Seq("q226_exact_deciles", "q236_histogram_quantiles",
      "q241_embedding_quantiles")) {
      val p = planOf(q)
      assert(p.contains("BroadcastHashJoin") ||
        p.contains("BroadcastNestedLoopJoin"), s"$q: ${p.take(800)}")
      assert(!p.contains("SortMergeJoin"), s"$q must not shuffle-sort join")
    }
  }

  test("q222 plan: packing folds without any join or global sort") {
    val p = planOf("q222_sequence_packing")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"))
    // global orderBy(source) on the 20-row output is fine; the fold itself
    // must run inside the per-shard aggregate, not a window
    assert(!p.contains("Window"), "no window in the packer")
  }
}
