package graft

import java.security.MessageDigest

/** RobustOps pack checks: full JVM recomputes of the Kaplan-Meier integer
  * fold, the greedy packer, and the Poisson-bootstrap multiplicities —
  * independent of both engines' SQL — plus conservation / bound invariants
  * for MAD outliers, DSIR weighting, and exact deciles on testdata.
  */
class RobustOpsSpec extends SparkSpecBase {

  private val sf0001 = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf0001)

  private def md5u32(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  // --- q221 Kaplan-Meier ---------------------------------------------------

  test("q221: survival is the exact integer product fold, monotone from 1e6") {
    val rows = run("q221_kaplan_meier").collect()
    assert(rows.nonEmpty)
    var s = 1000000L
    var prevT = -1L
    rows.foreach { r =>
      val (t, n, d, micro) =
        (r.getInt(0).toLong, r.getLong(1), r.getLong(2), r.getLong(3))
      assert(t > prevT, "t-grid must be strictly increasing")
      prevT = t
      assert(d > 0 && d <= n)
      s = s * (n - d) / n // the exact recompute, same truncation
      assert(micro === s, s"survival at t=$t")
      assert(r.getDouble(4) === micro / 1000000.0)
    }
    // risk sets shrink (suffix sums over a growing prefix removed)
    val ns = rows.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a > b })
  }

  test("q221: risk set at first event time covers every customer") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val nCust = orders.select("o_custkey").distinct().count()
    val first = run("q221_kaplan_meier").collect().head
    // censoring can only remove customers whose first order is BEFORE the
    // first repeat gap elapses; with the testdata span every customer is
    // still at risk at the earliest event time unless censored earlier
    assert(first.getLong(1) <= nCust)
    assert(first.getLong(1) > 0)
  }

  // --- q222 sequence packing -----------------------------------------------

  test("q222: JVM greedy packer agrees per source; efficiency bounds hold") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("source", "doc_id",
        "size(filter(split(text, ' '), x -> x != '')) AS n")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), math.min(r.getInt(2), 256)))
    val expect = docs
      .map { case (src, id, n) => (src, md5u32(s"pack|$id") % 8, id, n) }
      .groupBy { case (src, sh, _, _) => (src, sh) }
      .toSeq
      .map { case ((src, _), g) =>
        var bins = 1L
        var fill = 0L
        g.sortBy(_._3).foreach { case (_, _, _, n) =>
          if (fill + n <= 256) fill += n else { bins += 1; fill = n }
        }
        (src, bins, g.map(_._4.toLong).sum)
      }
      .groupBy(_._1)
      .map { case (src, shards) =>
        src -> ((shards.map(_._2).sum, shards.map(_._3).sum)) }
    val got = run("q222_sequence_packing").collect()
    got.foreach { r =>
      val (bins, toks) = expect(r.getString(0))
      assert(r.getLong(4) === bins, s"bins for ${r.getString(0)}")
      assert(r.getLong(3) === toks)
      val eff = r.getDouble(6)
      assert(eff > 0.0 && eff <= 1.0)
      assert(r.getLong(5) === bins * 256)
    }
    assert(got.map(_.getLong(1)).sum === docs.length.toLong)
  }

  // --- q223 Poisson bootstrap ----------------------------------------------

  test("q223: CI brackets the point estimate; multiplicities match JVM md5") {
    val r = run("q223_poisson_bootstrap").collect().head
    val (point, boot, lo, hi) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(lo < hi)
    assert(lo < point && point < hi, "95% CI should bracket the mean here")
    assert(math.abs(boot - point) < (hi - lo),
      "bootstrap mean near the point estimate")
    assert(r.getInt(4) === 64)
    // multiplicity law spot-check: JVM-recompute replicate 1's mean
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("o_orderkey", "CAST(round(o_totalprice * 100) AS LONG)")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val ts = Seq(1580030168L, 3160060337L, 3950075421L, 4213413783L,
      4279248373L)
    def mult(k: Long, rep: Int): Long = {
      val h = md5u32(s"boot|$k:$rep")
      ts.indexWhere(h < _) match { case -1 => 5L; case i => i.toLong }
    }
    val (sc, sm) = orders.foldLeft((0L, 0L)) { case ((a, b), (k, c)) =>
      val m = mult(k, 1); (a + m * c, b + m)
    }
    assert(sm > 0)
    // replicate 1's mean must be one of the 64 sorted means ⇒ within CI
    // support; direct equality is checked against a dedicated dump:
    val mean1 = sc.toDouble / sm / 100.0
    assert(mean1 > point * 0.8 && mean1 < point * 1.2)
  }

  // --- q224 DSIR -----------------------------------------------------------

  test("q224: weights bounded by smoothing; en sources score higher") {
    val rows = run("q224_dsir_importance").collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val meanW = r.getDouble(5)
      // (ct+1)·1000 div (cr+1) with ct ≤ cr ⇒ weight ≤ 1000 per token
      assert(meanW > 0.0 && meanW <= 1000.0)
      assert(r.getLong(4) <= r.getLong(1), "selected ≤ docs")
    }
    // the corpus-mean cut is relative: it must split the corpus, not
    // degenerate to keep-all or drop-all
    val sel = rows.map(_.getLong(4)).sum
    assert(sel > 0 && sel < rows.map(_.getLong(1)).sum)
  }

  test("q224: token conservation against the shared tokenizer") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("size(filter(split(text, ' '), x -> x != '')) AS n")
      .collect().map(_.getInt(0).toLong).sum
    val rows = run("q224_dsir_importance").collect()
    assert(rows.map(_.getLong(3)).sum === docs)
  }

  // --- q225 MAD outliers ---------------------------------------------------

  test("q225: JVM midrank recompute of median and MAD per segment") {
    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
      .selectExpr("c_mktsegment", "CAST(round(c_acctbal * 100) AS LONG)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def med2(xs: Seq[Long]): Long = {
      val s = xs.sorted
      val n = s.length
      s((n + 1) / 2 - 1) + s(n / 2) // ⌊(n+1)/2⌋th + ⌈(n+1)/2⌉th, 1-based
    }
    val expect = cust.groupBy(_._1).map { case (seg, g) =>
      val cents = g.map(_._2).toSeq
      val m2 = med2(cents)
      val mad4 = med2(cents.map(c => math.abs(c * 2 - m2)))
      val out = cents.count(c =>
        math.abs(c * 2 - m2) * 13490L > mad4 * 35000L)
      seg -> ((cents.length.toLong, m2 / 200.0, mad4 / 400.0, out.toLong))
    }
    val got = run("q225_mad_outliers").collect()
    assert(got.length === expect.size)
    got.foreach { r =>
      val (n, med, mad, out) = expect(r.getString(0))
      assert(r.getLong(1) === n)
      assert(r.getDouble(2) === med, s"median ${r.getString(0)}")
      assert(r.getDouble(3) === mad, s"mad ${r.getString(0)}")
      assert(r.getLong(4) === out)
    }
  }

  // --- q226 exact deciles --------------------------------------------------

  test("q226: decile edges are corpus elements, monotone, decile 10 = max") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sorted }
    val rows = run("q226_exact_deciles").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (src, g) =>
      val sorted = docs(src)
      val bySrc = g.sortBy(_._2)
      assert(bySrc.length === 10)
      // exact percentile_disc: edge k = element at ⌈k·n/10⌉ (1-based)
      bySrc.foreach { case (_, k, edge) =>
        val idx = math.ceil(k * sorted.length / 10.0).toInt - 1
        assert(edge === sorted(idx), s"$src decile $k")
      }
      assert(bySrc.last._3 === sorted.max)
      assert(bySrc.map(_._3).zip(bySrc.map(_._3).tail)
        .forall { case (a, b) => a <= b })
    }
  }
}
