package graft

import java.security.MessageDigest

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Packer
import graft.streaming.Packer.Doc

/** Selection pack checks: JVM recomputes of the repetition flags, the
  * held-out LM scoring (train-only counts), the priority-sampling
  * estimator, and the adaptive gate; plus exact batch parity for the
  * streaming packer across micro-batch splits.
  */
class SelectionSpec extends SparkSpecBase {

  private val sf0001 = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf0001)

  private def md5u32(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  private def toks(t: String): Seq[String] =
    t.split(" ").filter(_.nonEmpty).toSeq

  private lazy val docs: Seq[(Long, String, String)] =
    spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  // --- q227 repetition audit ----------------------------------------------

  test("q227: JVM recompute of bigram repetition sums and flags") {
    val expect = docs.groupBy(_._2).map { case (src, g) =>
      var (nBi, nDist, top, flag) = (0L, 0L, 0L, 0L)
      g.foreach { case (_, _, text) =>
        val t = toks(text)
        val bi = t.zip(t.drop(1)).map { case (a, b) => s"$a $b" }
        val d = bi.distinct.length.toLong
        val tc = if (bi.isEmpty) 0L
          else bi.groupBy(identity).values.map(_.length).max.toLong
        nBi += bi.length; nDist += d; top += tc
        if (bi.nonEmpty &&
          (tc * 5 > bi.length || (bi.length - d) * 2 > bi.length))
          flag += 1
      }
      src -> ((nBi, nDist, top, flag))
    }
    val got = run("q227_repetition_audit").collect()
    assert(got.length === expect.size)
    got.foreach { r =>
      val (nBi, nDist, top, flag) = expect(r.getString(0))
      assert(r.getLong(2) === nBi, s"bigrams ${r.getString(0)}")
      assert(r.getLong(3) === nDist)
      assert(r.getLong(4) === top)
      assert(r.getLong(5) === flag)
      assert(r.getDouble(6) === (nBi - nDist).toDouble / nBi)
    }
  }

  // --- q228 held-out LM eval ----------------------------------------------

  test("q228: held-out scoring uses train-only counts; OOV rate sane") {
    val split = docs.map { case (id, _, text) =>
      val b = md5u32(s"split|$id") % 100
      (if (b < 80) "train" else if (b < 90) "val" else "test", text)
    }
    val trainBi = split.filter(_._1 == "train").flatMap { case (_, t) =>
      val tk = toks(t); tk.zip(tk.drop(1)).map { case (a, b) => s"$a $b" }
    }
    val cBig = trainBi.groupBy(identity).map { case (k, v) => k -> v.size }
    val cUni = trainBi.map(_.split(" ")(0)).groupBy(identity)
      .map { case (k, v) => k -> v.size }
    val vsz = split.filter(_._1 == "train").flatMap(p => toks(p._2))
      .distinct.size
    val expect = split.filter(_._1 != "train").groupBy(_._1)
      .map { case (sp, g) =>
        var (nB, nOov, units) = (0L, 0L, 0L)
        g.foreach { case (_, t) =>
          val tk = toks(t)
          tk.zip(tk.drop(1)).foreach { case (a, b) =>
            val bg = s"$a $b"
            val cw = cBig.getOrElse(bg, 0)
            if (cw == 0) nOov += 1
            val cu = cUni.getOrElse(a, 0)
            val p = (cw + 1).toDouble / (cu + vsz).toDouble
            units += math.floor(p * 1000000.0 + 0.5).toLong
            nB += 1
          }
        }
        sp -> ((g.size.toLong, nB, nOov, units))
      }
    val got = run("q228_heldout_lm_eval").collect()
    assert(got.map(_.getString(0)).toSet === Set("val", "test"))
    got.foreach { r =>
      val (nd, nB, nOov, units) = expect(r.getString(0))
      assert(r.getLong(1) === nd, s"docs ${r.getString(0)}")
      assert(r.getLong(2) === nB)
      assert(r.getLong(3) === nOov)
      assert(r.getDouble(5) === units.toDouble / nB, "mean units")
      // held-out text must contain SOME unseen bigrams, else the split
      // leaked (or the corpus is degenerate) — and not be all-OOV
      assert(nOov > 0 && nOov < nB)
    }
  }

  // --- q229 priority sampling ---------------------------------------------

  test("q229: estimator matches JVM recompute and lands near the total") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("o_orderkey", "CAST(round(o_totalprice * 100) AS LONG)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val keyed = orders.map { case (k, c) =>
      (k, c, c * 4294967296L / (md5u32(s"prio|$k") + 1))
    }
    val sorted = keyed.sortBy { case (k, _, key) => (-key, k) }
    val tau = sorted(100)._3
    val est = sorted.take(100).map { case (_, c, _) => math.max(c, tau) }.sum
    val r = run("q229_priority_sample").collect().head
    assert(r.getLong(0) === 100L)
    assert(r.getLong(1) === tau, "threshold")
    assert(r.getDouble(2) === est / 100.0, "estimate")
    val ratio = r.getDouble(4)
    assert(ratio > 0.5 && ratio < 2.0,
      s"priority-sampling estimate should land near the total, got $ratio")
  }

  // --- q230 adaptive gate --------------------------------------------------

  test("q230: per-source median gate keeps roughly half of each source") {
    val got = run("q230_adaptive_gate").collect()
    assert(got.length === 20)
    got.foreach { r =>
      val (nDocs, nKept) = (r.getLong(1), r.getLong(2))
      // ≥ half pass by construction of a median threshold with ≥-compare;
      // ties can push it higher, never everything unless degenerate
      assert(nKept * 2 >= nDocs - 1, s"${r.getString(0)} kept $nKept")
      assert(nKept <= nDocs)
      val med = r.getDouble(3)
      assert(med > 0.0 && med <= 1.0)
      val share = r.getDouble(4)
      assert(share > 0.0 && share <= 1.0)
    }
  }

  // --- q231 composed pipeline ---------------------------------------------

  test("q231: ledger is monotone and agrees with q227's repetition screen") {
    val r = run("q231_selection_pipeline").collect().head
    val Seq(nRaw, tokRaw, nClean, tokClean, nGate, tokGate, nSel, tokSel,
      packedToks, nBins) = (0 to 9).map(r.getLong)
    assert(nRaw >= nClean && nClean >= nGate && nGate >= nSel)
    assert(tokRaw >= tokClean && tokClean >= tokGate && tokGate >= tokSel)
    assert(packedToks <= tokSel)
    assert(nSel > 0 && nBins > 0)
    // bins can't fit more than capacity, and can't be fewer than the
    // perfect packing lower bound
    assert(nBins * 256 >= packedToks)
    assert(nBins >= (packedToks + 255) / 256)
    // stage 1 = q227's flags: clean docs = raw − repetitive
    val rep = run("q227_repetition_audit").collect()
      .map(_.getLong(5)).sum
    assert(nClean === nRaw - rep)
  }

  // --- q232 cross-channel --------------------------------------------------

  test("q232: JVM recompute of both channels' exact cents per weekday") {
    import java.time.{Instant, LocalDate, ZoneOffset}
    val store = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("CAST(o_orderdate AS DATE)",
        "CAST(round(o_totalprice * 100) AS LONG)").collect()
      .map(r => (r.getDate(0).toLocalDate.getDayOfWeek.getValue,
        r.getLong(1)))
      .groupBy(_._1).map { case (d, g) => d -> g.map(_._2).sum }
    val web = graft.catalog.Tables.load(spark, sf0001, "events")
      .filter(col("event_type") === "purchase")
      .selectExpr("ts", "CAST(round(value * 100) AS LONG)").collect()
      .map { r =>
        val day = LocalDate.ofInstant(
          Instant.ofEpochSecond(0L, r.getLong(0)), ZoneOffset.UTC)
        (day.getDayOfWeek.getValue, r.getLong(1))
      }
      .groupBy(_._1).map { case (d, g) => d -> g.map(_._2).sum }
    val got = run("q232_cross_channel").collect()
    assert(got.length === 7)
    got.foreach { r =>
      val d = r.getInt(0)
      assert(r.getLong(1) === store(d), s"store dow $d")
      assert(r.getLong(2) === web(d), s"web dow $d")
    }
  }

  // --- q233 funnel timing --------------------------------------------------

  test("q233: step counts match q199 levels; medians are midranks of gaps") {
    val levels = SparkEntry.queries("q199_window_funnel")(spark, sf0001)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val got = run("q233_funnel_timing").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // every user at level ≥ 2 completed view→click; level 3 completed both
    assert(got("view_to_click")._1 ===
      levels.getOrElse(2, 0L) + levels.getOrElse(3, 0L))
    assert(got("click_to_purchase")._1 === levels.getOrElse(3, 0L))
    got.foreach { case (step, (n, med2, sec)) =>
      assert(n > 0, step)
      assert(med2 > 0 && med2 <= 2 * 604800000000L, s"$step within window")
      assert(sec === med2 / 2.0 / 1000000.0)
    }
  }

  test("q231 plan: the tokenized base is cached once and feeds every stage") {
    val df = run("q231_selection_pipeline")
    df.count() // materialize the persist
    val leaves = df.queryExecution.optimizedPlan.collectLeaves()
    val inMem = leaves.count(
      _.getClass.getSimpleName.startsWith("InMemoryRelation"))
    // class check, not string: InMemoryRelation PRINTS its cached plan,
    // so a substring test would see phantom parquet scans (the r4 trap)
    val rawScans = leaves.count(l =>
      !l.getClass.getSimpleName.startsWith("InMemoryRelation") &&
        l.toString.contains("documents.parquet"))
    // every branch (signals, median, weights, scores, packing) must read
    // the cached base — a raw documents scan means a branch escaped the
    // persist and the corpus would be re-read at 100 TB
    assert(inMem >= 2, s"expected cached-base reuse, got $inMem InMemory")
    assert(rawScans === 0, s"found $rawScans uncached documents scans")
  }

  // --- streaming packer parity --------------------------------------------

  test("streaming packer equals the batch fold after batch-split replay") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = docs
      .map { case (id, src, text) =>
        Doc(src, md5u32(s"pack|$id") % 8, id, toks(text).length.toLong)
      }
      .sortBy(_.docId) // delivery in doc_id order per key
    val mem = MemoryStream[Doc]
    val q = Packer.packWithState(mem.toDS())
      .writeStream.format("memory").queryName("packer_out")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, rest) = input.splitAt(input.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b3: _*); q.processAllAvailable()
      assert(s.table("packer_out").count() === input.size)
      // final bins per (source, shard) from the stream = JVM greedy fold
      val streamed = s.table("packer_out")
        .groupBy("source", "shard").agg(max("bin").as("bins"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val expect = input.groupBy(d => (d.source, d.shard))
        .map { case (k, g) =>
          var bins = 1L; var fill = 0L
          g.sortBy(_.docId).foreach { d =>
            val n = math.min(d.n, 256L)
            if (fill + n <= 256L) fill += n else { bins += 1; fill = n }
          }
          k -> bins
        }
      assert(streamed === expect)
      // and the batch query's per-source bin totals agree (q222)
      val batch = run("q222_sequence_packing").collect()
        .map(r => r.getString(0) -> r.getLong(4)).toMap
      val streamedBySrc = streamed.groupBy(_._1._1)
        .map { case (src, m) => src -> m.values.sum }
      assert(streamedBySrc === batch)
    } finally q.stop()
  }

  test("streaming packer dead-letters out-of-order docs without corrupting state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Doc]
    val q = Packer.packWithState(mem.toDS(), cap = 10L)
      .writeStream.format("memory").queryName("packer_dlq")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(Doc("a", 0L, 1L, 4L), Doc("a", 0L, 2L, 4L))
      q.processAllAvailable()
      // doc 2 replayed out of order, then doc 3 in order
      mem.addData(Doc("a", 0L, 2L, 4L), Doc("a", 0L, 3L, 4L))
      q.processAllAvailable()
      val rows = s.table("packer_dlq")
        .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
        .sortBy(t => (t._1, -t._2)).toList
      // the replayed doc 2 lands in the DLQ (bin -1, fill = colliding id);
      // doc 3 packs exactly as if the replay never happened (4+4+4 > 10 →
      // bin 2), i.e. the violation did not advance or corrupt state
      assert(rows === List((1L, 1L, 4L), (2L, 1L, 8L), (2L, -1L, 2L),
        (3L, 2L, 4L)),
        s"got $rows")
    } finally q.stop()
  }

  test("q268: water-fill schedule equals the JVM greedy; epoch order valid") {
    val got = run("q268_mix_waterfill").collect().map(r =>
      (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    // JVM greedy from the per-source stats the query itself reports
    val bySource = got.groupBy(_._1).map { case (src, v) =>
      src -> (v.head._3, v.head._4)
    }
    // every selected (source, epoch e>1) implies (source, e-1) selected:
    // the 2x decay makes the greedy prefix a valid epoch schedule
    val sel = got.map(r => (r._1, r._2)).toSet
    sel.foreach { case (src, e) =>
      if (e > 1) assert(sel.contains((src, e - 1)), s"$src epoch ${e - 1}")
    }
    // marginal values recompute exactly and the prefix respects the budget
    got.foreach { case (src, e, tokens, q, mv, cum, budget) =>
      assert(tokens === bySource(src)._1 && q === bySource(src)._2)
      assert(mv === q / (1L << (e - 1)))
      assert(cum <= budget)
    }
    // the cut actually bites: not every (source, epoch) candidate fits
    assert(got.length < bySource.size * 4)
    // cumulative tokens are the running sum in (mv desc, source, epoch) order
    val ordered = got.sortBy(r => (-r._5, r._1, r._2))
    assert(ordered === got)
    var acc = 0L
    ordered.foreach { r => acc += r._3; assert(r._6 === acc) }
  }

  test("q280: Neyman seats equal the JVM largest-remainder replay") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(salt: String, id: Long): Long = {
      val hex = md.digest(s"$salt|$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(8)
      java.lang.Long.parseLong(hex, 16)
    }
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val strata = docs.groupBy(_._1).toSeq.map { case (src, v) =>
      val n = v.length.toLong
      val sy = v.map(_._3).sum; val syy = v.map(d => d._3 * d._3).sum
      val sigma = math.sqrt((n * syy - sy * sy).toDouble / (n * n).toDouble)
      (src, n, sigma, math.floor(n.toDouble * sigma * 1e6).toLong)
    }.sortBy(_._1)
    val wsum = strata.map(_._4).sum
    val seats = strata.map { case (src, n, sg, w) =>
      (src, n, sg, w, 100L * w / wsum, (100L * w) % wsum)
    }
    val r = 100L - seats.map(_._5).sum
    val ranked = seats.sortBy(sRow => (-sRow._6, sRow._1)).zipWithIndex
    val alloc = ranked.map { case ((src, n, sg, w, b, _), i) =>
      val raw = b + (if (i < r) 1L else 0L)
      (src, n, sg, w, math.min(raw, n), if (raw > n) 1 else 0)
    }.sortBy(_._1)
    val byStratum = docs.groupBy(_._1)
    val got = run("q280_neyman_allocation").collect().map(rr =>
      (rr.getString(0), rr.getLong(1), rr.getDouble(2), rr.getLong(3),
        rr.getLong(4), rr.getInt(5), rr.getLong(6),
        Option(rr.getString(7)))).toSeq
    assert(got.map(x => (x._1, x._2, x._3, x._4, x._5, x._6)) ===
      alloc.map(a => (a._1, a._2, a._3, a._4, a._5, a._6)))
    // seats conserve exactly when nothing capped; each stratum's chosen
    // SET replays from the salted-md5 rank
    if (got.forall(_._6 == 0)) assert(got.map(_._5).sum === 100L)
    got.foreach { case (src, _, _, _, a, _, nSel, fp) =>
      assert(nSel === a)
      if (a > 0) {
        val ids = byStratum(src).map(d => (h32("neyman", d._2), d._2))
          .sortBy(identity).take(a.toInt).map(_._2).sorted
        val expFp = {
          val bytes = md.digest(ids.mkString(",").getBytes("UTF-8"))
          bytes.map(b => f"$b%02x").mkString
        }
        assert(fp === Some(expFp), src)
      } else assert(fp.isEmpty)
    }
  }
}
