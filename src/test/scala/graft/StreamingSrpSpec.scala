package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.SrpStream
import graft.streaming.SrpStream.SegRow
import scala.util.hashing.MurmurHash3

/** Batch parity for the streaming SRP segment-bucket near-dup miner:
  * over ANY micro-batch split (redelivery included), the emitted pair
  * set must equal the batch CosineJoinBlocking contract set
  * {cos ≥ τ ∧ sig-hamming ≤ m−1} on the same corpus — computed here by
  * an independent reference — with each pair emitted EXACTLY ONCE
  * (the canonical-first-shared-segment check replaces a dedup pass).
  */
class StreamingSrpSpec extends SparkSpecBase {

  private val dims = 8
  private val tau = 0.9
  private val m = 3
  private val bits = 24

  private def vecs: Seq[(Long, Array[Double])] = {
    val bases = (0 until 60).map { i =>
      val raw = Array.tabulate(dims) { d =>
        (math.abs(MurmurHash3.productHash((i, d))) % 1000) / 1000.0 - 0.5
      }
      val n = math.sqrt(raw.map(x => x * x).sum)
      (i.toLong, raw.map(_ / n))
    }
    val twins = bases.collect { case (id, v) if id % 5 == 0 =>
      val w = v.clone(); w(0) += 0.05
      val n = math.sqrt(w.map(x => x * x).sum)
      (id + 1000L, w.map(_ / n))
    }
    bases ++ twins
  }

  private def refDot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    for (i <- a.indices) s += a(i) * b(i)
    s
  }

  /** The contract set — sig via the ENGINE kernel (its parity with the
    * independent md5 reference is pinned in SrpJoinRuleSpec). */
  private def contract: Seq[(Long, Long)] = {
    def sig(v: Array[Double]) =
      graft.functions.SrpSignature.compute(v, bits, "graft")
    (for {
      x <- vecs; y <- vecs
      if x._1 < y._1 && refDot(x._2, y._2) >= tau &&
        java.lang.Long.bitCount(sig(x._2) ^ sig(y._2)) <= m - 1
    } yield (x._1, y._1)).sorted
  }

  test("streaming segment-bucket pairs equal the batch contract, exactly once") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows: Seq[SegRow] = vecs.flatMap { case (id, v) =>
      SrpStream.segRows(id, v.toSeq, m, bits, "graft")
    }
    val mem = MemoryStream[SegRow]
    val q = SrpStream.pairsWithState(mem.toDS(), tau, m, bits)
      .writeStream.format("memory").queryName("srp_pairs")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, rest) = rows.splitAt(rows.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      // at-least-once: redeliver part of batch 2 with batch 3 — seen
      // (segment, vec) rows must be ignored, never re-paired
      mem.addData((b2.take(b2.size / 4) ++ b3): _*); q.processAllAvailable()
      val streamed = s.table("srp_pairs")
        .select("vecId", "vecId2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val expected = contract
      assert(expected.nonEmpty, "fixture must plant recallable twins")
      assert(streamed.sorted === expected,
        "emitted pair multiset must equal the contract set EXACTLY " +
          "once each (canonical segment — no dedup pass)")
      // cosine values bit-match the sequential-fold reference
      val cosMap = s.table("srp_pairs").collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      val byId = vecs.toMap
      for (((a, b), c) <- cosMap) {
        val va = byId(a); val vb = byId(b)
        val ref = refDot(va, vb) /
          (math.sqrt(refDot(va, va)) * math.sqrt(refDot(vb, vb)))
        assert(c === ref, s"pair ($a,$b)")
      }
    } finally q.stop()
  }

  test("single-batch and per-row splits agree (boundary independence)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows: Seq[SegRow] = vecs.flatMap { case (id, v) =>
      SrpStream.segRows(id, v.toSeq, m, bits, "graft")
    }
    val mem = MemoryStream[SegRow]
    val q = SrpStream.pairsWithState(mem.toDS(), tau, m, bits)
      .writeStream.format("memory").queryName("srp_pairs_one")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(rows: _*); q.processAllAvailable()
      val oneShot = s.table("srp_pairs_one")
        .select("vecId", "vecId2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(oneShot === contract)
    } finally q.stop()
  }
}
