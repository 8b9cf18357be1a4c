package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3

/** The CosineJoinBlocking optimizer rule: a naive `graft_dot(a, b) >=
  * tau` (or cosine-quotient) theta join must — ONLY under the explicit
  * `spark.graft.srpjoin.segments` opt-in — plan through SRP signature
  * blocking with EXACTLY the documented contract semantics: the
  * deterministic pair set { original condition ∧ sig-hamming ≤ m−1 },
  * verified against an INDEPENDENT reimplementation of the md5
  * hyperplane signatures. Default-off exactness, spelling coverage,
  * join types, recall on planted twins, and stand-downs are pinned.
  */
class SrpJoinRuleSpec extends SparkSpecBase {

  private val segConf = "spark.graft.srpjoin.segments"
  private val bitsConf = "spark.graft.srpjoin.bits"

  private def withSrp[T](m: Int, bits: Int)(body: => T): T = {
    spark.conf.set(segConf, m.toString)
    spark.conf.set(bitsConf, bits.toString)
    try body finally {
      spark.conf.unset(segConf)
      spark.conf.unset(bitsConf)
    }
  }

  // -- independent reference implementation (md5 convention re-derived) ----

  private def refSig(v: Array[Double], bits: Int,
      seed: String = "graft"): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    var sig = 0L
    for (p <- 0 until bits) {
      var acc = 0.0
      for (d <- v.indices) {
        val hex = md.digest(s"srpj|$seed|$p|$d".getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString.take(8)
        acc += v(d) * (if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0
          else -1.0)
      }
      if (acc >= 0.0) sig |= 1L << p
    }
    sig
  }

  private def refDot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    for (i <- a.indices) s += a(i) * b(i)
    s
  }

  // -- fixture: unit-ish vectors + planted high-cosine twins ---------------

  private val dims = 8

  private def vecs: Seq[(Long, Array[Double])] = {
    val bases = (0 until 40).map { i =>
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

  private val tau = 0.9

  /** The CONTRACT pair set at (m, bits): original ∧ hamming ≤ m−1. */
  private def contractPairs(m: Int, bits: Int): Seq[(Long, Long)] = (for {
    x <- vecs; y <- vecs
    if x._1 < y._1 && refDot(x._2, y._2) >= tau &&
      java.lang.Long.bitCount(
        refSig(x._2, bits) ^ refSig(y._2, bits)) <= m - 1
  } yield (x._1, y._1)).sorted

  private def exactPairs: Seq[(Long, Long)] = (for {
    x <- vecs; y <- vecs
    if x._1 < y._1 && refDot(x._2, y._2) >= tau
  } yield (x._1, y._1)).sorted

  private def frames: (DataFrame, DataFrame) = {
    val s = spark
    import s.implicits._
    val df = vecs.map { case (id, v) => (id, v.toSeq) }.toDF("id", "v")
    (df.select(col("id").as("a"), col("v").as("va")),
      df.select(col("id").as("b"), col("v").as("vb")))
  }

  private def dotCond = {
    import graft.functions.Vectors
    Vectors.dot(col("va"), col("vb")) >= tau
  }

  private def run(df: DataFrame): Seq[(Long, Long)] =
    df.select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("default off: plan untouched, results exact") {
    val (a, b) = frames
    val joined = a.join(b, dotCond && col("a") < col("b"))
    val plan = joined.queryExecution.optimizedPlan.toString
    assert(!plan.contains("graft_csig"), plan.take(2000))
    assert(run(joined) === exactPairs)
    assert(exactPairs.nonEmpty)
  }

  test("opt-in: signature bound planned through the hamming machinery, contract bag exact") {
    val (a, b) = frames
    for ((m, bits) <- Seq((3, 24), (2, 16), (8, 63))) {
      val expected = contractPairs(m, bits)
      withSrp(m, bits) {
        val joined = a.join(b, dotCond && col("a") < col("b"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("graft_csig") && plan.contains("graft_seg"),
          s"m=$m bits=$bits must fire + delegate:\n${plan.take(3000)}")
        assert(!plan.contains("BroadcastNestedLoopJoin") &&
          !plan.contains("CartesianProduct"), plan.take(3000))
        assert(run(joined) === expected, s"m=$m bits=$bits")
        assert(expected.nonEmpty, s"m=$m bits=$bits fixture too sparse")
      }
    }
  }

  test("norm band (maxNorm conf): raw-dot contract output unchanged, band planned") {
    import graft.functions.Vectors
    val (a, b) = frames
    val nrmConf = "spark.graft.srpjoin.maxNorm"
    withSrp(3, 24) {
      val noBand = run(a.join(b, dotCond && col("a") < col("b")))
      // M above every corpus norm ⇒ the band is IMPLIED by dot ≥ τ:
      // the contract OUTPUT must be identical — the band only prunes
      // candidates (vectors here are unit-ish; 10 covers any norm)
      spark.conf.set(nrmConf, "10.0")
      try {
        val joined = a.join(b, dotCond && col("a") < col("b"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("graft_cnrm"),
          s"norm band must be planned:\n${plan.take(3000)}")
        assert(run(joined) === noBand,
          "band with a true max-norm bound must not change the contract")
        // cosine-quotient spelling: norms cancel — NO band implied
        val q = a.join(b,
          Vectors.dot(col("va"), col("vb")) /
            (sqrt(Vectors.dot(col("va"), col("va"))) *
              sqrt(Vectors.dot(col("vb"), col("vb")))) >= lit(0.9) &&
            col("a") < col("b"))
        assert(!q.queryExecution.optimizedPlan.toString
          .contains("graft_cnrm"),
          "quotient spelling must not grow a norm band")
        assert(q.queryExecution.optimizedPlan.toString
          .contains("graft_csig"))
      } finally spark.conf.unset(nrmConf)
      // conf unset ⇒ no band column anywhere
      val plain = a.join(b, dotCond && col("a") < col("b"))
      assert(!plain.queryExecution.optimizedPlan.toString
        .contains("graft_cnrm"))
    }
  }

  test("recall contract on planted twins: pinned numerically at the default seed") {
    // every 5th base has a cos≈0.9987 twin — the pairs the operator
    // exists to find. At (m=3, bits=24) the reference model predicts
    // which twins survive the hamming ball; the pin asserts the
    // EXACT surviving set (deterministic seed ⇒ deterministic recall)
    // and that recall is high enough to be useful (the opt-in's
    // purpose) while demonstrating it needn't be 1.
    val twins = vecs.collect {
      case (id, _) if id >= 1000L => (id - 1000L, id)
    }.sorted
    val kept = contractPairs(3, 24).filter {
      case (x, y) => y == x + 1000L
    }
    assert(twins.nonEmpty)
    val recall = kept.size.toDouble / twins.size
    assert(recall >= 0.75, s"recall $recall collapsed — contract broken")
    withSrp(3, 24) {
      val (a, b) = frames
      val joined = a.join(b, dotCond && col("a") < col("b"))
      val got = run(joined).filter { case (x, y) => y == x + 1000L }
      assert(got === kept, s"recall set must be the deterministic model's")
    }
  }

  test("cosine-quotient and HOF sum-product spellings fire") {
    import graft.functions.Vectors
    val (a, b) = frames
    val expected = contractPairs(3, 24)
    val cosCond = Vectors.dot(col("va"), col("vb")) /
      (sqrt(Vectors.dot(col("va"), col("va"))) *
        sqrt(Vectors.dot(col("vb"), col("vb")))) >= tau
    val hofCond = Vectors.dotHof(col("va"), col("vb")) >= tau
    // unit-normalized fixture: cosine ≡ dot up to rounding; assert the
    // plan fires and the bag matches the quotient's own reference
    val cosExpected = (for {
      x <- vecs; y <- vecs
      if x._1 < y._1 &&
        refDot(x._2, y._2) / (math.sqrt(refDot(x._2, x._2)) *
          math.sqrt(refDot(y._2, y._2))) >= tau &&
        java.lang.Long.bitCount(
          refSig(x._2, 24) ^ refSig(y._2, 24)) <= 2
    } yield (x._1, y._1)).sorted
    // the DISTANCE spelling `1 − cos ≤ δ` — what near-dup pipelines
    // actually write. The reference replays the IDENTICAL IEEE ops
    // (1−cos ≤ 1−τ is not bit-equivalent to cos ≥ τ at the boundary)
    val delta = 1.0 - tau
    val distCond = (lit(1.0) - Vectors.dot(col("va"), col("vb")) /
      (sqrt(Vectors.dot(col("va"), col("va"))) *
        sqrt(Vectors.dot(col("vb"), col("vb"))))) <= delta
    val distExpected = (for {
      x <- vecs; y <- vecs
      if x._1 < y._1 &&
        1.0 - refDot(x._2, y._2) / (math.sqrt(refDot(x._2, x._2)) *
          math.sqrt(refDot(y._2, y._2))) <= delta &&
        java.lang.Long.bitCount(
          refSig(x._2, 24) ^ refSig(y._2, 24)) <= 2
    } yield (x._1, y._1)).sorted
    withSrp(3, 24) {
      for ((cond, exp) <- Seq((cosCond, cosExpected),
        (hofCond, expected), (distCond, distExpected))) {
        val joined = a.join(b, cond && col("a") < col("b"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("graft_csig"),
          s"spelling must fire:\n${plan.take(2000)}")
        assert(run(joined) === exp)
      }
    }
  }

  test("left semi and anti collapse to left grain under the contract") {
    val (a, b) = frames
    val expected = contractPairs(3, 24)
    withSrp(3, 24) {
      val semi = a.join(b, dotCond && col("a") < col("b"), "left_semi")
      val gotS = semi.select("a").collect().map(_.getLong(0)).toSeq.sorted
      assert(gotS === expected.map(_._1).distinct.sorted)
      val anti = a.join(b, dotCond && col("a") < col("b"), "left_anti")
      val gotA = anti.select("a").collect().map(_.getLong(0)).toSeq.sorted
      val all = vecs.map(_._1).sorted
      assert(gotA === all.diff(expected.map(_._1).distinct))
    }
  }

  test("stand-downs: non-literal tau, tau <= 0, bad conf; equi joins keep the contract") {
    import graft.functions.Vectors
    val (a, b) = frames
    withSrp(3, 24) {
      // non-literal bound
      val j1 = a.join(b,
        Vectors.dot(col("va"), col("vb")) >= col("a") * 0.001)
      assert(!j1.queryExecution.optimizedPlan.toString
        .contains("graft_csig"))
      // tau <= 0: angular blocking has no selectivity contract
      val j2 = a.join(b, Vectors.dot(col("va"), col("vb")) >= -0.5 &&
        col("a") < col("b"))
      assert(!j2.queryExecution.optimizedPlan.toString
        .contains("graft_csig"))
      // user equi key + broadcastable side: the CONTRACT still
      // applies (semantics are a pure function of query + conf, never
      // of size stats) — the sig gate fires, while the hamming rule's
      // own stand-down keeps the hash-join plan shape (no segments)
      val j3 = a.join(b, col("a") === col("b") && dotCond)
      val p3 = j3.queryExecution.optimizedPlan.toString
      assert(p3.contains("graft_csig") && !p3.contains("graft_seg"), p3.take(2000))
      // self-pairs: dot(v, v) = 1 ≥ τ and hamming(sig, sig) = 0 — the
      // contract keeps all of them, equi key or not
      assert(j3.count() === vecs.size.toLong)
    }
    // segments = 1 (no ball) and garbage conf: off
    spark.conf.set(segConf, "1")
    try {
      val j4 = a.join(b, dotCond && col("a") < col("b"))
      assert(!j4.queryExecution.optimizedPlan.toString
        .contains("graft_csig"))
    } finally spark.conf.unset(segConf)
    spark.conf.set(segConf, "oops")
    try {
      val j5 = a.join(b, dotCond && col("a") < col("b"))
      assert(!j5.queryExecution.optimizedPlan.toString
        .contains("graft_csig"))
      assert(run(j5) === exactPairs)
    } finally spark.conf.unset(segConf)
  }

  test("native SrpSignature matches the independent reference bit-for-bit") {
    // compute() is the single kernel both eval and codegen call; the
    // codegen path itself is exercised end-to-end by the rule tests
    import org.apache.spark.sql.catalyst.util.ArrayData
    for ((id, v) <- vecs; bits <- Seq(16, 24, 63))
      assert(graft.functions.SrpSignature.compute(
        ArrayData.toArrayData(v), bits, "graft") === refSig(v, bits),
        s"vec $id bits $bits")
  }
}
