package graft

import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3

/** The blocking join rules COMPOSE on one join: a condition carrying
  * BOTH a hamming bound and a band bound (the "similar signature AND
  * close in time" near-dup shape) must be rewritten by both rules in
  * the same fixed-point batch — HammingJoinBlocking fires first and
  * keeps the original condition verbatim, so BandJoinBlocking sees the
  * band conjuncts on the rewritten join and appends its bucket key —
  * with the exact naive bag. Likewise edit-distance + band. Each rule
  * guards recursion only on its OWN generated column names, which is
  * precisely what makes the composition possible.
  */
class RuleCompositionSpec extends SparkSpecBase {

  private def rows: Seq[(Long, Int, Long)] =
    (0 until 300).map { i =>
      (i.toLong,
        MurmurHash3.stringHash(i.toString) & 0xffff, // 16-bit signature
        (i.toLong * 7919L) % 50000L) // scrambled event time
    }

  private def noBroadcast[T](body: => T): T = {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("hamming × band: both rules fire on one join, exact bag") {
    val s = spark
    import s.implicits._
    val df = rows.toDF("id", "sig", "ts")
    val a = df.select(col("id").as("a"), col("sig").as("sa"),
      col("ts").as("ta"))
    val b = df.select(col("id").as("b"), col("sig").as("sb"),
      col("ts").as("tb"))
    noBroadcast {
      val joined = a.join(b,
        bit_count(col("sa").bitwiseXOR(col("sb"))) <= 2 &&
          col("tb") <= col("ta") && col("tb") >= col("ta") - 1000L &&
          col("a") =!= col("b"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("graft_seg") && plan.contains("graft_band"),
        s"both rules must fire:\n${plan.take(4000)}")
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan.take(4000))
      val got = joined.select("a", "b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val expected = (for {
        x <- rows; y <- rows
        if x._1 != y._1 && Integer.bitCount(x._2 ^ y._2) <= 2 &&
          y._3 <= x._3 && y._3 >= x._3 - 1000L
      } yield (x._1, y._1)).sorted
      assert(expected.nonEmpty, "fixture must exercise the composition")
      assert(got === expected)
    }
  }

  test("edit distance × band: fuzzy string + time window compose") {
    val s = spark
    import s.implicits._
    val alpha = "abcd"
    val strs = rows.map { case (id, sig, ts) =>
      val n = 6 + (sig % 4)
      (id, (0 until n).map(p => alpha(
        math.abs(MurmurHash3.productHash((id / 4, p))) % alpha.length))
        .mkString, ts)
    }
    val df = strs.toDF("id", "str", "ts")
    val a = df.select(col("id").as("a"), col("str").as("sa"),
      col("ts").as("ta"))
    val b = df.select(col("id").as("b"), col("str").as("sb"),
      col("ts").as("tb"))
    noBroadcast {
      val joined = a.join(b,
        levenshtein(col("sa"), col("sb")) <= 1 &&
          abs(col("ta") - col("tb")) <= 5000L && col("a") < col("b"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("graft_edp") && plan.contains("graft_band"),
        s"both rules must fire:\n${plan.take(4000)}")
      def lev(x: String, y: String): Int = {
        val dp = Array.tabulate(y.length + 1)(identity)
        for (i <- 1 to x.length) {
          var prev = dp(0); dp(0) = i
          for (j <- 1 to y.length) {
            val cur = dp(j)
            dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
              prev + (if (x(i - 1) == y(j - 1)) 0 else 1))
            prev = cur
          }
        }
        dp(y.length)
      }
      val got = joined.select("a", "b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val expected = (for {
        x <- strs; y <- strs
        if x._1 < y._1 && lev(x._2, y._2) <= 1 &&
          math.abs(x._3 - y._3) <= 5000L
      } yield (x._1, y._1)).sorted
      assert(expected.nonEmpty, "fixture must exercise the composition")
      assert(got === expected)
    }
  }

  test("cosine → hamming × band: a rule-MANUFACTURED bound composes (three rules, one join)") {
    // CosineJoinBlocking injects the sig hamming conjunct; the hamming
    // rule plans segments from it and the band rule buckets the id
    // window — all on one join, pinned by all three generated names.
    // Expected = the deterministic contract set (cos ≥ τ ∧ 24-bit sig
    // hamming ≤ 2 ∧ band), sig via the independent md5 reference.
    val s = spark
    import s.implicits._
    def refSig(v: Array[Double]): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      var sig = 0L
      for (p <- 0 until 24) {
        var acc = 0.0
        for (d <- v.indices) {
          val hex = md.digest(s"srpj|graft|$p|$d".getBytes("UTF-8"))
            .map(b => f"$b%02x").mkString.take(8)
          acc += v(d) * (if (java.lang.Long.parseLong(hex, 16) % 2 == 0)
            1.0 else -1.0)
        }
        if (acc >= 0.0) sig |= 1L << p
      }
      sig
    }
    val dims = 8
    val base = (0 until 40).map { i =>
      val raw = Array.tabulate(dims) { d =>
        (math.abs(MurmurHash3.productHash((i, d))) % 1000) / 1000.0 - 0.5
      }
      val n = math.sqrt(raw.map(x => x * x).sum)
      (i.toLong, raw.map(_ / n))
    }
    val twins = base.collect { case (id, v) if id % 5 == 0 =>
      val w = v.clone(); w(0) += 0.05
      val n = math.sqrt(w.map(x => x * x).sum)
      (id + 1000L, w.map(_ / n))
    }
    val all = base ++ twins
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s0 = 0.0; for (i <- a.indices) s0 += a(i) * b(i); s0
    }
    val expected = (for {
      x <- all; y <- all
      if y._1 >= x._1 + 900L && y._1 <= x._1 + 1100L &&
        dot(x._2, y._2) >= 0.9 &&
        java.lang.Long.bitCount(refSig(x._2) ^ refSig(y._2)) <= 2
    } yield (x._1, y._1)).sorted
    assert(expected.nonEmpty)
    val df = all.map { case (id, v) => (id, v.toSeq) }.toDF("id", "v")
    val a = df.select(col("id").as("a"), col("v").as("va"))
    val b = df.select(col("id").as("b"), col("v").as("vb"))
    spark.conf.set("spark.graft.srpjoin.segments", "3")
    spark.conf.set("spark.graft.srpjoin.bits", "24")
    try noBroadcast {
      val joined = a.join(b,
        graft.functions.Vectors.dot(col("va"), col("vb")) >= 0.9 &&
          col("b") >= col("a") + 900L && col("b") <= col("a") + 1100L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("graft_csig") && plan.contains("graft_seg") &&
        plan.contains("graft_band"),
        s"all three rules must fire:\n${plan.take(4000)}")
      val got = joined.select("a", "b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(got === expected)
    } finally {
      spark.conf.unset("spark.graft.srpjoin.segments")
      spark.conf.unset("spark.graft.srpjoin.bits")
    }
  }
}
