package graft

import org.apache.spark.sql.functions._

/** The HammingJoinBlocking optimizer rule: a naive
  * `bit_count(xor) <= k` theta join must plan as a pigeonhole-segment
  * equi-join with EXACTLY the naive join's bag of rows — including
  * duplicate-input multiplicity (the canonical-first-match residual
  * replaces any dedup pass) — and must NOT fire when the join already
  * has an equi key.
  */
class HammingRuleSpec extends SparkSpecBase {

  private def sigs: Seq[(Long, Int)] =
    (0 until 200).map { i =>
      (i.toLong, scala.util.hashing.MurmurHash3.stringHash(i.toString)
        & 0xffff)
    }

  private def frames = {
    val s = spark
    import s.implicits._
    val df = sigs.toDF("id", "sig")
    (df.select(col("id").as("a"), col("sig").as("sa")),
      df.select(col("id").as("b"), col("sig").as("sb")))
  }

  test("naive hamming theta join plans as segment equi-join, identical bag") {
    val (a, b) = frames
    val joined = a.join(b,
      bit_count(col("sa").bitwiseXOR(col("sb"))) <= 2 && col("a") < col("b"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"rule must remove the nested loop:\n${plan.take(3000)}")
    assert(plan.contains("graft_seg"), plan.take(3000))
    val got = joined.select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val expected = (for {
      x <- sigs; y <- sigs
      if x._1 < y._1 && Integer.bitCount(x._2 ^ y._2) <= 2
    } yield (x._1, y._1)).sorted
    assert(expected.nonEmpty, "fixture must exercise the hamming ball")
    assert(got === expected)
  }

  test("comparison spellings: < k and reversed k >= forms also rewrite") {
    val (a, b) = frames
    val expected = (for {
      x <- sigs; y <- sigs
      if x._1 < y._1 && Integer.bitCount(x._2 ^ y._2) <= 2
    } yield (x._1, y._1)).sorted
    val spellings = Seq(
      bit_count(col("sa").bitwiseXOR(col("sb"))) < 3, // ≡ ≤ 2
      lit(2) >= bit_count(col("sa").bitwiseXOR(col("sb"))),
      lit(3) > bit_count(col("sa").bitwiseXOR(col("sb"))))
    for (cond <- spellings) {
      val joined = a.join(b, cond && col("a") < col("b"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("graft_seg") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"spelling must rewrite:\n${plan.take(2000)}")
      val got = joined.select("a", "b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(got === expected)
    }
  }

  test("bag semantics: duplicated input rows multiply, pairs never dedup") {
    val (a, b) = frames
    val naiveCount = (for {
      x <- sigs; y <- sigs
      if x._1 < y._1 && Integer.bitCount(x._2 ^ y._2) <= 2
    } yield ()).size
    val j2 = a.union(a).join(b,
      bit_count(col("sa").bitwiseXOR(col("sb"))) <= 2 && col("a") < col("b"))
    assert(j2.count() === 2L * naiveCount)
  }

  test("64-bit signatures: long hamming join rewrites with long segments") {
    val s = spark
    import s.implicits._
    val longs = (0 until 150).map { i =>
      (i.toLong, scala.util.hashing.MurmurHash3.stringHash(i.toString).toLong
        * 2654435761L) // spread over the full 64-bit range
    }
    val df = longs.toDF("id", "sig")
    val a = df.select(col("id").as("a"), col("sig").as("sa"))
    val b = df.select(col("id").as("b"), col("sig").as("sb"))
    val joined = a.join(b,
      bit_count(col("sa").bitwiseXOR(col("sb"))) <= 3 && col("a") < col("b"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("graft_seg") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    val got = joined.select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val expected = (for {
      x <- longs; y <- longs
      if x._1 < y._1 && java.lang.Long.bitCount(x._2 ^ y._2) <= 3
    } yield (x._1, y._1)).sorted
    assert(got === expected)
  }

  test("stand-down: equi key + broadcastable side leaves the join alone") {
    val (a, b) = frames
    val joined = a.join(b,
      col("a") === col("b") &&
        bit_count(col("sa").bitwiseXOR(col("sb"))) <= 2)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("graft_seg"), plan.take(3000))
    // a == b forces identical sigs → hamming 0 → every id pairs itself
    assert(joined.count() === sigs.length.toLong)
  }

  test("stand-down also recognizes the null-safe <=> equi key") {
    val (a, b) = frames
    val joined = a.join(b,
      col("a") <=> col("b") &&
        bit_count(col("sa").bitwiseXOR(col("sb"))) <= 2)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("graft_seg"), plan.take(3000))
    assert(joined.count() === sigs.length.toLong)
  }

  test("composition: lang-blocked hamming join plans (lang, graft_seg) keys") {
    val s = spark
    import s.implicits._
    // force the composition path: with no broadcastable side, equi keys
    // alone would leave a per-language SortMergeJoin feeding a nested
    // residual scan — the rule must append the segment key instead
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val langOf = (i: Long) => if (i % 3 == 0) "en" else "de"
      val df = sigs.map { case (id, sg) => (id, sg, langOf(id)) }
        .toDF("id", "sig", "lang")
      val a = df.select(col("id").as("a"), col("sig").as("sa"),
        col("lang").as("la"))
      val b = df.select(col("id").as("b"), col("sig").as("sb"),
        col("lang").as("lb"))
      val joined = a.join(b,
        col("la") === col("lb") &&
          bit_count(col("sa").bitwiseXOR(col("sb"))) <= 2 &&
          col("a") < col("b"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("graft_seg"),
        s"rule must compose, not stand down:\n${plan.take(3000)}")
      // the hash/SMJ keys must carry BOTH the user key and the segment
      val joinLine = plan.linesIterator.find(l =>
        l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
          l.contains("BroadcastHashJoin")).getOrElse("")
      assert(joinLine.contains("la") && joinLine.contains("graft_seg"),
        s"join keys must include lang AND segment:\n$joinLine")
      val got = joined.select("a", "b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val expected = (for {
        x <- sigs; y <- sigs
        if x._1 < y._1 && langOf(x._1) == langOf(y._1) &&
          Integer.bitCount(x._2 ^ y._2) <= 2
      } yield (x._1, y._1)).sorted
      assert(expected.nonEmpty, "fixture must exercise the blocked ball")
      assert(got === expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  // 16 signature bits spread across two 64-bit words (8 low bits each) —
  // the same hamming ball as `sigs`, carried in the 128-bit spellings.
  private def sigs128: Seq[(Long, Long, Long)] =
    sigs.map { case (id, sg) =>
      (id, (sg & 0xff).toLong, ((sg >> 8) & 0xff).toLong)
    }

  private def expected128: Seq[(Long, Long)] = (for {
    x <- sigs128; y <- sigs128
    if x._1 < y._1 &&
      java.lang.Long.bitCount(x._2 ^ y._2) +
        java.lang.Long.bitCount(x._3 ^ y._3) <= 2
  } yield (x._1, y._1)).sorted

  test("multi-word signatures: summed bit_count join rewrites exactly") {
    val s = spark
    import s.implicits._
    val df = sigs128.toDF("id", "w0", "w1")
    val a = df.select(col("id").as("a"), col("w0").as("a0"),
      col("w1").as("a1"))
    val b = df.select(col("id").as("b"), col("w0").as("b0"),
      col("w1").as("b1"))
    val joined = a.join(b,
      (bit_count(col("a0").bitwiseXOR(col("b0"))) +
        bit_count(col("a1").bitwiseXOR(col("b1")))) <= 2 &&
        col("a") < col("b"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("graft_seg") &&
      !plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"multi-word spelling must rewrite:\n${plan.take(3000)}")
    val got = joined.select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(expected128.nonEmpty, "fixture must exercise the hamming ball")
    assert(got === expected128)
  }

  test("array-of-longs signatures: HOF hamming sum rewrites exactly") {
    val s = spark
    import s.implicits._
    val df = sigs128.toDF("id", "w0", "w1")
      .select(col("id"), array(col("w0"), col("w1")).as("sig"))
    val a = df.select(col("id").as("a"), col("sig").as("va"))
    val b = df.select(col("id").as("b"), col("sig").as("vb"))
    val ham = aggregate(
      zip_with(col("va"), col("vb"), (x, y) => bit_count(x.bitwiseXOR(y))),
      lit(0), (acc, v) => acc + v)
    val joined = a.join(b, ham <= 2 && col("a") < col("b"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("graft_seg") &&
      !plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"array spelling must rewrite:\n${plan.take(3000)}")
    val got = joined.select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got === expected128)
  }

  // the round-8 decontamination shapes: semi = "near SOME eval doc",
  // anti = "near NO eval doc" — per-left-row semantics, collapsed back
  // to left grain by the rid aggregate (RewriteSupport doctrine)
  private def evalIds: Set[Long] = sigs.map(_._1).filter(_ % 7 == 0).toSet

  private def semiExpected: Seq[Long] = sigs.collect {
    case (id, sg) if sigs.exists { case (eid, eg) =>
      evalIds(eid) && Integer.bitCount(sg ^ eg) <= 2 } => id
  }.sorted

  test("left-semi hamming join rewrites: exact matched-left set") {
    val (a, b) = frames
    val eval = b.filter(col("b") % 7 === 0)
    val joined = a.join(eval,
      bit_count(col("sa").bitwiseXOR(col("sb"))) <= 2, "left_semi")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("graft_seg") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"semi must rewrite:\n${plan.take(3000)}")
    val got = joined.select("a").collect().map(_.getLong(0)).toSeq.sorted
    assert(semiExpected.nonEmpty && semiExpected.size < sigs.size,
      "fixture must split the corpus")
    assert(got === semiExpected)
  }

  test("left-anti hamming join rewrites: exact decontaminated complement") {
    val (a, b) = frames
    val eval = b.filter(col("b") % 7 === 0)
    val joined = a.join(eval,
      bit_count(col("sa").bitwiseXOR(col("sb"))) <= 2, "left_anti")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("graft_seg") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"anti must rewrite:\n${plan.take(3000)}")
    val got = joined.select("a").collect().map(_.getLong(0)).toSeq.sorted
    val expected = sigs.map(_._1).filterNot(semiExpected.toSet).sorted
    assert(expected.nonEmpty && got === expected)
  }

  test("left-outer hamming join: matched bag + one null per unmatched") {
    val (a, b) = frames
    val eval = b.filter(col("b") % 7 === 0)
    val joined = a.join(eval,
      bit_count(col("sa").bitwiseXOR(col("sb"))) <= 2, "left")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("graft_seg") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"outer must rewrite:\n${plan.take(3000)}")
    val got = joined.select("a", "b").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSeq.sorted
    val expected = sigs.flatMap { case (id, sg) =>
      val ms = sigs.collect { case (eid, eg)
        if evalIds(eid) && Integer.bitCount(sg ^ eg) <= 2 => eid }
      if (ms.isEmpty) Seq((id, -1L)) else ms.map(e => (id, e))
    }.sorted
    assert(expected.exists(_._2 == -1L) && expected.exists(_._2 >= 0L))
    assert(got === expected)
  }

  test("semi/anti preserve duplicate left rows (bag at left grain)") {
    val (a, b) = frames
    val eval = b.filter(col("b") % 7 === 0)
    val ham = bit_count(col("sa").bitwiseXOR(col("sb"))) <= 2
    assert(a.union(a).join(eval, ham, "left_semi").count() ===
      2L * semiExpected.size)
    assert(a.union(a).join(eval, ham, "left_anti").count() ===
      2L * (sigs.size - semiExpected.size))
  }

  test("array signatures: duplicate multiplicity preserved (bag)") {
    val s = spark
    import s.implicits._
    val df = sigs128.toDF("id", "w0", "w1")
      .select(col("id"), array(col("w0"), col("w1")).as("sig"))
    val a = df.select(col("id").as("a"), col("sig").as("va"))
    val b = df.select(col("id").as("b"), col("sig").as("vb"))
    val ham = aggregate(
      zip_with(col("va"), col("vb"), (x, y) => bit_count(x.bitwiseXOR(y))),
      lit(0), (acc, v) => acc + v)
    val j2 = a.union(a).join(b, ham <= 2 && col("a") < col("b"))
    assert(j2.count() === 2L * expected128.size)
  }
}
