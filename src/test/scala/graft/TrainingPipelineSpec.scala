package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import graft.catalog.Tables
import graft.queries.TrainingPipelinePack

/** Independent validation of the training-pipeline pack's claims — each
  * test recomputes the expected result JVM-side (plain MessageDigest +
  * Scala collections), so the cross-engine md5-bucket idiom and the
  * windowed budget/sampling semantics are checked against a third
  * implementation, not just the DuckDB oracle.
  */
class TrainingPipelineSpec extends SparkSpecBase {

  private val sf0001 = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def jvmHash32(salt: String, id: Long): Long =
    java.lang.Long.parseLong(md5hex(s"$salt|$id").take(8), 16)

  test("md5Hash32 matches an independent JVM MessageDigest computation") {
    val rows = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"),
        TrainingPipelinePack.md5Hash32(col("doc_id"), "sample").as("h"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) === jvmHash32("sample", r.getLong(0)),
        s"doc ${r.getLong(0)}")
    }
  }

  test("split assignment is stable under corpus growth (sf0.001 ⊂ sf0.1)") {
    def splits(dir: String): Map[Long, String] = {
      val b = TrainingPipelinePack.bucket(col("doc_id"), "split", 100)
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"),
          when(b < 80, "train").when(b < 90, "val").otherwise("test")
            .as("split"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    val small = splits(sf0001)
    // documents only grows at sf0.1 (sf0.001/sf0.01 share the 500-doc set)
    val big = splits("/root/testdata/sf0.1")
    assert(small.nonEmpty && big.size > small.size)
    // every document keeps its split when the corpus grows 10× — the
    // property rand()/randomSplit/mod-of-rank assignments all lack
    small.foreach { case (id, sp) =>
      assert(big(id) === sp, s"doc $id moved split")
    }
    // and the cut is near the declared 80/10/10 (md5 uniformity sanity)
    val trainFrac = big.values.count(_ == "train").toDouble / big.size
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"train frac $trainFrac")
  }

  test("token budget keeps exactly the maximal quality-ordered prefix") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select("source", "doc_id", "n_chars", "text")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3).split(" ").count(_.nonEmpty).toLong))
    val expected = docs.groupBy(_._1).flatMap { case (src, ds) =>
      val ordered = ds.sortBy(d => (-d._3, d._2)) // n_chars desc, doc_id
      val cum = ordered.scanLeft(0L)(_ + _._4).tail
      val kept = ordered.zip(cum).takeWhile(_._2 <= 3000L)
      if (kept.isEmpty) None
      else Some(src -> ((kept.size.toLong, kept.last._2)))
    }
    val out = TrainingPipelinePack.queries.toMap
      .apply("q113_token_budget")(spark, sf0001)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out === expected)
  }

  test("split assignment runs unchanged in Structured Streaming (batch parity)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import org.apache.spark.sql.DataFrame
    // the pack's per-row assignment expressions are stateless, so the same
    // transform applies verbatim to a stream — the ingest-time labeling
    // story: documents get their split/mixture fate as they arrive
    def assign(df: DataFrame): DataFrame = {
      val b = TrainingPipelinePack.bucket(col("doc_id"), "split", 100)
      df.select(col("doc_id"),
        when(b < 80, "train").when(b < 90, "val").otherwise("test")
          .as("split"))
    }
    val docs = (0L until 40L).map(i => (i, s"doc $i body"))
    val mem = MemoryStream[(Long, String)]
    val q = assign(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("split_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(docs.take(25): _*)
      q.processAllAvailable()
      mem.addData(docs.drop(25): _*)
      q.processAllAvailable()
      val streamed = s.table("split_stream").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val batch = assign(docs.toDF("doc_id", "text")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("group sample picks exactly the bottom-5 hashes per source") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (src, ds) =>
      ds.map(d => (src, d._2, jvmHash32("sample", d._2)))
        .sortBy(t => (t._3, t._2)).take(5).zipWithIndex
        .map { case ((s0, id, h), i) => (s0, i + 1, id, h) }
    }.toSet
    val out = TrainingPipelinePack.queries.toMap
      .apply("q123_group_sample")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(out === expected)
  }

  test("PII regexes: positives redact, digit-run/id lookalikes survive") {
    import spark.implicits._
    val rows = Seq(
      (0L, "mail me at a.user+tag@sub.example.org today"), // email
      (1L, "call 555-123-4567 now"),                       // phone
      (2L, "order id 12345-678-90123 is not a phone"),     // digit run
      (3L, "x555-123-4567y binds to word chars"),          // no boundary
      (4L, "ratio 3-21-1997 too short"))                   // wrong widths
      .toDF("doc_id", "text")
    rows.createOrReplaceTempView("pii_docs")
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
    val out = rows.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit(emailRe), lit(0))).as("e"),
      size(regexp_extract_all(col("text"), lit(phoneRe), lit(0))).as("p"),
      regexp_replace(regexp_replace(col("text"), emailRe, "[EMAIL]"),
        phoneRe, "[PHONE]").as("red"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2),
        r.getString(3)))).toMap
    assert(out(0L) === ((1, 0, "mail me at [EMAIL] today")))
    assert(out(1L) === ((0, 1, "call [PHONE] now")))
    assert(out(2L)._1 === 0 && out(2L)._2 === 0,
      s"digit run must not match: ${out(2L)}")
    // "x555-..." : '5' is preceded by word char 'x' — no boundary, BUT the
    // regex can also start mid-run only at a boundary; verify no match
    assert(out(3L)._2 === 0, s"embedded number must not match: ${out(3L)}")
    assert(out(4L) === ((0, 0, "ratio 3-21-1997 too short")))
  }

  private def jvmHashStr32(salt: String, s: String): Long =
    java.lang.Long.parseLong(md5hex(s"$salt|$s").take(8), 16)

  test("q174: classifier scores match a plain-Scala hashed-linear model") {
    def weight(w: String): Long = {
      val bk = jvmHashStr32("feat", w) % 512
      (bk * 1103515245L + 12345L) % 2001L - 1000L
    }
    val expect = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ").filter(_.nonEmpty).map(weight).sum)
      .toMap
    val rows = SparkEntry.queries("q174_hash_classifier")(spark, sf0001)
      .collect()
    assert(rows.length === expect.size)
    for (r <- rows) {
      val (id, sc, pred) = (r.getLong(0), r.getLong(2), r.getInt(3))
      assert(sc === expect(id), s"doc $id score_milli")
      assert(pred === (if (sc > 0) 1 else 0), "pred derives from the score")
    }
    assert(rows.exists(_.getInt(3) == 0) && rows.exists(_.getInt(3) == 1),
      "synthetic weights must split the corpus both ways")
  }

  test("q175: folds partition the corpus into k nonempty stable parts") {
    val docs = Tables.load(spark, sf0001, "documents")
    val total = docs.count()
    val totalToks = docs
      .select(sum(size(graft.queries.TextOps.toks(col("text")))))
      .head().getLong(0)
    val rows = SparkEntry.queries("q175_kfold_assignment")(spark, sf0001)
      .collect()
    assert(rows.map(_.getInt(0)).toSet === (0 until 5).toSet)
    assert(rows.map(_.getLong(2)).sum === total, "every doc in exactly one fold")
    assert(rows.map(_.getLong(3)).sum === totalToks, "token conservation")
    // fold of every doc recomputes from the JVM hash
    val folds = docs.select(col("doc_id")).collect().map(_.getLong(0))
      .groupBy(id => jvmHash32("fold", id) % 5).view.mapValues(_.length.toLong)
    val byFold = rows.groupBy(_.getInt(0)).view
      .mapValues(_.map(_.getLong(2)).sum)
    (0 until 5).foreach { f =>
      assert(byFold(f) === folds(f.toLong), s"fold $f size")
    }
  }

  test("q179: report card agrees with q174/q158 and the raw corpus") {
    val card = SparkEntry.queries("q179_source_report_card")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r).toMap
    val docs = Tables.load(spark, sf0001, "documents")
    // n_docs/n_tokens/mean_tokens straight off the corpus
    val base = docs.groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum(size(graft.queries.TextOps.toks(col("text")))).as("tk"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val srcOf = docs.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // classifier negatives per source from q174's verdicts
    val clfNeg = SparkEntry.queries("q174_hash_classifier")(spark, sf0001)
      .collect().filter(_.getInt(3) == 0)
      .groupBy(r => srcOf(r.getLong(0))).view.mapValues(_.length.toLong)
    // rule failures per source from q158's verdicts
    val ruleFail = SparkEntry.queries("q158_filter_rules")(spark, sf0001)
      .collect().filter(_.getInt(5) == 0)
      .groupBy(r => srcOf(r.getLong(0))).view.mapValues(_.length.toLong)
    assert(card.keySet === base.keySet)
    for ((src, r) <- card) {
      assert(r.getLong(1) === base(src)._1, s"$src n_docs")
      assert(r.getLong(2) === base(src)._2, s"$src n_tokens")
      assert(r.getLong(4) === ruleFail.getOrElse(src, 0L), s"$src rule_fail")
      assert(r.getLong(5) === clfNeg.getOrElse(src, 0L), s"$src clf_neg")
      assert(r.getDouble(6) === base(src)._2.toDouble / base(src)._1,
        s"$src mean_tokens")
    }
    // exact-dup accounting: total flagged = total docs - distinct texts
    val dupTotal = card.values.map(_.getLong(3)).sum
    val distinctTexts = docs.select("text").distinct().count()
    assert(dupTotal === docs.count() - distinctTexts)
  }

  test("q184: tempered mixture recomputes in JVM and flattens the shares") {
    val toks = Tables.load(spark, sf0001, "documents")
      .groupBy("source")
      .agg(sum(size(graft.queries.TextOps.toks(col("text")))).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totT = toks.values.sum
    val pw = toks.view.mapValues(t => math.sqrt(t.toDouble)).toMap
    val totPw = pw.values.toSeq.sorted.sum // any order, compare with tolerance
    val rows = SparkEntry.queries("q184_temperature_mixture")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(rows.keySet === toks.keySet)
    for ((src, (n, raw, temp, ep)) <- rows) {
      assert(n === toks(src))
      assert(raw === n.toDouble / totT, s"$src raw_share is a single division")
      assert(math.abs(temp - pw(src) / totPw) < 1e-6, s"$src temp share")
      assert(math.abs(ep - 50000L * pw(src) / totPw / n) < 1e-6, s"$src epochs")
    }
    assert(math.abs(rows.values.map(_._3).sum - 1.0) < 1e-4, "shares sum to 1")
    // α < 1 tempering: the largest source loses share, the smallest gains
    val largest = toks.maxBy(_._2)._1
    val smallest = toks.minBy(_._2)._1
    assert(rows(largest)._3 < rows(largest)._2, "largest source tempered down")
    assert(rows(smallest)._3 > rows(smallest)._2, "smallest source tempered up")
  }

  test("q183: padding ledger recomputes in JVM; sorted batching wins") {
    val lens = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"),
        size(graft.queries.TextOps.toks(col("text"))).as("ntk"))
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    def audit(ordered: Seq[Int]): (Long, Long, Long) = {
      val batches = ordered.grouped(16).toSeq
      (batches.size.toLong,
        ordered.map(_.toLong).sum,
        batches.map(b => b.size.toLong * b.max).sum)
    }
    val expect = Map(
      "arrival" -> audit(lens.sortBy(_._1).map(_._2).toSeq),
      "length_sorted" -> audit(lens.sortBy(l => (l._2, l._1)).map(_._2).toSeq))
    val rows = SparkEntry.queries("q183_padding_audit")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(rows.keySet === expect.keySet)
    for ((k, (nb, real, pad)) <- expect) {
      assert((rows(k)._1, rows(k)._2, rows(k)._3) === ((nb, real, pad)), k)
      assert(rows(k)._4 === (pad - real).toDouble / pad, s"$k ratio")
    }
    assert(rows("length_sorted")._4 < rows("arrival")._4,
      "length-sorted batching must pay less padding")
  }

  test("q177: manifest shards are balanced, exhaustive, and reproducible") {
    val run1 = SparkEntry.queries("q177_shard_manifest")(spark, sf0001)
      .collect()
    val run2 = SparkEntry.queries("q177_shard_manifest")(spark, sf0001)
      .collect()
    assert(run1.map(_.toString).toSeq === run2.map(_.toString).toSeq,
      "manifest (incl. fingerprints) identical across runs")
    val total = Tables.load(spark, sf0001, "documents").count()
    assert(run1.map(_.getLong(1)).sum === total)
    val counts = run1.map(_.getLong(1))
    assert(counts.max - counts.min <= 1, "round-robin deal is balanced")
    assert(run1.map(_.getString(4)).distinct.length === run1.length,
      "shards hold different documents")
    // q115 and q177 share the deal — per-shard doc counts must agree
    // (shard is LongType since the r6 DistRank swap: global rn is long)
    val q115 = SparkEntry.queries("q115_shuffle_shards")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    run1.foreach(r => assert(q115(r.getLong(0)) === r.getLong(1)))
  }
}
