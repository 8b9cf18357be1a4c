package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.CorpusFilter

/** Exact batch parity for the stateless streaming corpus gates: the
  * verdicts/samples a stream emits at arrival time must be bit-identical
  * to a batch backfill over the same rows — including across micro-batch
  * boundaries and under at-least-once redelivery (same doc replayed →
  * same verdict, so downstream dedup stays trivial).
  */
object StreamingCorpusSpec {
  final case class Doc(doc_id: Long, text: String, lang: String)
}

class StreamingCorpusSpec extends SparkSpecBase {
  import StreamingCorpusSpec.Doc

  private lazy val docs: Seq[Doc] = {
    // real corpus rows so every rule branch is exercised
    val real = graft.catalog.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text", "lang").collect()
      .map(r => Doc(r.getLong(0), r.getString(1), r.getString(2))).toSeq
    real.take(60) :+ Doc(9999L, "tiny doc", "en") // a too_short positive
  }

  test("streaming rule verdicts are bit-identical to the batch backfill") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Doc]
    val q = CorpusFilter.verdicts(mem.toDF())
      .writeStream.format("memory").queryName("verdict_out")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, b2) = docs.splitAt(docs.size / 2)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val streamed = s.table("verdict_out").collect()
        .map(r => r.toSeq).sortBy(_.head.asInstanceOf[Long])
      val batch = CorpusFilter.verdicts(docs.toDF())
        .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
      assert(streamed === batch)
      assert(streamed.exists(_.last == "too_short"))
    } finally q.stop()
  }

  test("streaming kept-gate passes exactly the batch-kept documents") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Doc]
    val q = CorpusFilter.kept(mem.toDF())
      .select("doc_id")
      .writeStream.format("memory").queryName("kept_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(docs: _*); q.processAllAvailable()
      val streamed = s.table("kept_out").collect().map(_.getLong(0)).toSet
      val batchKept = CorpusFilter.kept(docs.toDF())
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamed === batchKept)
      assert(batchKept.nonEmpty && !batchKept.contains(9999L),
        "the too_short positive must be gated out")
    } finally q.stop()
  }

  test("streaming stratified sample matches batch and survives replay") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Doc]
    val q = CorpusFilter.stratified(mem.toDF())
      .select("doc_id")
      .writeStream.format("memory").queryName("strat_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(docs: _*); q.processAllAvailable()
      mem.addData(docs.take(10): _*); q.processAllAvailable() // redelivery
      val streamed = s.table("strat_out").collect().map(_.getLong(0))
      val batchIds = CorpusFilter.stratified(docs.toDF())
        .select("doc_id").collect().map(_.getLong(0)).toSet
      // every emitted id is a batch-kept id, and each first-batch emission
      // covers the batch decision exactly
      assert(streamed.toSet === batchIds)
      // replayed docs re-emit with the SAME verdict (deterministic bucket)
      val replayed = streamed.groupBy(identity).collect {
        case (id, hits) if hits.length > 1 => id
      }.toSet
      assert(replayed === docs.take(10).map(_.doc_id).toSet.intersect(batchIds))
    } finally q.stop()
  }

  test("streaming classifier gate matches the batch q174 scores exactly") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Doc]
    val q = CorpusFilter.scored(mem.toDF())
      .select("doc_id", "score_milli", "pred")
      .writeStream.format("memory").queryName("clf_out")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, b2) = docs.splitAt(20)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val streamed = s.table("clf_out").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
      // batch reference is q174 itself (explode + partial agg), so this
      // also pins fold-scorer ≡ explode-scorer on real corpus rows
      val batch = SparkEntry
        .queries("q174_hash_classifier")(s, "/root/testdata/sf0.001")
        .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getInt(3))))
        .toMap
      for ((id, got) <- streamed if batch.contains(id))
        assert(got === batch(id), s"doc $id")
      assert(streamed(9999L)._1 ===
        CorpusFilter.scored(Seq(Doc(9999L, "tiny doc", "en")).toDF())
          .head().getLong(3))
    } finally q.stop()
  }
}
