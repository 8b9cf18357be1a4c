package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.catalog.Tables
import graft.streaming.VocabDrift
import graft.streaming.VocabDrift.ShingleRow

/** Batch parity for the streaming vocabulary-drift monitor: summed
  * latest-per-shard checkpoints must equal (a) a sequential JVM
  * first-occurrence replay at every batch boundary, and (b) batch
  * q282's final (vocab_cum, shingles_cum) row after the full corpus —
  * under any micro-batch split. Redelivery: vocabCum is idempotent
  * (set insert), shinglesCum inflates by exactly the replayed rows —
  * both directions pinned.
  */
class StreamingDriftSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  /** q282's shingling, replicated expression-for-expression: 3-gram
    * shingles of space-split tokens, in doc_id order. */
  private lazy val shingleSeq: Seq[ShingleRow] = {
    val tk = graft.queries.TextOps.toks(col("text"))
    Tables.load(spark, sf, "documents")
      .select(col("doc_id"), explode(zip_with(
        slice(tk, lit(1), greatest(size(tk) - 2, lit(0))),
        zip_with(
          slice(tk, lit(2), greatest(size(tk) - 2, lit(0))),
          slice(tk, lit(3), greatest(size(tk) - 2, lit(0))),
          (b, c) => concat(b, lit(" "), c)),
        (a, bc) => concat(a, lit(" "), bc))).as("sh"))
      .orderBy("doc_id")
      .collect()
      .map(r => ShingleRow(VocabDrift.shardOf(r.getString(1)), r.getString(1)))
      .toSeq
  }

  /** Latest checkpoint per shard, summed: (vocabCum, shinglesCum, novel-sum
    * across ALL checkpoints so far). */
  private def totals(table: String): (Long, Long, Long) = {
    val rows = spark.table(table).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    val latest = rows.groupBy(_._1).values.map(_.maxBy(_._2))
    (latest.map(_._4).sum, latest.map(_._5).sum, rows.map(_._3).sum)
  }

  private def jvmReplay(prefix: Seq[ShingleRow]): (Long, Long) = {
    val seen = scala.collection.mutable.HashSet.empty[String]
    prefix.foreach(r => seen.add(r.sh))
    (seen.size.toLong, prefix.size.toLong)
  }

  test("drift checkpoints equal JVM replay per batch, q282 at the end, " +
    "and survive redelivery") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[ShingleRow]
    val q = VocabDrift.checkpointsWithState(mem.toDS())
      .writeStream.format("memory").queryName("drift_checkpoints")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, rest) = shingleSeq.splitAt(shingleSeq.size / 4)
      val (b2, b3) = rest.splitAt(rest.size / 3)

      mem.addData(b1: _*); q.processAllAvailable()
      val (v1, t1, n1) = totals("drift_checkpoints")
      assert((v1, t1) === jvmReplay(b1), "prefix parity after batch 1")
      assert(n1 === v1, "novel total ≡ vocab while nothing is redelivered")

      mem.addData(b2: _*); q.processAllAvailable()
      val (v2, t2, _) = totals("drift_checkpoints")
      assert((v2, t2) === jvmReplay(b1 ++ b2), "prefix parity after batch 2")

      // at-least-once: replay a slice of b2 — vocab idempotent, throughput
      // inflates by exactly the replayed count, zero novel contribution.
      val replayed = b2.take(b2.size / 3)
      mem.addData(replayed: _*); q.processAllAvailable()
      val (v2r, t2r, n2r) = totals("drift_checkpoints")
      assert(v2r === v2, "vocabCum idempotent under redelivery")
      assert(t2r === t2 + replayed.size, "shinglesCum inflates by replay size")
      assert(n2r === v2, "replayed rows contributed zero novel")

      mem.addData(b3: _*); q.processAllAvailable()
      val (v3, t3, n3) = totals("drift_checkpoints")
      val (ev, et) = jvmReplay(shingleSeq)
      assert(v3 === ev, "final vocabulary parity")
      assert(t3 === et + replayed.size, "final throughput = corpus + replay")
      assert(n3 === v3, "novel-sum conservation: every vocab entry novel once")

      // the batch anchor: q282's last checkpoint row carries the full-corpus
      // cumulative vocabulary and shingle totals.
      val last = SparkEntry.queries("q282_vocab_growth")(spark, sf)
        .orderBy(col("bkt").desc).limit(1).collect()(0)
      assert(v3 === last.getAs[Long]("vocab_cum"), "q282 vocab parity")
      assert(et === last.getAs[Long]("shingles_cum"), "q282 throughput parity")
    } finally q.stop()
  }

  test("split shape does not change the drift curve") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[ShingleRow]
    val q = VocabDrift.checkpointsWithState(mem.toDS())
      .writeStream.format("memory").queryName("drift_onebatch")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(shingleSeq: _*); q.processAllAvailable()
      val (v, t, n) = totals("drift_onebatch")
      assert((v, t) === jvmReplay(shingleSeq), "single-batch totals")
      assert(n === v, "novel conservation in one batch")
    } finally q.stop()
  }
}
