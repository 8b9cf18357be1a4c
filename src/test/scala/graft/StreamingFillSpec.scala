package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.catalog.Tables
import graft.streaming.ForwardFill
import graft.streaming.ForwardFill.Reading

/** Batch parity for the streaming LOCF forward-fill: every emitted
  * fill must be BIT-EQUAL to batch q332's window row for that
  * document, under any tie-boundary micro-batch split of the
  * key-ordered log; state is O(1) (one carry), unlike BurstMonitor's
  * horizon buffer.
  */
class StreamingFillSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("streaming forward-fill equals batch q332 bit-for-bit") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // q332's exact input: sparse score over documents, keyed by length
    val readings = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars").cast("long").as("k"),
        when(col("n_chars") % 7 === 0, lit(null).cast("long"))
          .otherwise(col("n_chars") * 31L % 997L).as("score"))
      .collect()
      .map(r => Reading(r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .sortBy(r => (r.k, r.id)).toSeq
    assert(readings.nonEmpty)
    def tieSplit(xs: Seq[Reading], at: Int): (Seq[Reading], Seq[Reading]) = {
      var i = at
      while (i > 0 && i < xs.size && xs(i).k == xs(i - 1).k) i += 1
      xs.splitAt(i)
    }
    val mem = MemoryStream[Reading]
    val q = ForwardFill.fill(mem.toDS())
      .writeStream.format("memory").queryName("locf_fill")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, rest) = tieSplit(readings, readings.size / 3)
      val (b2, b3) = tieSplit(rest, rest.size / 2)
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
      val streamed = s.table("locf_fill").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) null else r.getLong(3))).toMap
      val batch = SparkEntry.queries("q332_locf_forward_fill")(spark, sf)
        .collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) null else r.getLong(3))).toMap
      assert(batch.nonEmpty && streamed.size === batch.size)
      for ((id, v) <- batch)
        assert(streamed(id) === v, s"fill mismatch for doc $id")
    } finally q.stop()
  }
}
