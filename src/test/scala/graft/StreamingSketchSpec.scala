package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.catalog.Tables
import graft.streaming.SketchStream

/** Streaming count-min sketch: the streamed counter state must be
  * bit-identical to the batch sketch over the rows seen so far, after
  * EVERY micro-batch — the map-combine/streaming-parity law that makes
  * the sketch a distributed primitive.
  */
class StreamingSketchSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  private def counterMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("streamed CMS counters equal the batch sketch after every batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val keys = Tables.load(s, sf, "lineitem")
      .select("l_partkey").collect().map(_.getLong(0))
    assert(keys.length > 1000)
    val batches = keys.grouped(keys.length / 3 + 1).toSeq
    val mem = MemoryStream[Long]
    val q = SketchStream.counters(mem.toDF().toDF("k"), "k")
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode(OutputMode.Complete()).start()
    try {
      var seen = Seq.empty[Long]
      batches.foreach { b =>
        mem.addData(b.toSeq: _*)
        q.processAllAvailable()
        seen = seen ++ b
        val streamed = counterMap(s.table("cms_stream"))
        val batch = counterMap(
          SketchStream.counters(seen.toDF("k"), "k"))
        assert(streamed === batch,
          s"counter state diverged after ${seen.length} rows")
      }
    } finally q.stop()
  }

  test("point estimates from streamed counters never underestimate") {
    val s = spark
    import s.implicits._
    val keysDf = Tables.load(s, sf, "lineitem").select("l_partkey")
    val ctr = SketchStream.counters(keysDf, "l_partkey")
    val truth = keysDf.groupBy("l_partkey").agg(count(lit(1)).as("t"))
    val est = SketchStream.pointEstimates(ctr, truth, "l_partkey")
    val joined = truth.join(est, "l_partkey").collect()
    assert(joined.length > 100)
    joined.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS underestimated key ${r.getLong(0)}")
    }
  }
}
