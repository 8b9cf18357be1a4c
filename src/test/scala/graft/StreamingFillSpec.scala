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

  test("tiebreak streaming fill equals the batch MULTI-KEY LOCF rewrite") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // duplicated key (tie runs), id tiebreak, input a function of the
    // key so the batch arm admits it; splits land MID-tie-run on
    // purpose — the tiebreak variant's loosened batch contract
    val readings = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), (col("n_chars") % 37L).as("k"),
        when(col("n_chars") % 37 % 5 === 0, lit(null).cast("long"))
          .otherwise(col("n_chars") % 37 * 31L % 997L).as("score"))
      .collect()
      .map(r => Reading(r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .sortBy(r => (r.k, r.id)).toSeq
    assert(readings.nonEmpty)
    val mem = MemoryStream[Reading]
    val q = ForwardFill.fillTiebreak(mem.toDS())
      .writeStream.format("memory").queryName("locf_fill_tb")
      .outputMode(OutputMode.Append()).start()
    try {
      // raw thirds: no tie alignment
      val (b1, rest) = readings.splitAt(readings.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
      val streamed = s.table("locf_fill_tb").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) null else r.getLong(3))).toMap
      // batch twin THROUGH the multi-key rewrite (threshold forced so
      // the arm fires at fixture scale; plan marker asserted)
      val thr = "spark.sql.autoBroadcastJoinThreshold"
      val old = s.conf.get(thr)
      s.conf.set(thr, "-1")
      val batch =
        try {
          val df = Tables.load(spark, sf, "documents")
            .select(col("doc_id"), (col("n_chars") % 37L).as("k"),
              when(col("n_chars") % 37 % 5 === 0, lit(null).cast("long"))
                .otherwise(col("n_chars") % 37 * 31L % 997L).as("score"))
            .withColumn("locf", last(col("score"), ignoreNulls = true)
              .over(org.apache.spark.sql.expressions.Window
                .orderBy(col("k").asc, col("doc_id").asc)
                .rowsBetween(org.apache.spark.sql.expressions
                  .Window.unboundedPreceding,
                  org.apache.spark.sql.expressions.Window.currentRow)))
          assert(df.queryExecution.executedPlan.toString
            .contains("graft_rank_pid"), "multi-key arm must serve the twin")
          df.collect().map(r => r.getLong(0) ->
            (if (r.isNullAt(3)) null else r.getLong(3))).toMap
        } finally s.conf.set(thr, old)
      assert(batch.nonEmpty && streamed.size === batch.size)
      for ((id, v) <- batch)
        assert(streamed(id) === v, s"tiebreak fill mismatch for doc $id")
    } finally q.stop()
  }
}
