package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.catalog.Tables
import graft.streaming.NdvStream
import graft.streaming.NdvStream.ValueRow

/** Batch parity for the streaming HLL profile: the final per-column
  * (n_zero_regs, hll_ndv) after any micro-batch split — including
  * redelivered rows — must be BIT-EQUAL to batch q284 on the same
  * table (register max is commutative + idempotent; the estimator is
  * the identical expression).
  */
class StreamingNdvSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  /** q284's canonicalization, replicated: (column, canon-string) rows. */
  private lazy val valueRows: Seq[ValueRow] = {
    val o = Tables.load(spark, sf, "orders")
    val arms = Seq(
      ("o_orderkey", round(col("o_orderkey") * 100).cast("long")
        .cast("string")),
      ("o_custkey", round(col("o_custkey") * 100).cast("long")
        .cast("string")),
      ("o_orderstatus", col("o_orderstatus").cast("string")),
      ("o_totalprice", round(col("o_totalprice") * 100).cast("long")
        .cast("string")),
      ("o_orderdate", unix_micros(col("o_orderdate").cast("timestamp"))
        .cast("string")),
      ("o_orderpriority", col("o_orderpriority").cast("string")))
    arms.flatMap { case (name, canon) =>
      o.select(canon.as("v")).filter(col("v").isNotNull).collect()
        .map(r => ValueRow(name, r.getString(0)))
    }
  }

  test("streaming HLL registers equal batch q284 across splits + replay") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[ValueRow]
    val q = NdvStream.estimatesWithState(mem.toDS())
      .writeStream.format("memory").queryName("ndv_estimates")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, rest) = valueRows.splitAt(valueRows.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      // at-least-once: redeliver part of b2 — register max is idempotent
      mem.addData((b2.take(b2.size / 4) ++ b3): _*); q.processAllAvailable()
      val streamed = s.table("ndv_estimates").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4)))
        .groupBy(_._1).map { case (c, es) => c -> es.maxBy(_._2) }
      val batch = SparkEntry.queries("q284_profile_hll_ndv")(spark, sf)
        .collect()
        .map(r => r.getString(0) -> (r.getLong(2), r.getDouble(3)))
        .toMap
      assert(streamed.keySet === batch.keySet)
      for ((c, (_, _, zeros, _, est)) <- streamed) {
        val (bZeros, bEst) = batch(c)
        assert(zeros === bZeros, s"$c zero-register mismatch")
        assert(est === bEst, s"$c estimate mismatch: stream $est batch $bEst")
      }
    } finally q.stop()
  }
}
