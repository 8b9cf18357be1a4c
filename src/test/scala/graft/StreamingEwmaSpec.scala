package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Ewma
import graft.streaming.Ewma.DayRev

/** Exact batch parity for the stateful streaming EWMA: feeding the real
  * per-priority daily revenue series (the q166 input, exact-cents grain)
  * through `flatMapGroupsWithState` across micro-batch boundaries must
  * land on bit-identical final smoothed values to the batch in-row fold —
  * the state hand-off between batches IS the fold's accumulator.
  */
class StreamingEwmaSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private lazy val series: Seq[DayRev] = {
    val daily = graft.catalog.Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderpriority").as("p"),
        col("o_orderdate").cast("date").as("d"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .orderBy("d", "p") // cross-batch delivery in date order per key
      .collect()
    daily.map(r => DayRev(r.getString(0), r.getDate(1),
      r.getLong(2) / 100.0)).toSeq
  }

  test("streaming EWMA equals the batch fold after batch-split replay") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[DayRev]
    val q = Ewma.ewmaWithState(mem.toDS())
      .writeStream.format("memory").queryName("ewma_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // three micro-batches, split mid-series: state must carry y across
      val (b1, rest) = series.splitAt(series.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b3: _*); q.processAllAvailable()
      // one emitted point per input day
      assert(s.table("ewma_out").count() === series.size)
      // final smoothed value per priority vs the batch query (q166)
      val streamedFinal = s.table("ewma_out")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("priority").orderBy(col("d").desc)))
        .filter(col("rn") === 1)
        .select("priority", "ewma").collect()
        .map(r => r.getString(0) -> math.rint(r.getDouble(1) * 1e6) / 1e6)
        .toMap
      val batch = SparkEntry.queries("q166_ewma_revenue")(s, dir)
        .select("priority", "ewma").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(streamedFinal.keySet === batch.keySet)
      for ((p, b) <- batch)
        assert(math.abs(streamedFinal(p) - b) < 1e-9,
          s"priority $p: streaming ${streamedFinal(p)} vs batch $b")
    } finally q.stop()
  }
}
