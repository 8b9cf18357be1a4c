package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.catalog.Tables
import graft.streaming.CmsStream
import graft.streaming.CmsStream.TokRow

/** Batch parity for the streaming count-min sketch: the final grid
  * after any micro-batch split must be BIT-EQUAL to batch q295's cells
  * (cell addition is commutative), and min-over-rows point estimates
  * for q295's audit tokens must equal the batch `cms_est` exactly.
  * No redelivery arm here on purpose — sums are not idempotent (the
  * scaladoc'd contrast with NdvStream); exactly-once delivery is the
  * engine's checkpointing contract.
  */
class StreamingCmsSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("streaming CMS grid equals batch q295; audit estimates bit-equal") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val toks = Tables.load(spark, sf, "documents")
      .select(explode(graft.queries.TextOps.toks(col("text"))).as("tok"))
      .collect().map(r => TokRow(r.getString(0))).toSeq
    val mem = MemoryStream[TokRow]
    val q = CmsStream.cellsWithState(mem.toDS())
      .writeStream.format("memory").queryName("cms_cells")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, rest) = toks.splitAt(toks.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b3: _*); q.processAllAvailable()
      val grid = s.table("cms_cells").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2)))
        .groupBy(_._1).map { case (r, rows) =>
          r -> rows.maxBy(_._2)._3.toIndexedSeq
        }
      assert(grid.keySet === (0 until CmsStream.depth).toSet)
      // mass conservation: every sketch row holds the full token count
      for ((_, cells) <- grid)
        assert(cells.sum === toks.size.toLong)
      val batch = SparkEntry.queries("q295_cms_heavy_hitters")(spark, sf)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(batch.nonEmpty)
      for ((tok, _, cmsEst) <- batch)
        assert(CmsStream.estimate(grid, tok) === cmsEst,
          s"estimate mismatch for '$tok'")
    } finally q.stop()
  }
}
