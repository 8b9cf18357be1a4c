package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.IncrementalRollup

object IncrementalRollupSpec {
  final case class Sale(k: String, cents: Long, ts_ts: Timestamp)
}

/** Exactly-once additive rollup maintenance ([[IncrementalRollup]]):
  * merge(batches) ≡ recompute(all rows), replays are no-ops, and the
  * real foreachBatch wiring converges to the same table.
  */
class IncrementalRollupSpec extends SparkSpecBase {
  import IncrementalRollupSpec._

  private def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)

  private val measures = Seq(
    "n" -> count(lit(1)),
    "total_cents" -> sum("cents"))

  private def rollupOf(path: String): Map[String, (Long, Long)] =
    spark.read.parquet(path).collect()
      .map(r => r.getString(r.fieldIndex("k")) ->
        (r.getLong(r.fieldIndex("n")), r.getLong(r.fieldIndex("total_cents"))))
      .toMap

  private def recompute(rows: Seq[Sale]): Map[String, (Long, Long)] = {
    val s = spark
    import s.implicits._
    rows.toDF().groupBy("k")
      .agg(count(lit(1)).as("n"), sum("cents").as("total_cents"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("merged batches equal the full recompute; replays are no-ops") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("inc_rollup")
    val path = dir.resolve("rollup").toString

    val b0 = Seq(Sale("a", 100, ts(0)), Sale("b", 250, ts(1)))
    val b1 = Seq(Sale("a", 50, ts(2)), Sale("c", 999, ts(3)))
    val b2 = Seq(Sale("b", 1, ts(4)))

    def merge(id: Long, rows: Seq[Sale]): Unit =
      IncrementalRollup.mergeBatch(path, id, rows.toDF(), Seq("k"), measures)

    merge(0, b0)
    merge(1, b1)
    // crash-replay of batch 1 (at-least-once delivery) must not double count
    merge(1, b1)
    merge(2, b2)
    // stale re-delivery of an OLD batch after newer commits: also a no-op
    merge(0, b0)

    assert(rollupOf(path) === recompute(b0 ++ b1 ++ b2))
    assert(IncrementalRollup.committedBatchId(new java.io.File(path)) === 2L)
  }

  test("foreachBatch wiring converges to the batch recompute") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("inc_rollup_fb")
    val path = dir.resolve("rollup").toString

    val rows = Seq(
      Sale("x", 10, ts(0)), Sale("y", 20, ts(1)),
      Sale("x", 30, ts(2)), Sale("z", 40, ts(3)))

    val mem = MemoryStream[Sale]
    val q = mem.toDS().writeStream
      .foreachBatch { (batch: Dataset[Sale], id: Long) =>
        IncrementalRollup.mergeBatch(path, id, batch.toDF(), Seq("k"),
          measures)
      }
      .start()
    try {
      mem.addData(rows(0), rows(1))
      q.processAllAvailable()
      mem.addData(rows(2), rows(3))
      q.processAllAvailable()
      assert(rollupOf(path) === recompute(rows))
    } finally q.stop()
  }
}
