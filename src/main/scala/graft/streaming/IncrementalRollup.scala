package graft.streaming

import java.io.{File, IOException}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming maintenance of an additive rollup table: the `foreachBatch`
  * twin of the batch incremental-aggregate-maintenance query (q129). Each
  * micro-batch reduces to partial aggregates at the rollup grain and
  * merges into the parquet target by the algebraic identity (sum of sums,
  * sum of counts) — the target absorbs a batch by scanning ONLY the
  * current rollup + the batch partials, never historical facts.
  *
  * Exactly-once under at-least-once delivery: `foreachBatch` may replay a
  * micro-batch after a crash, and REAPPLYING an additive merge double
  * counts (unlike [[Ingest.upsertBatch]]'s by-key upsert, which is
  * naturally idempotent). The committed `batchId` therefore rides INSIDE
  * the swapped directory as a `_batch_id` marker file (Spark readers
  * ignore `_`-prefixed files): the rollup rows and the id they include
  * become visible in the same atomic rename, so a replayed or
  * out-of-order batch is detected and skipped — the "transactional sink
  * tracks the batch id" pattern from the Structured Streaming sink
  * contract, on plain parquet.
  *
  * Scale notes: the partial aggregation runs distributed before anything
  * touches the driver; the merge re-aggregates |rollup| + |batch grain|
  * rows — the rollup grain (e.g. months × keys) is orders of magnitude
  * smaller than the stream. The rewrite-and-swap is the plain-parquet
  * stand-in for a table-format MERGE commit (same note as
  * [[Ingest.upsertBatch]]); on a real lakehouse table only the commit
  * mechanics change.
  */
object IncrementalRollup {

  /** Merge one micro-batch into the keyed rollup at `targetPath`.
    *
    * @param batch     raw micro-batch rows
    * @param batchId   foreachBatch's monotone batch id
    * @param keys      rollup grain columns (must exist in `batch`)
    * @param measures  (outputCol -> aggregate over the RAW batch rows);
    *                  each aggregate must be additive (sum/count) so
    *                  merging partials by SUM is exact. Counts must be
    *                  expressed as `count(...)`; the merge re-sums them.
    */
  def mergeBatch(targetPath: String, batchId: Long, batch: DataFrame,
      keys: Seq[String], measures: Seq[(String, org.apache.spark.sql.Column)])
      : Unit = {
    val spark = batch.sparkSession
    val target = new File(targetPath)
    val old = new File(targetPath + ".old")
    // crash recovery: a run that died between the two renames leaves the
    // sole surviving copy in .old — restore before reading
    if (!target.exists && old.exists && !old.renameTo(target))
      throw new IOException(s"failed to recover $old -> $target")

    if (batchId <= committedBatchId(target)) return // replay: already in

    val aggs = measures.map { case (name, c) => c.as(name) }
    val partial = batch.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val merged =
      if (target.exists)
        spark.read.parquet(targetPath)
          .unionByName(partial)
          .groupBy(keys.map(col): _*)
          .agg(sum(measures.head._1).as(measures.head._1),
            measures.tail.map { case (n, _) => sum(n).as(n) }: _*)
      else partial

    val tmp = new File(targetPath + ".tmp")
    merged.write.mode("overwrite").parquet(tmp.getPath)
    // the marker commits atomically WITH the data at the rename below
    Files.write(tmp.toPath.resolve("_batch_id"),
      batchId.toString.getBytes(StandardCharsets.UTF_8))
    deleteRec(old)
    if (target.exists && !target.renameTo(old))
      throw new IOException(s"failed to stage $target -> $old")
    if (!tmp.renameTo(target)) {
      old.renameTo(target) // restore the backup before failing
      throw new IOException(s"failed to publish $tmp -> $target")
    }
    deleteRec(old)
  }

  /** Highest batch id already folded into the target (-1 if none). */
  def committedBatchId(target: File): Long = {
    val marker = new File(target, "_batch_id")
    if (marker.exists)
      new String(Files.readAllBytes(marker.toPath),
        StandardCharsets.UTF_8).trim.toLong
    else -1L
  }

  private def deleteRec(f: File): Unit = {
    if (f.isDirectory) f.listFiles.foreach(deleteRec)
    f.delete(): Unit
  }
}
