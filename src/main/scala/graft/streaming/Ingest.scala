package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.etl.Lakehouse

/** Streaming-ingestion building blocks beyond sessionization
  * ([[Sessionize]]): watermarked dedup, stream–static enrichment, and an
  * idempotent upsert sink. Together with Sessionize these make the
  * streaming path a full ingestion pipeline: dedup → enrich → sessionize
  * or upsert-to-silver — the streaming twin of the batch medallion ETL
  * (`graft.etl.Medallion`).
  *
  * Scale notes:
  *   - [[dedup]] keeps one state entry per id inside the watermark horizon
  *     — bounded state, partitioned by the id hash; this is at-least-once
  *     → effectively-once repair for sources that redeliver (Kinesis/Kafka
  *     replays, the reference's "generator re-run" case).
  *   - [[enrich]] broadcast-joins a small dimension into each micro-batch;
  *     the stream side never shuffles. Re-broadcast per trigger picks up
  *     slowly-changing dims.
  *   - [[upsertBatch]] is the `foreachBatch` MERGE pattern. Over plain
  *     parquet it must rewrite the target (write-temp + atomic swap, local
  *     FS only); a table format with a transaction log (Delta/Iceberg)
  *     replaces the swap with a real MERGE commit — semantics identical,
  *     which is why [[Lakehouse.upsert]] is the shared core.
  */
object Ingest {

  /** Exactly-once-ish dedup by `idCol`: duplicates arriving within the
    * watermark horizon are dropped; state for ids older than the watermark
    * is evicted (so a duplicate arriving later than `watermark` would pass
    * — the horizon is the dedup guarantee).
    */
  def dedup(events: DataFrame, idCol: String, tsCol: String,
      watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCol)

  /** Enrich a stream with a static dimension (left join, dim broadcast per
    * micro-batch).
    */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Idempotent micro-batch MERGE into a parquet target: re-processing the
    * same batch converges to the same table (upsert by key). Local-FS
    * write-temp + directory swap stands in for a table-format transaction.
    */
  def upsertBatch(targetPath: String, batch: DataFrame, key: String): Unit = {
    import java.io.{File, IOException}
    val spark = batch.sparkSession
    val target = new File(targetPath)
    val old = new File(targetPath + ".old")
    // crash recovery: a previous run that died between the two renames
    // leaves the sole surviving copy in .old — restore it, never delete it
    if (!target.exists && old.exists && !old.renameTo(target))
      throw new IOException(s"failed to recover $old -> $target")
    val merged =
      if (target.exists)
        Lakehouse.upsert(spark.read.parquet(targetPath), batch, key)
      else batch
    val tmp = new File(targetPath + ".tmp")
    merged.write.mode("overwrite").parquet(tmp.getPath)
    deleteRec(old)
    if (target.exists && !target.renameTo(old))
      throw new IOException(s"failed to stage $target -> $old")
    if (!tmp.renameTo(target)) {
      old.renameTo(target) // restore the backup before failing
      throw new IOException(s"failed to publish $tmp -> $target")
    }
    deleteRec(old) // only after a verified swap
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles.foreach(deleteRec)
    f.delete(): Unit
  }
}
