package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lakehouse table-maintenance operators the reference's medallion
  * architecture implies but never has to spell out (its Athena CTAS layer
  * is full-rebuild only — reference `README.md:248-344` — and its silver
  * zone is overwrite-on-write, `README.md:193-196`): CDC upsert (MERGE
  * semantics) and slowly-changing-dimension history. Both are pure
  * DataFrame transforms over immutable inputs; a table-format transaction
  * log (Delta/Iceberg) would change durability, not these semantics.
  *
  * Scale notes:
  *   - [[upsert]] costs one anti-join on the key. A CDC batch is normally
  *     tiny relative to the base table, so Catalyst broadcasts it and the
  *     base streams through map-side with no shuffle; writing the result
  *     with the base's bucketing keeps downstream joins co-located.
  *   - [[scd2History]] is one window shuffle on the key — the sessionize
  *     shape. Both window passes share one partitioning, so Catalyst plans
  *     a single Exchange.
  */
object Lakehouse {

  /** MERGE over immutable inputs: update rows win on key collision,
    * unmatched base rows pass through, unmatched update rows insert —
    * i.e. `updates ∪ (base ▷ updates)`. Schemas must align by name.
    */
  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame =
    updates.unionByName(
      base.join(updates.select(key), Seq(key), "left_anti"))

  /** Cluster a table's file layout for data skipping: range-partition on
    * `sortExpr` into `files` output files, each internally sorted — so
    * every parquet footer carries tight min/max stats on the columns
    * `sortExpr` localizes. Pass a raw column for one-dimensional skipping
    * or a [[graft.functions.ZOrder.zvalue2]] for two-dimensional; readers
    * keep filtering on the raw columns — the layout, not the query,
    * changes (the OPTIMIZE ... ZORDER BY contract, on plain parquet).
    *
    * At 100 TB this is the difference between "every query scans the
    * table" and "footer pruning drops most of it before IO": run it per
    * ingest partition as a maintenance pass, like [[compact]] (whose
    * rename-swap publishes the rewrite; this emits to `path` directly and
    * composes with it). `repartitionByRange` samples the sort key to cut
    * balanced ranges — skew in the key shows up only as file-size skew,
    * never a hot reducer at read time.
    */
  def clusterBy(df: DataFrame, sortExpr: Column, path: String,
      files: Int): Unit =
    df.repartitionByRange(files, sortExpr)
      .sortWithinPartitions(sortExpr)
      .write.mode("overwrite").parquet(path)

  /** Small-file compaction: rewrite a parquet directory produced by
    * incremental/streaming ingest (many tiny files) into few well-sized
    * files. `coalesce` (narrow, no shuffle) merges input splits;
    * `maxRecordsPerFile` caps the other direction so one output task
    * can't produce an over-large file. At 100 TB this runs per partition
    * directory (event_date=…), never over the whole table at once —
    * which is exactly how the target-file-count argument is derived:
    * partition bytes / desired file size.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetFiles: Int, maxRecordsPerFile: Long = 5000000L): Unit = {
    val tmp = path.stripSuffix("/") + ".compacting"
    val bak = path.stripSuffix("/") + ".pre-compact"
    spark.read.parquet(path)
      .coalesce(targetFiles)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(tmp)
    // swap via renames — metadata-only, no second data pass (a table
    // format's transaction log would make this a proper atomic commit;
    // on object stores the rename becomes a manifest update). Hadoop
    // rename signals most failures by RETURNING FALSE, not throwing —
    // every step is checked, and the original data is moved aside (not
    // deleted) until the new copy is in place, so no failure mode loses
    // the table. The FileSystem comes from the PATH's scheme, not the
    // default FS — path may be s3a:// while defaultFS is hdfs://.
    val conf = spark.sparkContext.hadoopConfiguration
    val dst = new org.apache.hadoop.fs.Path(path)
    val fs = dst.getFileSystem(conf)
    def move(from: org.apache.hadoop.fs.Path,
        to: org.apache.hadoop.fs.Path): Unit =
      if (!fs.rename(from, to))
        throw new java.io.IOException(s"compact: rename $from -> $to failed")
    val bakP = new org.apache.hadoop.fs.Path(bak)
    fs.delete(bakP, true) // clear any stale backup from a crashed run
    move(dst, bakP)
    try move(new org.apache.hadoop.fs.Path(tmp), dst)
    catch { case e: Throwable => move(bakP, dst); throw e }
    if (!fs.delete(bakP, true))
      throw new java.io.IOException(s"compact: cleanup of $bak failed")
    ()
  }

  /** SCD Type-2 history: collapse each key's run of consecutive equal
    * `attr` values (ordered by `ts`, ties broken by `tie`) into validity
    * ranges `[valid_from, valid_to)`, open-ended (`valid_to` null,
    * `is_current` = 1) for the latest run.
    */
  def scd2History(df: DataFrame, key: String, attr: String,
      ts: Column, tie: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tie)
    val changes = df
      .withColumn("__valid_from", ts)
      .withColumn("__tie", tie)
      .withColumn("__prev", lag(col(attr), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      // null-SAFE inequality: `=!=` returns NULL when either side is
      // NULL, which would silently drop transitions into a NULL run AND
      // keep the row after it (emitting adjacent equal-attr ranges).
      // The first row per key must be kept unconditionally: lag's empty
      // frame yields NULL there, and if the opening attr value is also
      // NULL, `NULL <=> NULL` is true and the null-safe filter alone
      // would drop the key's opening history range.
      .filter(col("__rn") === 1 || !(col("__prev") <=> col(attr)))
    val w2 = Window.partitionBy(key)
      .orderBy(col("__valid_from"), col("__tie"))
    changes
      .withColumn("valid_to", lead(col("__valid_from"), 1).over(w2))
      .select(col(key), col(attr),
        col("__valid_from").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.cast("int").as("is_current"))
  }
}
