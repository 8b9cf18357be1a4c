package graft.etl

import java.io.{BufferedReader, InputStreamReader, IOException}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-versioned parquet tables — the transaction-log kernel of a
  * lakehouse table format (Delta/Iceberg shape) on plain files: every
  * commit writes its data files to a fresh immutable directory and then
  * publishes a *manifest* (the full file list of that snapshot) under a
  * monotonically increasing version. Readers resolve a manifest, never a
  * directory listing — so writers and readers don't race, overwrites are
  * logical (old files stay until [[expire]]), and any historical version
  * stays queryable (time travel).
  *
  * The reference rebuilds its curated zone in place via CTAS-drop-recreate
  * (reference `README.md:248-344`), which has a window where the table
  * doesn't exist; manifest-swap publication closes that window and adds
  * history for free.
  *
  * Scale notes:
  *   - A manifest lists complete snapshot contents, so reads are O(1)
  *     manifest fetches — no log replay. At 100 TB the list is thousands
  *     of file names (kilobytes-to-megabytes of text): trivial next to
  *     the data, same tradeoff Iceberg makes with its manifest lists.
  *   - Appends re-list only the files they add; prior files are carried
  *     by name. A compaction ([[Lakehouse.compact]]-style rewrite) is
  *     just another Overwrite commit.
  *   - Commit publication is create-exclusive on the version file:
  *     concurrent writers collide on the name, and the loser retries at
  *     the next version (optimistic concurrency). That primitive is
  *     atomic on HDFS and local filesystems; on S3-like stores a real
  *     deployment swaps in a conditional-put or a lock service — the
  *     protocol above it is unchanged.
  */
object Snapshots {

  sealed trait Mode
  /** Snapshot = exactly the new files (logical replace). */
  case object Overwrite extends Mode
  /** Snapshot = previous snapshot's files + the new files. */
  case object Append extends Mode

  private def snapDir(root: String) = new Path(root, "_snapshots")

  private def manifest(root: String, v: Int) =
    new Path(snapDir(root), f"v$v%05d.txt")

  private def fsFor(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed versions, ascending (empty for a fresh/expired-away root). */
  def versions(spark: SparkSession, root: String): Seq[Int] = {
    val fs = fsFor(spark, root)
    val dir = snapDir(root)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.matches("v\\d{5}\\.txt") =>
        n.stripPrefix("v").stripSuffix(".txt").toInt }
      .sorted
  }

  /** Write `df` as a new snapshot of the table at `root`; returns the
    * committed version. Files land under `root/data/<uuid>/`; the
    * manifest publishes last, so a crash before publication leaves only
    * unreferenced files (cleaned by [[expire]]), never a corrupt table.
    */
  def commit(df: DataFrame, root: String, mode: Mode): Int = {
    val spark = df.sparkSession
    val fs = fsFor(spark, root)
    val dataDir = new Path(root,
      "data/" + java.util.UUID.randomUUID.toString)
    df.write.parquet(dataDir.toString)
    val added = fs.listStatus(dataDir).toSeq
      .map(_.getPath)
      .filter(_.getName.startsWith("part-"))
      .map(p => s"data/${dataDir.getName}/${p.getName}")
    var v = versions(spark, root).lastOption.getOrElse(0) + 1
    while (true) {
      // re-resolve the carried base each attempt: if another writer won
      // version v, an Append must stack on *their* snapshot, not the one
      // observed before the race (lost-update prevention)
      val carried = mode match {
        case Overwrite => Seq.empty
        case Append => versions(spark, root).lastOption
          .map(readManifest(fs, root, _)).getOrElse(Seq.empty)
      }
      try {
        val out = fs.create(manifest(root, v), false) // exclusive
        try out.write((carried ++ added).mkString("", "\n", "\n")
          .getBytes(StandardCharsets.UTF_8))
        finally out.close()
        return v
      } catch {
        case _: IOException => v += 1 // version taken; retry above it
      }
    }
    v // unreachable
  }

  private def readManifest(fs: FileSystem, root: String, v: Int): Seq[String] = {
    val in = new BufferedReader(new InputStreamReader(
      fs.open(manifest(root, v)), StandardCharsets.UTF_8))
    try Iterator.continually(in.readLine()).takeWhile(_ != null)
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Read a snapshot — the latest by default, or any retained historical
    * `version` (time travel). Fails fast if the version was never
    * committed or has been [[expire]]d.
    */
  def read(spark: SparkSession, root: String,
      version: Option[Int] = None): DataFrame = {
    val fs = fsFor(spark, root)
    val v = version.orElse(versions(spark, root).lastOption).getOrElse(
      throw new NoSuchElementException(s"no snapshots at $root"))
    val files = readManifest(fs, root, v)
    require(files.nonEmpty, s"snapshot v$v of $root is empty")
    spark.read.parquet(files.map(f => new Path(root, f).toString): _*)
  }

  /** Retention: keep the newest `keepLast` manifests, drop older ones,
    * and delete every data file no retained manifest references (a file
    * written by an old Overwrite but carried forward by Appends
    * survives — reachability, not age, decides). Also sweeps files from
    * crashed commits that never published a manifest.
    */
  def expire(spark: SparkSession, root: String, keepLast: Int): Unit = {
    require(keepLast >= 1, "must retain at least the latest snapshot")
    val fs = fsFor(spark, root)
    val all = versions(spark, root)
    val (drop, keep) = all.splitAt(math.max(0, all.size - keepLast))
    val live = keep.flatMap(readManifest(fs, root, _)).toSet
    drop.foreach { v =>
      if (!fs.delete(manifest(root, v), false))
        throw new IOException(s"expire: delete of manifest v$v failed")
    }
    val dataRoot = new Path(root, "data")
    if (fs.exists(dataRoot)) {
      val it = fs.listFiles(dataRoot, true)
      while (it.hasNext) {
        val p = it.next().getPath
        val rel = s"data/${p.getParent.getName}/${p.getName}"
        if (!live.contains(rel) && !fs.delete(p, false))
          throw new IOException(s"expire: delete of $rel failed")
      }
      // drop now-empty per-commit dirs (delete(non-recursive) refuses
      // non-empty ones, so a race can't take live files with it)
      fs.listStatus(dataRoot).foreach { st =>
        if (fs.listStatus(st.getPath).isEmpty) fs.delete(st.getPath, false)
      }
    }
  }
}
