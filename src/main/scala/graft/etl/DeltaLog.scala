package graft.etl

import java.io.{BufferedReader, InputStreamReader, IOException}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal Delta-format transaction log (`_delta_log/NNN.json`) reader and
  * writer, feeding the same read path as [[Snapshots]] — closes the
  * "Parquet/Delta" wording of the reference's storage layer with the
  * actual on-disk log protocol rather than the [[Snapshots]] manifest
  * files. Protocol subset per the public Delta PROTOCOL.md:
  *
  *   - commit v = `_delta_log/%020d.json` — newline-delimited JSON
  *     actions; versions start at 0 and must be contiguous,
  *   - `add.path` / `remove.path` actions accumulate the active file
  *     set: snapshot at v = fold of commits 0..v (remove drops a path,
  *     add (re)inserts it),
  *   - `metaData` / `protocol` / `commitInfo` actions are recognized and
  *     skipped (this reader resolves files; schema comes from parquet).
  *
  * Deliberately out of scope (documented, not hidden): parquet
  * checkpoints (`_last_checkpoint`) — a reader at 100 TB replays the
  * checkpoint plus the JSON tail instead of the full log; deletion
  * vectors; column mapping. The log-replay semantics — the part that
  * differs from [[Snapshots]]' full-manifest-per-version model — are
  * faithful: Delta commits are DELTAS, so Append writes only its adds
  * (no carried file list) and Overwrite writes removes for every live
  * file plus its adds. [[Snapshots]] reads are O(1 manifest); Delta
  * reads are O(log length) without checkpoints — exactly the trade the
  * two formats make.
  *
  * Writes publish with the same create-exclusive primitive as
  * [[Snapshots.commit]] (optimistic concurrency on the version file
  * name), and data files land before the log entry — a crash leaves
  * unreferenced files, never a corrupt table.
  */
object DeltaLog {

  sealed trait Mode
  case object Overwrite extends Mode
  case object Append extends Mode

  private def logDir(root: String) = new Path(root, "_delta_log")

  private def logFile(root: String, v: Long) =
    new Path(logDir(root), f"$v%020d.json")

  private def fsFor(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed versions, ascending (empty for a fresh root). */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val fs = fsFor(spark, root)
    val dir = logDir(root)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.matches("\\d{20}\\.json") =>
        n.stripSuffix(".json").toLong }
      .sorted
  }

  // --- minimal action-line parsing ----------------------------------------
  // An action line is a JSON object with ONE top-level action key. Only
  // add/remove carry a path we need; the extractor finds the first
  // `"path":"…"` inside the action and unescapes the JSON string subset
  // our writer (and Delta's) produces for file names.
  private val AddRe = """^\s*\{\s*"add"\s*:""".r
  private val RemoveRe = """^\s*\{\s*"remove"\s*:""".r
  private val PathRe = """"path"\s*:\s*"((?:[^"\\]|\\.)*)"""".r

  private def unescape(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => b.append('"'); i += 2
          case '\\' => b.append('\\'); i += 2
          case '/' => b.append('/'); i += 2
          case 'n' => b.append('\n'); i += 2
          case 't' => b.append('\t'); i += 2
          case 'u' =>
            b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case other => b.append(other); i += 2
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  private def pathOf(line: String): String =
    PathRe.findFirstMatchIn(line)
      .map(m => unescape(m.group(1)))
      .getOrElse(throw new IOException(
        s"delta action without a path: ${line.take(120)}"))

  private def readLines(fs: FileSystem, p: Path): Seq[String] = {
    val in = new BufferedReader(new InputStreamReader(
      fs.open(p), StandardCharsets.UTF_8))
    try Iterator.continually(in.readLine()).takeWhile(_ != null)
      .filter(_.trim.nonEmpty).toList
    finally in.close()
  }

  /** Active data-file paths (relative to root) at `version` — the log
    * replay. Fails fast on a version gap (no checkpoint support).
    */
  def activeFiles(spark: SparkSession, root: String,
      version: Option[Long] = None): Seq[String] = {
    val fs = fsFor(spark, root)
    val all = versions(spark, root)
    val v = version.orElse(all.lastOption).getOrElse(
      throw new NoSuchElementException(s"no delta log at $root"))
    val replay = all.takeWhile(_ <= v)
    require(replay.nonEmpty && replay.head == 0L &&
      replay.last == v && replay.size == v + 1,
      s"delta log at $root is not contiguous 0..$v (got $replay)")
    // LinkedHashSet: active-set semantics with deterministic (insertion)
    // order, so the parquet read plans the same file order every run
    val active = scala.collection.mutable.LinkedHashSet.empty[String]
    replay.foreach { cv =>
      readLines(fs, logFile(root, cv)).foreach { line =>
        if (RemoveRe.findFirstIn(line).isDefined) active -= pathOf(line)
        else if (AddRe.findFirstIn(line).isDefined) active += pathOf(line)
        // metaData / protocol / commitInfo: skipped
      }
    }
    active.toSeq
  }

  /** Read the table — latest version by default, or any historical
    * `version` (time travel), resolved purely from the `_delta_log`.
    */
  def read(spark: SparkSession, root: String,
      version: Option[Long] = None): DataFrame = {
    val files = activeFiles(spark, root, version)
    require(files.nonEmpty, s"delta snapshot of $root is empty")
    spark.read.parquet(files.map(f => new Path(root, f).toString): _*)
  }

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Commit `df` at the next version; returns the committed version.
    * Append logs only its adds; Overwrite logs a remove per previously
    * live file plus its adds (the delta-not-manifest contract).
    */
  def commit(df: DataFrame, root: String, mode: Mode): Long = {
    val spark = df.sparkSession
    val fs = fsFor(spark, root)
    val dataDir = new Path(root,
      "data/" + java.util.UUID.randomUUID.toString)
    df.write.parquet(dataDir.toString)
    val added = fs.listStatus(dataDir).toSeq
      .map(_.getPath)
      .filter(_.getName.startsWith("part-"))
      .map(p => s"data/${dataDir.getName}/${p.getName}")
    var v = versions(spark, root).lastOption.map(_ + 1).getOrElse(0L)
    while (true) {
      val removed = mode match {
        case Append => Seq.empty
        case Overwrite =>
          if (v == 0) Seq.empty
          else activeFiles(spark, root, Some(v - 1))
      }
      val lines =
        Seq(s"""{"commitInfo":{"operation":"${
          if (mode == Append) "WRITE" else "OVERWRITE"}"}}""") ++
        removed.map(p =>
          s"""{"remove":{"path":"${esc(p)}","dataChange":true}}""") ++
        added.map(p =>
          s"""{"add":{"path":"${esc(p)}","dataChange":true}}""")
      try {
        val out = fs.create(logFile(root, v), false) // exclusive
        try out.write(lines.mkString("", "\n", "\n")
          .getBytes(StandardCharsets.UTF_8))
        finally out.close()
        return v
      } catch {
        case _: IOException => v += 1 // lost the race; retry above
      }
    }
    v // unreachable
  }
}
