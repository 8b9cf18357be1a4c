package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.etl.{DeltaLog, Snapshots}

/** Round-trip of the minimal `_delta_log` reader/writer against the
  * [[graft.etl.Snapshots]] semantics it feeds: the same commit sequence
  * applied through both table formats must read identically at every
  * version (Delta versions are 0-based, Snapshots 1-based), with Delta's
  * log carrying DELTAS (adds + removes) rather than full manifests.
  */
class DeltaLogSpec extends SparkSpecBase {

  private def df(ids: Long*) = {
    val s = spark
    import s.implicits._
    ids.toDF("id").withColumn("v", col("id") * 10)
  }

  private def rows(d: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    d.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

  test("delta commits read identically to snapshot commits at every version") {
    val dRoot = Files.createTempDirectory("delta").toString
    val sRoot = Files.createTempDirectory("snap").toString
    val steps = Seq(
      (df(1L, 2L), DeltaLog.Overwrite, Snapshots.Overwrite),
      (df(3L), DeltaLog.Append, Snapshots.Append),
      (df(7L, 8L, 9L), DeltaLog.Overwrite, Snapshots.Overwrite),
      (df(10L), DeltaLog.Append, Snapshots.Append))
    steps.foreach { case (d, dm, sm) =>
      DeltaLog.commit(d, dRoot, dm)
      Snapshots.commit(d, sRoot, sm)
    }
    assert(DeltaLog.versions(spark, dRoot) === Seq(0L, 1L, 2L, 3L))
    // version-by-version parity (delta v = snapshot v+1)
    (0L to 3L).foreach { v =>
      assert(rows(DeltaLog.read(spark, dRoot, Some(v))) ===
        rows(Snapshots.read(spark, sRoot, Some(v.toInt + 1))),
        s"divergence at delta version $v")
    }
    // latest-read default and the final state
    assert(rows(DeltaLog.read(spark, dRoot)) ===
      Seq((7L, 70L), (8L, 80L), (9L, 90L), (10L, 100L)))
    // the overwrite commit is a DELTA: it must log removes for the files
    // live at v1, not re-list survivors manifest-style
    val v2 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        s"$dRoot/_delta_log/${"%020d".format(2L)}.json")))
    assert(v2.contains("\"remove\""), v2.take(300))
    assert(v2.linesIterator.count(_.contains("\"remove\"")) ===
      DeltaLog.activeFiles(spark, dRoot, Some(1L)).size)
  }

  test("reader replays a hand-written log with foreign actions and removes") {
    val root = Files.createTempDirectory("delta2").toString
    // data files via the writer, but logs authored by hand in the shape a
    // real Delta writer emits (protocol + metaData + commitInfo lines)
    DeltaLog.commit(df(1L, 2L), root, DeltaLog.Overwrite)
    val files0 = DeltaLog.activeFiles(spark, root, Some(0L))
    DeltaLog.commit(df(5L), root, DeltaLog.Append)
    val files1 = DeltaLog.activeFiles(spark, root, Some(1L))
    val newFile = (files1.toSet -- files0.toSet).head
    // v2: hand-written — remove the v1 append, with noise actions around
    java.nio.file.Files.write(
      java.nio.file.Paths.get(
        s"$root/_delta_log/${"%020d".format(2L)}.json"),
      (s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""" +
        "\n" +
        s"""{"metaData":{"id":"t","format":{"provider":"parquet"}}}""" +
        "\n" +
        s"""{"remove":{"path":"$newFile","dataChange":true}}""" + "\n" +
        s"""{"commitInfo":{"operation":"DELETE"}}""" + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(rows(DeltaLog.read(spark, root, Some(2L))) ===
      Seq((1L, 10L), (2L, 20L)))
    assert(rows(DeltaLog.read(spark, root, Some(1L))) ===
      Seq((1L, 10L), (2L, 20L), (5L, 50L)))
  }

  test("version-gap and empty-root reads fail fast") {
    val root = Files.createTempDirectory("delta3").toString
    intercept[NoSuchElementException](DeltaLog.read(spark, root))
    DeltaLog.commit(df(1L), root, DeltaLog.Overwrite)
    // fabricate a gap: v2 without v1
    DeltaLog.commit(df(2L), root, DeltaLog.Append)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$root/_delta_log/${"%020d".format(1L)}.json"),
      java.nio.file.Paths.get(s"$root/_delta_log/${"%020d".format(2L)}.json"))
    intercept[IllegalArgumentException](DeltaLog.read(spark, root))
  }
}
