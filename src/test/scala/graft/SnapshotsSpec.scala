package graft

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.Snapshots
import graft.etl.Snapshots.{Append, Overwrite}

/** Manifest-versioned tables ([[graft.etl.Snapshots]]): time travel,
  * append lineage, create-exclusive commit retry, and
  * reachability-based retention.
  */
class SnapshotsSpec extends SparkSpecBase {

  private def ids(root: String, v: Option[Int] = None): Seq[Long] =
    Snapshots.read(spark, root, v)
      .collect().map(_.getLong(0)).toSeq.sorted

  test("commit/read: overwrite replaces, append stacks, history stays") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("snap").toString

    val v1 = Snapshots.commit(Seq(1L, 2L, 3L).toDF("id"), root, Overwrite)
    val v2 = Snapshots.commit(Seq(4L, 5L).toDF("id"), root, Append)
    val v3 = Snapshots.commit(Seq(9L).toDF("id"), root, Overwrite)
    assert(Seq(v1, v2, v3) === Seq(1, 2, 3))
    assert(Snapshots.versions(spark, root) === Seq(1, 2, 3))

    assert(ids(root) === Seq(9L)) // latest
    assert(ids(root, Some(2)) === Seq(1L, 2L, 3L, 4L, 5L)) // time travel
    assert(ids(root, Some(1)) === Seq(1L, 2L, 3L))
  }

  test("colliding version is skipped, not clobbered") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("snap").toString
    Snapshots.commit(Seq(1L).toDF("id"), root, Overwrite)

    // another writer has already published v2: our commit must land at v3
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new Path(root, "_snapshots/v00002.txt"), false).close()

    val v = Snapshots.commit(Seq(7L).toDF("id"), root, Overwrite)
    assert(v === 3)
    assert(ids(root, Some(3)) === Seq(7L))
    assert(ids(root, Some(1)) === Seq(1L)) // v1 untouched
  }

  test("expire keeps files any retained manifest reaches") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("snap").toString
    Snapshots.commit(Seq(1L, 2L).toDF("id"), root, Overwrite) // v1
    Snapshots.commit(Seq(3L).toDF("id"), root, Append) // v2 carries v1 files
    Snapshots.commit(Seq(8L).toDF("id"), root, Overwrite) // v3

    Snapshots.expire(spark, root, keepLast = 2)
    assert(Snapshots.versions(spark, root) === Seq(2, 3))
    // v2 still reads v1's physical files — reachability kept them alive
    assert(ids(root, Some(2)) === Seq(1L, 2L, 3L))
    assert(ids(root, Some(3)) === Seq(8L))
    intercept[Exception] { ids(root, Some(1)) }

    // dropping history to latest-only finally frees v1/v2 data
    Snapshots.expire(spark, root, keepLast = 1)
    assert(Snapshots.versions(spark, root) === Seq(3))
    assert(ids(root, Some(3)) === Seq(8L))
    intercept[Exception] { ids(root, Some(2)) }
  }
}
