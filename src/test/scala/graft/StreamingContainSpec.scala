package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{ContainStream, SetSimStream}
import graft.streaming.ContainStream.ContainRow
import graft.streaming.SetSimStream.PrefixRow
import scala.util.hashing.MurmurHash3

/** Batch parity for the streaming containment and overlap-threshold
  * miners: over any micro-batch split (redelivery included), the
  * emitted pair multiset must equal the BATCH
  * SetSimilarityJoinBlocking result of the naive join on the same
  * corpus — each ordered (sub, sup) pair exactly once (containment),
  * each unordered pair exactly once (overlap). */
class StreamingContainSpec extends SparkSpecBase {

  /** Hashed token corpora with PLANTED subset chains (prefix subsets
    * of every 3rd doc), equal-set twins, all-duplicate and
    * single-token edges — non-empty throughout (∅ is the documented
    * out-of-scope branch). */
  private def docs: Seq[(Long, Seq[String])] = {
    val bases = (0 until 40).map { i =>
      val n = 3 + math.abs(MurmurHash3.stringHash("c" + i)) % 5
      (0 until n).map(p =>
        "w" + math.abs(MurmurHash3.productHash((i, p))) % 25)
    }
    val subsets = bases.zipWithIndex.collect { case (t, i) if i % 3 == 0 =>
      t.distinct.sorted.take(math.max(1, t.distinct.size - 1))
    }
    val twins = bases.take(2) // equal sets under distinct
    val edges = Seq(Seq("w7"), Seq("w7", "w7", "w7"), Seq("w7", "w8"))
    (bases ++ subsets ++ twins ++ edges).zipWithIndex.map {
      case (t, i) => (i.toLong, t)
    }
  }

  private def corpus = {
    val s = spark
    import s.implicits._
    docs.map { case (i, ts) => (i, ts.mkString(" ")) }.toDF("id", "s")
      .select(col("id"), split(col("s"), " ").as("toks"))
  }

  test("streaming containment pairs equal the batch rule, exactly once") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val df = corpus
    val a = df.select(col("id").as("a"), col("toks").as("ta"))
    val b = df.select(col("id").as("b"), col("toks").as("tb"))
    val joined = a.join(b,
      size(array_except(col("ta"), col("tb"))) === 0 &&
        col("a") =!= col("b"))
      .select(col("a"), col("b"))
    assert(joined.queryExecution.executedPlan.toString
      .contains("graft_sst"))
    val expected = joined.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(expected.nonEmpty, "fixture must plant subset chains")

    val rows: Seq[ContainRow] = docs.flatMap { case (id, ts) =>
      ContainStream.tokenRows(id, ts)
    }
    val mem = MemoryStream[ContainRow]
    val q = ContainStream.pairsWithState(mem.toDS())
      .writeStream.format("memory").queryName("contain_pairs")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, rest) = rows.splitAt(rows.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      // at-least-once: redelivered (token, doc) rows must not re-pair
      mem.addData((b2.take(b2.size / 3) ++ b3): _*)
      q.processAllAvailable()
      val streamed = s.table("contain_pairs").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(streamed.sorted === expected,
        "ordered (sub, sup) multiset must equal the batch rule's bag")
    } finally q.stop()
  }

  test("streaming overlap-threshold pairs equal the batch rule") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val t = 3
    val df = corpus
    val a = df.select(col("id").as("a"), col("toks").as("ta"))
    val b = df.select(col("id").as("b"), col("toks").as("tb"))
    val joined = a.join(b,
      size(array_intersect(col("ta"), col("tb"))) >= t &&
        col("a") < col("b"))
      .select(col("a"), col("b"),
        size(array_intersect(col("ta"), col("tb"))).as("c"))
    assert(joined.queryExecution.executedPlan.toString
      .contains("graft_sst"))
    val expected = joined.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    assert(expected.nonEmpty)

    val rows: Seq[PrefixRow] = docs.flatMap { case (id, ts) =>
      SetSimStream.overlapRows(id, ts, t)
    }
    val mem = MemoryStream[PrefixRow]
    val q = SetSimStream.overlapPairsWithState(mem.toDS(), t)
      .writeStream.format("memory").queryName("overlap_pairs")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, b2) = rows.splitAt(rows.size / 2)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData((b1.takeRight(5) ++ b2): _*) // redelivery overlap
      q.processAllAvailable()
      val streamed = s.table("overlap_pairs").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
      assert(streamed.sorted === expected)
    } finally q.stop()
  }
}
