package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.SetSimStream
import graft.streaming.SetSimStream.PrefixRow
import scala.util.hashing.MurmurHash3

/** Batch parity for the streaming prefix-bucket Jaccard miner: over
  * any micro-batch split (redelivery included), the emitted pair
  * multiset must equal the BATCH SetSimilarityJoinBlocking result of
  * the naive ÷-spelling join on the same corpus — each pair EXACTLY
  * once (the minimal-common-token canonical as a state-side check) —
  * with bit-equal Jaccard doubles.
  */
class StreamingSetSimSpec extends SparkSpecBase {

  private val s08 = 0.8

  /** Hashed token corpora with planted near-identical twins and
    * duplicate-laden / tiny edges — the SetSimilarityRuleSpec recipe
    * over string tokens. */
  private def docs: Seq[(Long, Seq[String])] = {
    val bases = (0 until 50).map { i =>
      val n = 6 + math.abs(MurmurHash3.stringHash("d" + i)) % 5
      (0 until n).map(p =>
        "w" + math.abs(MurmurHash3.productHash((i, p))) % 30)
    }
    val twins = bases.zipWithIndex.collect { case (t, i) if i % 4 == 0 =>
      t :+ "w99"
    }
    val edges = Seq(Seq("w7"), Seq("w7", "w8"), Seq("w8", "w7", "w7"))
    (bases ++ twins ++ edges).zipWithIndex.map { case (t, i) =>
      (i.toLong, t)
    }
  }

  /** The BATCH rule's answer on the same corpus (the naive ÷ spelling
    * through the engine — the rule plans it; this IS the twin target,
    * not an in-spec model). */
  private def batchPairs: Seq[(Long, Long, Double)] = {
    val s = spark
    import s.implicits._
    val df = docs.map { case (i, ts) => (i, ts.mkString(" ")) }
      .toDF("id", "s")
      .select(col("id"), split(col("s"), " ").as("toks"))
    val a = df.select(col("id").as("a"), col("toks").as("ta"))
    val b = df.select(col("id").as("b"), col("toks").as("tb"))
    val joined = a.join(b,
      try_divide(size(array_intersect(col("ta"), col("tb"))),
        size(array_union(col("ta"), col("tb")))) >= s08 &&
        col("a") < col("b"))
      .select(col("a"), col("b"),
        try_divide(size(array_intersect(col("ta"), col("tb"))),
          size(array_union(col("ta"), col("tb")))).as("j"))
    assert(joined.queryExecution.executedPlan.toString
      .contains("graft_sst"))
    joined.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sorted
  }

  test("streaming prefix-bucket pairs equal the batch rule, exactly once") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val expected = batchPairs
    assert(expected.nonEmpty, "fixture must plant near-dups")
    val rows: Seq[PrefixRow] = docs.flatMap { case (id, ts) =>
      SetSimStream.prefixRows(id, ts, s08)
    }
    val mem = MemoryStream[PrefixRow]
    val q = SetSimStream.pairsWithState(mem.toDS(), s08)
      .writeStream.format("memory").queryName("setsim_pairs")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, rest) = rows.splitAt(rows.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      // at-least-once: redelivered (token, doc) rows must not re-pair
      mem.addData((b2.take(b2.size / 3) ++ b3): _*); q.processAllAvailable()
      val streamed = s.table("setsim_pairs").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(streamed.sorted === expected,
        "pair MULTISET must equal the batch rule's bag — exactly once " +
          "each, bit-equal jaccard")
    } finally q.stop()
  }
}
