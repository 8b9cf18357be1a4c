package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EdStream
import graft.streaming.EdStream.EdRow
import scala.util.hashing.MurmurHash3

/** Batch parity for the streaming PassJoin segment-bucket fuzzy miner:
  * over any micro-batch split (redelivery included), the emitted pair
  * multiset must equal the BATCH EditDistanceJoinBlocking result of
  * the naive `levenshtein ≤ k` self-join on the same corpus — each
  * pair EXACTLY once (the first-matching-combo canonical as a
  * state-side check).
  */
class StreamingEdSpec extends SparkSpecBase {

  private val k = 2

  private def strings: Seq[(Long, String)] = {
    val alpha = "abcde"
    def ch(i: Int, p: Int): Char =
      alpha(math.abs(MurmurHash3.productHash((i, p))) % alpha.length)
    val bases = (0 until 50).map { i =>
      val n = 6 + math.abs(MurmurHash3.stringHash("t" + i)) % 8
      (0 until n).map(p => ch(i, p)).mkString
    }
    val perturbed = bases.zipWithIndex.map { case (s, i) =>
      val pos = math.abs(MurmurHash3.stringHash("q" + i)) % s.length
      i % 3 match {
        case 0 => s.substring(0, pos) + s.substring(pos + 1)
        case 1 => s.updated(pos, if (s(pos) == 'a') 'b' else 'a')
        case _ => s.substring(0, pos) + "z" + s.substring(pos)
      }
    }
    val edges = Seq("", "a", "ab", "ba", "b")
    (bases ++ perturbed ++ edges).zipWithIndex.map { case (s, i) =>
      (i.toLong, s)
    }
  }

  /** The BATCH rule's answer (the naive spelling through the engine). */
  private def batchPairs: Seq[(Long, Long, Int)] = {
    val s = spark
    import s.implicits._
    val df = strings.toDF("id", "str")
    val a = df.select(col("id").as("a"), col("str").as("sa"))
    val b = df.select(col("id").as("b"), col("str").as("sb"))
    val joined = a.join(b,
      levenshtein(col("sa"), col("sb")) <= k && col("a") < col("b"))
      .select(col("a"), col("b"),
        levenshtein(col("sa"), col("sb")).as("d"))
    assert(joined.queryExecution.executedPlan.toString
      .contains("graft_edp"))
    joined.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
  }

  test("streaming segment-bucket fuzzy pairs equal the batch rule, exactly once") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val expected = batchPairs
    assert(expected.nonEmpty, "fixture must plant fuzzy matches")
    val rows: Seq[EdRow] = strings.flatMap { case (id, st) =>
      EdStream.rows(id, st, k)
    }
    val mem = MemoryStream[EdRow]
    val q = EdStream.pairsWithState(mem.toDS(), k)
      .writeStream.format("memory").queryName("ed_pairs")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, rest) = rows.splitAt(rows.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      // at-least-once: redelivered rows must not re-pair
      mem.addData((b2.take(b2.size / 3) ++ b3): _*); q.processAllAvailable()
      val streamed = s.table("ed_pairs").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
      assert(streamed.sorted === expected,
        "pair MULTISET must equal the batch rule's bag exactly once each")
    } finally q.stop()
  }
}
