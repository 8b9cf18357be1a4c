package graft

import org.apache.spark.sql.functions._
import graft.catalog.Tables

/** q286 BPE merge induction vs an independent JVM trainer: classic
  * Sennrich BPE over the word-frequency table (with the q286 self-pair
  * exclusion), greedy merge application replayed sequentially — the
  * distributed pair-count/argmax/apply rounds must learn the identical
  * merge table, and best-pair counts must be non-increasing (a merge can
  * only hide occurrences, never create a pair more frequent than its
  * parents).
  */
class BpeSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("q286 merges equal a sequential JVM BPE trainer; counts decrease") {
    val wordFreq = Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("f"))
      .collect().map(r => (r.getString(0), r.getLong(1)))

    var vocab: Seq[(Vector[String], Long)] =
      wordFreq.map { case (w, f) => (w.split("").toVector, f) }.toSeq
    val expected = (1 to 4).map { r =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1
           if syms(i) != syms(i + 1))
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      val ((a, b), cnt) = counts.toSeq
        .minBy { case ((x, y), c) => (-c, x, y) }
      vocab = vocab.map { case (syms, f) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        (out.result(), f)
      }
      (r, a, b, cnt)
    }

    val got = SparkEntry.queries("q286_bpe_merges")(spark, sf)
      .collect()
      .map(x => (x.getInt(0), x.getString(1), x.getString(2), x.getLong(3)))
      .toSeq
    assert(got === expected)
    val cnts = got.map(_._4)
    assert(cnts == cnts.sorted.reverse, s"best-pair counts must not rise: $cnts")
    assert(cnts.head > 1, "fixture must exercise real merges")
  }

  test("q293 greedy merges equal the JVM trainer WITH self-pairs") {
    val wordFreq = Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("f"))
      .collect().map(r => (r.getString(0), r.getLong(1)))

    var vocab: Seq[(Vector[String], Long)] =
      wordFreq.map { case (w, f) => (w.split("").toVector, f) }.toSeq
    val expected = (1 to 4).map { r =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      // full Sennrich: self-pairs count too (overlapping occurrences)
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      val ((a, b), cnt) = counts.toSeq
        .minBy { case ((x, y), c) => (-c, x, y) }
      vocab = vocab.map { case (syms, f) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2 // greedy: consumed pair can't chain
          } else { out += syms(i); i += 1 }
        }
        (out.result(), f)
      }
      (r, a, b, cnt)
    }

    val got = SparkEntry.queries("q293_bpe_greedy")(spark, sf)
      .collect()
      .map(x => (x.getInt(0), x.getString(1), x.getString(2), x.getLong(3)))
      .toSeq
    assert(got === expected)
  }

  test("greedy apply run-parity form: canonical self-pair fixtures") {
    val s = spark
    import s.implicits._
    // (word, merge-a, merge-b, expected greedy segmentation)
    val cases = Seq(
      ("aaaa", "a", "a", Seq("aa", "aa")),
      ("aaa", "a", "a", Seq("aa", "a")),
      ("aaaaa", "a", "a", Seq("aa", "aa", "a")),
      ("baaab", "a", "a", Seq("b", "aa", "a", "b")),
      ("abab", "a", "b", Seq("ab", "ab")),
      ("aab", "a", "b", Seq("a", "ab")),
      ("aba", "b", "a", Seq("a", "ba")),
      ("xyx", "a", "a", Seq("x", "y", "x")))
    for ((w, a, b, exp) <- cases) {
      val out = Seq(w).toDF("w")
        .select(graft.queries.TextPack.applyMergeGreedy(
          split(col("w"), ""), lit(a), lit(b)).as("syms"))
        .collect().head.getSeq[String](0)
      assert(out === exp, s"greedy($w, $a+$b)")
    }
  }

  test("q287 compression curve: tokens constant, subwords strictly shrink") {
    val rows = SparkEntry.queries("q287_bpe_compression")(spark, sf)
      .collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getLong(2), x.getLong(3)))
      .toSeq
    assert(rows.map(_._1) === (1 to 4))
    // corpus token count is invariant under merging
    assert(rows.map(_._3).distinct.size === 1)
    // every merge round removes exactly best-count subword occurrences
    val merges = SparkEntry.queries("q286_bpe_merges")(spark, sf)
      .collect().map(_.getLong(3)).toSeq
    val subwords = rows.map(_._4)
    assert(subwords.zip(subwords.tail).zip(merges.tail).forall {
      case ((prev, next), cnt) => prev - next == cnt
    }, s"round r+1 must remove exactly its merge count: $subwords vs $merges")
    // the subword-type count can grow by at most 1 per round (the new
    // merged symbol) and never exceeds chars + rounds
    val types = rows.map(_._2)
    assert(types.zip(types.tail).forall { case (a, b) => b <= a + 1 })
  }

  test("q306 encode join-back conserves q287's corpus totals per source") {
    // the vocab-grain encode (per-source word counts × trained subword
    // lengths) must reassemble EXACTLY the final-round corpus totals —
    // the partition-of-the-corpus identity that proves the dim-table
    // apply equals replaying the merges over every document
    val enc = SparkEntry.queries("q306_bpe_encode")(spark, sf).collect()
    val last = SparkEntry.queries("q287_bpe_compression")(spark, sf)
      .orderBy(org.apache.spark.sql.functions.col("round").desc)
      .limit(1).collect()(0)
    assert(enc.map(_.getAs[Long]("tokens")).sum ===
      last.getAs[Long]("corpus_tokens"), "token conservation across sources")
    assert(enc.map(_.getAs[Long]("subwords")).sum ===
      last.getAs[Long]("corpus_subwords"), "subword conservation")
    // fertility is a proper average: between the per-source extremes
    val f = enc.map(_.getAs[Long]("fertility_micro"))
    val corpusF = last.getAs[Long]("subwords_per_token_micro")
    assert(corpusF >= f.min && corpusF <= f.max,
      s"corpus fertility $corpusF outside per-source band [${f.min}, ${f.max}]")
    // every source accounted for
    assert(enc.map(_.getAs[Long]("n_docs")).sum ===
      graft.catalog.Tables.load(spark, sf, "documents").count())
  }
}
