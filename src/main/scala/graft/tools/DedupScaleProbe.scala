package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.Sessions
import graft.functions.{ConnectedComponents, MinHashLsh}

/** Scale stress proof for the dedup path (VERDICT r4 item 5): synthesize
  * a k× documents corpus with CONSTANT duplicate density and measure the
  * q62/q66 LSH pipeline and the q63 SimHash pipeline as k grows.
  *
  * Corpus construction: copy i of the sf0.1 documents table prefixes
  * every token with `c{i}_` — a token-level bijection, so each copy has
  * exactly the base corpus's internal near-dup structure while sharing
  * ZERO shingles with other copies (no cross-copy band collisions by
  * construction). The q62 union-doubling then plants the usual exact
  * dups inside each copy. Result: candidates, verified pairs and
  * components all grow exactly k× — so a pipeline that is linear in
  * candidates shows ~k× wall time, and anything quadratic in corpus
  * size shows k².
  *
  * Also times the PRE-r5 q63 pairing (lang-blocked all-pairs self-join)
  * against the pigeonhole-segment rework on the same corpus — the two
  * produce identical pair sets; the probe asserts that and reports the
  * wall-time divergence (only for k ≤ oldMaxK: the old shape is the
  * quadratic one, that is the point).
  *
  * Usage: sbt "runMain graft.tools.DedupScaleProbe [sfDir] [ks] [oldMaxK]"
  * Prints one JSON line per k.
  */
object DedupScaleProbe {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ks = args.lift(1).getOrElse("1,2,4,8")
      .split(",").map(_.trim.toInt).toSeq
    val oldMaxK = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = Sessions.local("graft-dedup-scale")
    val base = graft.catalog.Tables.load(spark, dir, "documents")
      .select("doc_id", "text", "lang")

    def scaled(k: Int): DataFrame =
      (0 until k).map { i =>
        if (i == 0) base
        else base.select(
          (col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          concat_ws(" ", transform(split(col("text"), " "),
            t => concat(lit(s"c${i}_"), t))).as("text"),
          col("lang"))
      }.reduce(_ union _)

    for (k <- ks) {
      val corpus = scaled(k)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nDocs = corpus.count()

      // --- q62/q66 shape: union-double, sign, band join, verify, CC ---
      val d = corpus.select("doc_id", "text")
      val doubled = d.union(
        d.select((col("doc_id") + 1000000000L).as("doc_id"), col("text")))
      val sig = MinHashLsh.signatures(doubled)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val banded = sig.select(col("doc_id"), explode(col("bands")).as("band"))
      val pairs = banded.alias("x")
        .join(banded.alias("y"),
          col("x.band") === col("y.band") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("doc_id2"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      val (nCand, tCand) = timed(pairs.count())
      val sets = sig.select(col("doc_id"), col("sh"))
      val verified = pairs
        .join(sets, "doc_id")
        .join(sets.select(col("doc_id").as("doc_id2"), col("sh").as("sh2")),
          "doc_id2")
        .withColumn("jaccard", MinHashLsh.jaccard(col("sh"), col("sh2")))
        .filter(col("jaccard") >= 0.9)
        .select("doc_id", "doc_id2")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val (nVer, tVer) = timed(verified.count())
      val (nCc, tCc) = timed(ConnectedComponents.run(verified).count())

      // --- q63 shapes: segment-blocked (r5) vs lang-blocked (pre-r5) ---
      // Measured at TWO signature widths: the oracle-matched 16 bits
      // (where this corpus SATURATES the space — the hamming≤2 ball is a
      // constant 137/65536 fraction, so the verified OUTPUT itself grows
      // quadratically and dominates both paths), and 32 bits — the
      // production regime the q63 scaladoc names, where buckets stay
      // sparse and blocking is the difference between near-linear and n².
      // SimHash width must grow ~2·log2(n): that is a property of the
      // operator, not of the blocking.
      val toks = filter(split(col("text"), " "), t => t =!= lit(""))
      val oddHex = Seq("1", "3", "5", "7", "9", "b", "d", "f")
      def simhash(m: org.apache.spark.sql.Column, bits: Int) =
        (0 until bits).map { j =>
          val vote = aggregate(m, lit(0L), (acc, h) =>
            acc + when(substring(h, j + 1, 1)
              .isin(oddHex: _*), 1L).otherwise(-1L))
          when(vote > 0, lit(1L << j)).otherwise(lit(0L))
        }.reduce(_ + _)
      // disjoint segment covers: 3 segments ⇒ hamming ≤ 2 pigeonholes
      val segCover16 = Seq((0, 6), (6, 5), (11, 5))
      val segCover32 = Seq((0, 11), (11, 11), (22, 10))

      def run63(bits: Int, cover: Seq[(Int, Int)], runOld: Boolean)
          : (Long, Double, Long, Double) = {
        val sigs = corpus
          .select(col("doc_id"), col("lang"),
            array_distinct(toks).as("ts"))
          .withColumn("m", transform(col("ts"), t => md5(t)))
          .select(col("doc_id"), col("lang"),
            simhash(col("m"), bits).as("simhash"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        sigs.count()
        // sigs ride through the join (scalar ints, unlike q62's arrays);
        // hamming verifies inline, distinct collapses segment multiplicity
        val segs = sigs.select(col("doc_id"), col("lang"), col("simhash"),
            explode(array(
            cover.zipWithIndex.map { case ((off, w), i) =>
              struct(lit(i).as("seg_idx"),
                shiftright(col("simhash"), off)
                  .bitwiseAND(lit((1L << w) - 1)).as("seg_val"))
            }: _*)).as("seg"))
          .select(col("doc_id"), col("lang"), col("simhash"),
            col("seg.seg_idx").as("seg_idx"),
            col("seg.seg_val").as("seg_val"))
        val segPairs = segs.alias("x").join(segs.alias("y"),
            col("x.lang") === col("y.lang") &&
              col("x.seg_idx") === col("y.seg_idx") &&
              col("x.seg_val") === col("y.seg_val") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_id"),
            col("y.doc_id").as("doc_id2"),
            col("x.simhash").as("simhash"),
            col("y.simhash").as("simhash2"))
          .filter(bit_count(col("simhash").bitwiseXOR(col("simhash2"))) <= 2)
          .distinct()
        val (nSeg, tSeg) = timed(segPairs.count())
        val (nOld, tOld) = if (runOld) {
          val b = sigs.select(col("doc_id").as("doc_id2"),
            col("lang").as("lang2"), col("simhash").as("simhash2"))
          val old = sigs.join(b,
              col("lang") === col("lang2") && col("doc_id") < col("doc_id2"))
            .filter(bit_count(col("simhash").bitwiseXOR(col("simhash2"))) <= 2)
          timed(old.count())
        } else (-1L, -1.0)
        if (nOld >= 0 && nOld != nSeg)
          sys.error(s"segment/all-pairs mismatch at k=$k/$bits-bit: " +
            s"$nSeg vs $nOld")
        sigs.unpersist()
        (nSeg, tSeg, nOld, tOld)
      }

      val (nSeg16, tSeg16, _, tOld16) = run63(16, segCover16, k <= oldMaxK)
      val (nSeg32, tSeg32, _, tOld32) = run63(32, segCover32, k <= oldMaxK)

      println(s"""{"k":$k,"n_docs":$nDocs,"n_candidates":$nCand,""" +
        s""""n_verified":$nVer,"n_cc_rows":$nCc,""" +
        s""""t_candidates":${f"$tCand%.2f"},"t_verify":${f"$tVer%.2f"},""" +
        s""""t_cc":${f"$tCc%.2f"},""" +
        s""""simhash16_pairs":$nSeg16,"t16_seg":${f"$tSeg16%.2f"},""" +
        s""""t16_allpairs":${f"$tOld16%.2f"},""" +
        s""""simhash32_pairs":$nSeg32,"t32_seg":${f"$tSeg32%.2f"},""" +
        s""""t32_allpairs":${f"$tOld32%.2f"}}""")
      Seq(verified, pairs, sig, corpus).foreach(_.unpersist())
    }
    spark.stop()
  }
}
