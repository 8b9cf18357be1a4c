package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Sessions
import graft.functions.Vectors

/** Norm-band composition proof for CosineJoinBlocking's RAW-DOT path
  * (VERDICT r9 #5): on UNNORMALIZED vectors (norms spread ~0.5–1.5×
  * by a per-id deterministic scale), SRP blocks by angle only, so
  * high-dot pairs reached via large norms at middling angles are
  * exactly the ones the hamming ball misses. With
  * `spark.graft.srpjoin.maxNorm = M` (computed here from the data, as
  * a user's stats job would) the rule ANDs the implied
  * |‖a‖−‖b‖| ≤ M − τ/M band, which BandJoinBlocking tiles alongside
  * the hamming segments. The probe runs four arms over the same naive
  * text `graft_dot(v, v2) ≥ τ ∧ id < id2`:
  *
  *   - naive (conf off) — the exact truth;
  *   - m = 3, no band — the baseline contract;
  *   - m = 4, no band — the wider ball alone: more recall, more
  *     candidates (slower);
  *   - m = 4 + band — the composition: the band prunes the large-norm
  *     candidate mass the wider ball admitted, buying the extra
  *     recall back at ≈ the m = 3 budget (time as the budget proxy).
  *
  * With M ≥ the true max norm the band is IMPLIED by the original
  * predicate, so each banded arm's output is asserted EQUAL to its
  * unbanded arm's output (same contract set — the band only prunes
  * candidates), and every arm ⊆ naive (exact precision).
  *
  * Usage: sbt "runMain graft.tools.SrpNormBandProbe [sfDir] [ks]
  * [naiveMaxK] [tau]". Prints one JSON line per k.
  */
object SrpNormBandProbe {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val ks = args.lift(1).getOrElse("1,2,4")
      .split(",").map(_.trim.toInt).toSeq
    val naiveMaxK = args.lift(2).map(_.toInt).getOrElse(4)
    val tau = args.lift(3).map(_.toDouble).getOrElse(0.9)
    val spark = Sessions.local("graft-srp-normband")

    val raw = graft.catalog.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val dims = 64
    // twins planted at LARGE-norm ids (id % 100 = 95 ⇒ scale 1.45):
    // the tight-τ regime (τ near M², where the band is narrow) must
    // contain real pairs, or its recall is unmeasurable
    val withTwins = raw.unionAll(
      raw.filter(col("vec_id") % 100 === 95)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          concat(array(col("v")(0) + lit(0.1)),
            slice(col("v"), 2, dims - 1)).as("v")))
    // UNNORMALIZED: per-id deterministic scale in [0.5, 1.5)
    val base = withTwins.select(col("vec_id"),
      transform(col("v"), x =>
        x * (lit(0.5) + pmod(col("vec_id"), lit(100)) / lit(100.0)))
        .as("v"))

    def scaled(k: Int): DataFrame =
      (0 until k).map { i =>
        base.select((col("vec_id") + lit(i * 10000000L)).as("id"),
          zip_with(col("v"),
            transform(sequence(lit(0), lit(dims - 1)),
              d => pmod(hash(lit(i), d), lit(2)) * 2 - 1),
            (x, s) => x * s.cast("double")).as("v"))
      }.reduce(_ unionAll _)

    val segC = "spark.graft.srpjoin.segments"
    val bitC = "spark.graft.srpjoin.bits"
    val nrmC = "spark.graft.srpjoin.maxNorm"

    for (k <- ks) {
      val d = scaled(k)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = d.count()
      // the user's stats job: the corpus max norm, rounded up a hair
      val maxNorm = d.agg(max(sqrt(Vectors.dot(col("v"), col("v")))))
        .collect().head.getDouble(0) + 1e-9
      val b = d.select(col("id").as("id2"), col("v").as("v2"))
      def pairs(): Set[(Long, Long)] =
        d.join(b, Vectors.dot(col("v"), col("v2")) >= lit(tau) &&
            col("id") < col("id2"))
          .select(col("id"), col("id2")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      def arm(m: Int, band: Boolean): (Set[(Long, Long)], Double) = {
        spark.conf.set(segC, m.toString)
        spark.conf.set(bitC, "24")
        if (band) spark.conf.set(nrmC, maxNorm.toString)
        try timed(pairs())
        finally { spark.conf.unset(segC); spark.conf.unset(bitC)
          spark.conf.unset(nrmC) }
      }

      val (p3, t3) = arm(3, band = false)
      val (p3b, t3b) = arm(3, band = true)
      val (p4, t4) = arm(4, band = false)
      val (p4b, t4b) = arm(4, band = true)
      require(p3b == p3, s"k=$k: band changed the m=3 contract output")
      require(p4b == p4, s"k=$k: band changed the m=4 contract output")
      val (naive, tN) = if (k <= naiveMaxK) timed(pairs())
        else (null, -1.0)
      if (naive != null) {
        require(p4.subsetOf(naive), s"k=$k: precision broken")
        require(p3.subsetOf(p4), s"k=$k: wider ball lost pairs")
      }
      def rec(p: Set[(Long, Long)]) =
        if (naive == null || naive.isEmpty) -1.0
        else p.size.toDouble / naive.size
      println(s"""{"k":$k,"rows":$n,"tau":$tau,""" +
        s""""maxNorm":${f"$maxNorm%.3f"},""" +
        s""""m3":{"pairs":${p3.size},"recall":${f"${rec(p3)}%.4f"},""" +
        s""""sec":${f"$t3%.2f"},"band_sec":${f"$t3b%.2f"}},""" +
        s""""m4":{"pairs":${p4.size},"recall":${f"${rec(p4)}%.4f"},""" +
        s""""sec":${f"$t4%.2f"},"band_sec":${f"$t4b%.2f"}},""" +
        s""""naive_pairs":${if (naive == null) -1 else naive.size},""" +
        s""""naive_sec":${f"$tN%.2f"}}""")
      d.unpersist()
    }
    spark.stop()
  }
}
