package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Vectors
import graft.queries.SimilarityPack

/** Algorithmic invariant for the Lloyd iteration behind q75/q84: total
  * inertia (Σ per-vector min squared distance to its nearest centroid)
  * never increases across rounds — both half-steps (re-assignment,
  * centroid mean recompute) are monotone. Oracle agreement on one data
  * shape is not algorithm correctness (STATUS r2 lesson); this pins the
  * algorithm itself.
  */
class KMeansSpec extends SparkSpecBase {

  test("Lloyd rounds never increase inertia") {
    val s = spark
    val e = graft.catalog.Tables
      .load(s, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

    def inertia(cent: DataFrame): Double =
      e.join(broadcast(cent), lit(true))
        .withColumn("d2", Vectors.sqDist(col("v"), col("cv")))
        .groupBy("vec_id").agg(min("d2").as("m"))
        .agg(sum("m")).head.getDouble(0)

    var cent = e.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cluster"), col("v").as("cv"))
      .localCheckpoint()
    var prev = inertia(cent)
    (1 to 3).foreach { round =>
      cent = SimilarityPack.recompute(SimilarityPack.assign(e, cent))
        .localCheckpoint()
      val cur = inertia(cent)
      assert(cur <= prev + 1e-9, s"round $round: $prev -> $cur")
      prev = cur
    }
  }

  test("PQ ADC picks beat random by true-dot percentile rank") {
    // lossy-compression sanity for q168 that oracle equality can't
    // express: a 4-subspace × 4-code codebook is VERY coarse, so per-query
    // guarantees are weak — but each top-1 pick must clear the bottom
    // third of its query's true-dot distribution, and on average the
    // picks must land well into the top half (measured: mean ≈ 0.82,
    // min ≈ 0.50 at sf0.001)
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val adc = SparkEntry.queries("q168_pq_adc")(s, dir)
      .filter(col("rank") === 1)
      .select(col("q_id"), col("neighbor_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val vecs = graft.catalog.Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val ranks = for ((q, n) <- adc) yield {
      val dots = vecs.collect { case (id, v) if id != q => dot(vecs(q), v) }
      val mine = dot(vecs(q), vecs(n))
      val below = dots.count(_ < mine).toDouble / dots.size
      assert(below >= 0.3, s"query $q: pick $n at percentile $below")
      below
    }
    val mean = ranks.sum / ranks.size
    assert(mean >= 0.6, s"mean percentile rank $mean — ADC barely beats random")
  }
}
