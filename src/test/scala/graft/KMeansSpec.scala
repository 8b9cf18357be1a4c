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
}
