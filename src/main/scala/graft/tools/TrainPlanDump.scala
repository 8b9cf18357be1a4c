package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.catalog.Tables
import graft.queries.SimilarityPack

/** Debugging utility: dump the plan and timing of the Lloyd-training
  * SUB-JOBS (assign → recompute → collect) that run driver-side inside
  * the ANN pack functions. These jobs never appear in a query's own
  * `explain` — the trained model embeds as literals — so optimization
  * evidence for them needs this dump. Prints `explain("formatted")` of
  * one coarse recompute round plus per-round wall times, warm.
  *
  * Usage: runMain graft.tools.TrainPlanDump <sfDir>
  */
object TrainPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local("graft-trainplan")
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // seed round, exactly as learnedCentroids builds it
    val seed = SimilarityPack.collectCentroids(
      e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cluster"), col("v").as("cv")))
    val round = SimilarityPack.recompute(SimilarityPack.assign(e, seed))
    println("=== recompute(assign(e, seed)) plan ===")
    round.explain("formatted")
    // warm once, then time three rounds of the full collect loop
    SimilarityPack.collectCentroids(round)
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      SimilarityPack.collectCentroids(
        SimilarityPack.recompute(SimilarityPack.assign(e, seed)))
      println(f"round $i: ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
    }
    spark.stop()
  }
}
