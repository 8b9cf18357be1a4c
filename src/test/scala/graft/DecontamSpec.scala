package graft

import org.apache.spark.sql.functions._
import graft.catalog.Tables

/** q288 semantic decontamination: on the near-orthogonal synthetic
  * corpus the flagged set must be EXACTLY the planted leaks, each
  * matched to its own eval source at near-1 cosine — no false
  * positives from the noise band, no missed plants.
  */
class DecontamSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("q288 flags exactly the planted leaks, matched to their sources") {
    val planted = Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") % 100 === 0)
      .select((col("vec_id") + 2000000L).as("id"))
      .collect().map(_.getLong(0)).toSet
    assert(planted.nonEmpty)
    val got = SparkEntry.queries("q288_semantic_decontam")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSet === planted,
      "flagged set must be exactly the planted leaks")
    got.foreach { case (vecId, evId, cos) =>
      assert(evId === vecId - 2000000L, "leak must match its own source")
      assert(cos > 0.99, s"planted leak cosine unexpectedly low: $cos")
    }
  }
}
