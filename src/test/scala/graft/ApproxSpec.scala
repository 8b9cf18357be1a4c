package graft

import org.apache.spark.sql.functions._
import graft.queries.ApproxPack

/** Error-bound assertions for the sketch aggregates (engine-specific
  * sketches can't be oracle-compared; their guarantees are bounded here).
  */
class ApproxSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% of exact per group") {
    val rows = ApproxPack.approxFunnel(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (approx, exact) = (r.getLong(1), r.getLong(2))
      assert(math.abs(approx - exact) <= math.max(1L, (exact * 0.05).toLong),
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
  }

  test("percentile_approx within one unit of exact median") {
    val rows = ApproxPack.approxQuantiles(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) <= 1.0,
        s"${r.getString(0)}: approx=${r.getDouble(1)} exact=${r.getDouble(2)}")
    }
  }

  test("freqItems is a superset of all truly-frequent items") {
    val s = spark
    val e = graft.catalog.Tables.load(s, sf, "events")
    // every event_type holds ~20% support; at threshold 0.15 the sketch
    // guarantees all of them appear (false positives allowed, negatives not)
    val items = e.stat.freqItems(Array("event_type"), 0.15)
      .head.getSeq[String](0).toSet
    val truth = e.select("event_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(truth.subsetOf(items), s"missing: ${truth -- items}")
  }

  test("count-min sketch never under-counts") {
    val s = spark
    val e = graft.catalog.Tables.load(s, sf, "events")
    val cms = e.stat.countMinSketch("event_type", eps = 0.001,
      confidence = 0.99, seed = 42)
    val exact = e.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val est = cms.estimateCount(k)
      assert(est >= n, s"$k: est=$est < exact=$n")
      assert(est <= n + (0.001 * exact.values.sum).toLong + 1,
        s"$k: est=$est far above exact=$n")
    }
  }
}
