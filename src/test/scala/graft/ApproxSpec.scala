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
}
