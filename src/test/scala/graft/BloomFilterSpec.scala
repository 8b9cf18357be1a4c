package graft

import org.apache.spark.sql.functions._

/** Bloom-filter pre-filtering — the runtime-filter technique for
  * fact-to-fact joins at scale: build a compact sketch of the small
  * side's keys (public `df.stat.bloomFilter` API), broadcast it, and
  * pre-filter the big side *before* its shuffle; then join exactly. The
  * sketch admits false positives (a superset of the true semi-join) but
  * never false negatives, so correctness stays with the exact join while
  * the shuffle shrinks to ~the matching rows. Spark's own
  * InjectRuntimeFilter applies the same rewrite automatically for
  * selective shuffle joins; this pins the explicit form.
  */
class BloomFilterSpec extends SparkSpecBase {

  test("bloom pre-filter is a superset of the semi-join and never drops matches") {
    val s = spark
    val sf = "/root/testdata/sf0.001"
    val li = graft.catalog.Tables.load(s, sf, "lineitem")
    val hot = graft.catalog.Tables.load(s, sf, "orders")
      .filter(col("o_totalprice") > 400000.0)
      .select("o_orderkey")

    val bf = hot.stat.bloomFilter("o_orderkey", 1000L, 0.01)
    val bcast = s.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => bcast.value.mightContainLong(k))
    val filtered = li.filter(mightContain(col("l_orderkey")))

    val exact = li.join(hot, col("l_orderkey") === col("o_orderkey"),
      "left_semi")
    val nExact = exact.count()
    val nFiltered = filtered.count()
    val nAll = li.count()
    assert(nExact > 0, "fixture must have hot orders")
    // no false negatives: every true match passes the bloom filter
    assert(nFiltered >= nExact)
    // and the filter actually cuts the big side down
    assert(nFiltered < nAll)
    // exact join over the pre-filtered side equals the true semi-join
    val joined = filtered.join(hot,
      col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(joined === nExact)
  }
}
