package graft

import org.apache.spark.sql.functions._

/** The random half of SURVEY.md §2.5 O4 — seeded sampling has no
  * cross-engine-reproducible oracle (pandas vs Spark RNG streams differ by
  * construction), so its guarantees are asserted here instead:
  * within-engine determinism for a fixed seed, exact-n caps, and
  * per-group caps via windowed rank.
  */
class SamplingSpec extends SparkSpecBase {

  private lazy val li = graft.catalog.Tables
    .load(spark, "/root/testdata/sf0.001", "lineitem")

  test("orderBy(rand(seed)).limit(n) is deterministic and exact-n") {
    def pick() = li.orderBy(rand(42), col("l_orderkey"), col("l_linenumber"))
      .limit(100).select("l_orderkey", "l_linenumber").collect().toSeq
    val a = pick()
    assert(a.size === 100)
    assert(a === pick())
  }

  test("sample(fraction, seed) is deterministic and roughly proportional") {
    val n = li.count()
    val s1 = li.sample(0.1, 7L).count()
    val s2 = li.sample(0.1, 7L).count()
    assert(s1 === s2)
    assert(s1 > n / 20 && s1 < n / 5)
  }

  test("per-group sample caps every group at k rows") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("l_orderkey").orderBy(rand(42))
    val capped = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
    val maxPerGroup = capped.groupBy("l_orderkey").count()
      .agg(max("count")).head().getLong(0)
    assert(maxPerGroup <= 3L)
  }

  test("sampleBy draws per-stratum fractions (down-sampling a hot class)") {
    // the rebalancing move of a training-data pipeline: keep all of the
    // rare strata, thin the dominant one
    val fractions = Map("A" -> 0.1, "N" -> 1.0, "R" -> 1.0)
    val s1 = li.stat.sampleBy("l_returnflag", fractions, 42L)
    val s2 = li.stat.sampleBy("l_returnflag", fractions, 42L)
    val got = s1.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = li.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("N") === full("N") && got("R") === full("R"))
    assert(got("A") > full("A") / 20 && got("A") < full("A") / 5)
    assert(s1.count() === s2.count()) // seeded → deterministic
  }
}
