package graft

/** RangeOps pack checks: full JVM recomputes — the naive O(n²) interval
  * overlap per customer against q256's tiled equi-join, and a sequential
  * weighted-quantile fold against q257's windowed selection.
  */
class RangeOpsSpec extends SparkSpecBase {

  private val sf0001 = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf0001)

  test("q256: tiled equi-join equals the naive per-customer theta join") {
    val epoch = java.time.LocalDate.of(1970, 1, 1)
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("o_custkey", "o_orderkey", "CAST(o_orderdate AS DATE)")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        java.time.temporal.ChronoUnit.DAYS.between(epoch,
          r.getDate(2).toLocalDate)))
    val perCust = orders.groupBy(_._1).map { case (ck, os) =>
      val n = os.combinations(2).count { case Array(a, b) =>
        a._3 < b._3 + 90 && b._3 < a._3 + 90
      }
      ck -> n.toLong
    }
    val expected = perCust.values.groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val got = run("q256_interval_overlap").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("q257: windowed weighted quartiles equal the sequential fold") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .selectExpr("l_returnflag", "l_extendedprice",
        "CAST(l_quantity AS BIGINT)", "l_orderkey", "l_linenumber")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getLong(3), r.getInt(4)))
    val expected = li.groupBy(_._1).map { case (g, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._4, r._5.toLong))
      val total = rows.map(_._3).sum
      var cum = 0L
      var (p25, p50, p75) = (Option.empty[Double], Option.empty[Double],
        Option.empty[Double])
      sorted.foreach { r =>
        cum += r._3
        if (p25.isEmpty && cum * 4 >= total) p25 = Some(r._2)
        if (p50.isEmpty && cum * 2 >= total) p50 = Some(r._2)
        if (p75.isEmpty && cum * 4 >= total * 3) p75 = Some(r._2)
      }
      g -> ((total, p25.get, p50.get, p75.get))
    }
    val got = run("q257_weighted_quartiles").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got === expected)
    got.values.foreach { case (_, a, b, c) =>
      assert(a <= b && b <= c, "quartiles must be monotone")
    }
  }
}
