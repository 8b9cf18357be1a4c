package graft

import java.security.MessageDigest

import graft.queries.ExperimentsPack

/** Experiments pack checks: a hand-computed fixture for every DP path of
  * the q199 windowed funnel, JVM recomputes of the q195 z-score and q196
  * Holt recurrence (independent of both engines' SQL), and conservation
  * invariants for the k-anonymity, seasonality, and time-to-repeat
  * audits on testdata.
  */
class ExperimentsSpec extends SparkSpecBase {

  import spark.implicits._

  private val sf0001 = "/root/testdata/sf0.001"

  private def run(name: String, dir: String = sf0001) =
    SparkEntry.queries(name)(spark, dir)

  // --- q199 windowed funnel ------------------------------------------------

  /** (user, event_type, ts_us) → events frame with nanosecond ts. */
  private def ev(rows: (Long, String, Long)*) =
    rows.map { case (u, t, us) => (u, t, us * 1000L) }
      .toDF("user_id", "event_type", "ts")

  test("window funnel: every DP path of the fold (window 100 µs)") {
    val events = ev(
      // level 3: straight through within the window
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // level 1: click misses the window (190 > 100); purchase can't fire
      (2L, "view", 10L), (2L, "click", 200L), (2L, "purchase", 250L),
      // level 1: click BEFORE the first view earns nothing
      (3L, "click", 5L), (3L, "view", 10L), (3L, "purchase", 20L),
      // level 2: click in window, purchase outside it (240 > 100)
      (4L, "view", 10L), (4L, "click", 50L), (4L, "purchase", 250L),
      // level 0: no view at all
      (5L, "purchase", 5L), (5L, "click", 6L),
      // level 3: a LATER-read earlier view re-anchors t1 to 10
      (6L, "view", 100L), (6L, "view", 10L), (6L, "click", 105L),
      (6L, "purchase", 106L),
      // level 3: pre-view click ignored, the post-view one counts
      (7L, "click", 10L), (7L, "view", 20L), (7L, "click", 30L),
      (7L, "purchase", 40L),
      // level 1: same-µs click needs t1 < us strictly
      (8L, "view", 50L), (8L, "click", 50L), (8L, "purchase", 60L))
    val got = ExperimentsPack.funnelState(events, 100L).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 3, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 0,
      6L -> 3, 7L -> 3, 8L -> 1))
  }

  test("q199 on testdata: histogram covers all users with funnel events") {
    val rows = run("q199_window_funnel").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val expected = spark.read.parquet(s"$sf0001/events.parquet")
      .where("event_type IN ('view','click','purchase')")
      .select("user_id").distinct().count()
    assert(rows.values.sum === expected)
    assert(rows.keySet.subsetOf(Set(0, 1, 2, 3)))
  }

  // --- q196 Holt -----------------------------------------------------------

  test("q196 Holt: JVM fold recompute matches both-engine output") {
    val daily = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("o_orderpriority AS p",
        "CAST(o_orderdate AS STRING) AS d",
        "CAST(round(o_totalprice * 100) AS LONG) AS cents")
      .groupBy("p", "d").agg(org.apache.spark.sql.functions.expr(
        "sum(cents)").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val want = daily.groupBy(_._1).map { case (p, rows) =>
      val ys = rows.sortBy(_._2).map(_._3 / 100.0)
      var l = ys.head
      var t = 0.0
      ys.tail.foreach { y =>
        val nl = 0.3 * y + 0.7 * (l + t)
        t = 0.2 * (nl - l) + 0.8 * t
        l = nl
      }
      p -> ((ys.length, round6(l), round6(t), round6(l + t)))
    }
    val got = run("q196_holt_trend").collect().map { r =>
      r.getString(0) -> ((r.getInt(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    }.toMap
    assert(got === want)
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // --- q195 A/B readout ----------------------------------------------------

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("q195: JVM recompute of arms, rates, lift, and z-score") {
    val custs = spark.read.parquet(s"$sf0001/customer.parquet")
      .select("c_custkey").as[Long].collect()
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("o_custkey",
        "CAST(o_orderdate >= TIMESTAMP '2001-01-01' AS INT) AS recent",
        "CAST(round(o_totalprice * 100) AS LONG) AS cents")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val recentByCust = orders.groupBy(_._1).map { case (k, v) =>
      k -> v.map(_._2).sum
    }
    val centsByCust = orders.groupBy(_._1).map { case (k, v) =>
      k -> v.map(_._3).sum
    }
    def arm(k: Long) =
      if (java.lang.Long.parseLong(md5hex(s"ab|$k").take(8), 16) % 2 == 0)
        "A" else "B"
    val byArm = custs.groupBy(arm)
    def stats(a: String) = {
      val ks = byArm(a)
      (ks.length.toLong,
        ks.count(k => recentByCust.getOrElse(k, 0) > 0).toLong,
        ks.map(k => centsByCust.getOrElse(k, 0L)).sum)
    }
    val (na, ca, centsA) = stats("A")
    val (nb, cb, centsB) = stats("B")
    val (pa, pb) = (ca.toDouble / na, cb.toDouble / nb)
    val pooled = (ca + cb).toDouble / (na + nb)
    val z = (pa - pb) /
      math.sqrt(pooled * (1.0 - pooled) * (1.0 / na + 1.0 / nb))
    val r = run("q195_ab_readout").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((na, nb, ca, cb)))
    assert(r.getDouble(4) === pa)
    assert(r.getDouble(5) === pb)
    assert(r.getDouble(6) === 100.0 * (pa - pb) / pb)
    assert(r.getDouble(7) === z)
    assert(r.getDouble(8) === centsA.toDouble / na / 100.0)
    assert(r.getDouble(9) === centsB.toDouble / nb / 100.0)
  }

  // --- q194 / q197 / q198 conservation invariants --------------------------

  test("q194: class-size histogram conserves the customer row count") {
    val rows = run("q194_k_anonymity").collect()
    val total = spark.read.parquet(s"$sf0001/customer.parquet").count()
    assert(rows.map(_.getLong(2)).sum === total)
    rows.foreach { r =>
      assert(r.getLong(2) === r.getLong(0) * r.getLong(1))
      assert(r.getInt(3) === (if (r.getLong(0) < 5) 1 else 0))
    }
  }

  test("q197: 7 ISO weekdays, day counts conserve, weighted index = 1") {
    val rows = run("q197_dow_seasonality").collect()
    assert(rows.map(_.getInt(0)).toSeq === (1 to 7))
    val nDays = rows.map(_.getLong(1)).sum
    val distinctDays = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("CAST(o_orderdate AS DATE)").distinct().count()
    assert(nDays === distinctDays)
    val weighted = rows.map(r => r.getLong(1) * r.getDouble(3)).sum
    assert(math.abs(weighted / nDays - 1.0) < 1e-9)
  }

  test("q198: shares sum to 1 over repeated + censored customers") {
    val rows = run("q198_time_to_repeat").collect()
    val custs = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(3)).sum === custs)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-9)
    rows.foreach { r =>
      val band = r.getInt(0)
      if (band >= 0) {
        assert(r.getString(1) === "repeated")
        assert(r.getInt(2) === band * 30)
      } else {
        assert(r.getString(1) === "censored")
        assert(r.isNullAt(2))
      }
    }
  }

  test("q270: l-diversity histogram conserves rows; l bounded by segments") {
    val rows = run("q270_l_diversity").collect()
    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
      .selectExpr("CAST(c_nationkey AS BIGINT)",
        "CAST(floor(c_acctbal / 1000) AS BIGINT)",
        "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val classes = cust.groupBy(c => (c._1, c._2)).toSeq.map { case (_, v) =>
      (v.length.toLong, v.map(_._3).distinct.length.toLong)
    }
    val expected = classes.groupBy(_._2).map { case (l, v) =>
      (l, v.size.toLong, v.map(_._1).sum)
    }.toSeq.sortBy(_._1)
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    assert(rows.map(_.getLong(2)).sum === cust.length.toLong)
    rows.foreach { r =>
      assert(r.getLong(0) >= 1 && r.getLong(0) <= 5) // 5 market segments
      assert(r.getInt(3) === (if (r.getLong(0) < 3) 1 else 0))
    }
  }
}
