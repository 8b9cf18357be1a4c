package graft

import java.time.LocalDate

import org.apache.spark.sql.functions._
import graft.catalog.Tables

/** Independent validation of [[graft.queries.ClassicOpsPack]]: brute-force
  * JVM recomputes of the skyline, the rolling distinct window, the ACF
  * series, and the CUSUM scan — plus the operators' structural laws
  * (frontier anti-chain, CUSUM telescoping to zero).
  */
class ClassicOpsSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q214 skyline equals the brute-force dominance filter") {
    val pts = Tables.load(spark, sf, "part")
      .select("p_partkey", "p_retailprice", "p_size").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    def dominated(a: (Long, Double, Int)) = pts.exists(b =>
      b._2 <= a._2 && b._3 <= a._3 && (b._2 < a._2 || b._3 < a._3))
    val expect = pts.filterNot(dominated)
      .groupBy(p => (p._2, p._3))
      .map { case ((pr, sz), g) => (pr, sz, g.size.toLong, g.map(_._1).min) }
      .toSeq.sortBy(_._1)
    val got = run("q214_skyline").collect()
      .map(r => (r.getDouble(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === expect)
    // frontier is an anti-chain: sizes strictly decrease as price rises
    got.sliding(2).foreach {
      case Seq(a, b) => assert(b._1 > a._1 && b._2 < a._2)
      case _         =>
    }
  }

  test("q215 rolling distinct matches a JVM sliding-set recompute") {
    val pairs = Tables.load(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).as("d"), col("o_custkey"))
      .distinct().collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val got = run("q215_rolling_distinct").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val day = r.getDate(0).toLocalDate
      val active = pairs.filter { case (d, _) =>
        !d.isAfter(day) && d.isAfter(day.minusDays(30))
      }.map(_._2).distinct.size.toLong
      val today = pairs.filter(_._1 == day).map(_._2).distinct.size.toLong
      assert(r.getLong(1) === active, s"30d window at $day")
      assert(r.getLong(2) === today, s"same-day count at $day")
    }
  }

  test("q216 pivot→unpivot round-trips to the direct long aggregate") {
    val direct = Tables.load(spark, sf, "orders")
      .groupBy(col("o_orderpriority"),
        year(col("o_orderdate")).cast("string").as("yr"))
      .agg(round(sum("o_totalprice"), 2).as("revenue"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val got = run("q216_unpivot").collect()
    assert(got.length === direct.size)
    got.foreach { r =>
      assert(r.getDouble(2) === direct((r.getString(0), r.getString(1))))
    }
  }

  test("q217 ACF matches a JVM recompute and stays in [-1, 1]") {
    val daily = Tables.load(spark, sf, "orders")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1))).toMap
    val lo = daily.keys.min(Ordering.by((d: LocalDate) => d.toEpochDay))
    val hi = daily.keys.max(Ordering.by((d: LocalDate) => d.toEpochDay))
    val xs = Iterator.iterate(lo)(_.plusDays(1)).takeWhile(!_.isAfter(hi))
      .map(d => daily.getOrElse(d, 0L)).toArray
    def acf(lag: Int): Double = {
      val pairs = xs.indices.dropRight(lag).map(i => (xs(i), xs(i + lag)))
      val n = BigInt(pairs.size)
      val sx = pairs.map(p => BigInt(p._1)).sum
      val sy = pairs.map(p => BigInt(p._2)).sum
      val sxy = pairs.map(p => BigInt(p._1) * BigInt(p._2)).sum
      val sxx = pairs.map(p => BigInt(p._1) * BigInt(p._1)).sum
      val syy = pairs.map(p => BigInt(p._2) * BigInt(p._2)).sum
      (n * sxy - sx * sy).toDouble /
        math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble)
    }
    val got = run("q217_acf_revenue").collect()
    assert(got.length === 7)
    got.foreach { r =>
      val lag = r.getInt(0)
      assert(r.getLong(1) === xs.length - lag, s"pair count at lag $lag")
      assert(math.abs(r.getDouble(2)) <= 1.0)
      assert(math.abs(r.getDouble(2) - acf(lag)) < 1e-9, s"acf at lag $lag")
    }
  }

  test("q220 layout metrics match a full JVM recompute for all orderings") {
    import graft.functions.Hilbert
    // Catalyst Hilbert expression == the JVM loop on the whole 64×64 grid
    val grid = spark.range(0, 64 * 64)
      .select((col("id") / 64).cast("int").as("x"),
        (col("id") % 64).cast("int").as("y"))
    val hil = grid.select(col("x"), col("y"),
      Hilbert.index(6)(col("x"), col("y")).as("h")).collect()
    hil.foreach { r =>
      assert(r.getLong(2) === Hilbert.indexJvm(6, r.getInt(0), r.getInt(1)))
    }
    // the index is a bijection onto 0..4095 (implies the curve is space
    // filling; adjacency is exercised by the bbox metric below)
    assert(hil.map(_.getLong(2)).sorted.toSeq === (0L until 4096L))

    val orders = Tables.load(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).as("d"), col("o_custkey"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val lo = orders.map(_._1.toEpochDay).min
    val cells = orders.map { case (d, c) =>
      ((c % 64).toInt, ((d.toEpochDay - lo) % 64).toInt)
    }.distinct
    def metric(key: ((Int, Int)) => Long): (Long, Double, Long) = {
      val areas = cells.sortBy(c => (key(c), c._1, c._2))
        .grouped(64).map { f =>
          val xs = f.map(_._1); val ys = f.map(_._2)
          (xs.max - xs.min + 1).toLong * (ys.max - ys.min + 1)
        }.toSeq
      (areas.size.toLong, areas.sum.toDouble / areas.size, areas.max)
    }
    def zJvm(x: Int, y: Int): Long =
      (0 until 6).map { i =>
        (((x.toLong >> i) & 1L) << (2 * i + 1)) |
          (((y.toLong >> i) & 1L) << (2 * i))
      }.reduce(_ | _)
    val expect = Map(
      "hilbert" -> metric(c => Hilbert.indexJvm(6, c._1, c._2)),
      "row_major" -> metric(c => c._1.toLong * 64 + c._2),
      "zorder" -> metric(c => zJvm(c._1, c._2)))
    val got = run("q220_layout_compare").collect()
    assert(got.length === 3)
    got.foreach { r =>
      val (nf, avg, mx) = expect(r.getString(0))
      assert(r.getLong(1) === cells.size.toLong)
      assert(r.getLong(2) === nf, s"files for ${r.getString(0)}")
      assert(r.getDouble(3) === avg, s"avg bbox for ${r.getString(0)}")
      assert(r.getLong(4) === mx, s"max bbox for ${r.getString(0)}")
    }
  }

  test("q218 CUSUM telescopes to zero and peaks where the JVM scan peaks") {
    val got = run("q218_cusum_changepoint").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2),
        r.getInt(3)))
    assert(got.nonEmpty)
    // Σ(n·x − T) over all days = n·T − n·T = 0 — the telescoping law
    assert(got.last._3 === 0L)
    val n = got.length.toLong
    val t = got.map(_._2).sum
    var acc = 0L
    val jvm = got.map { case (_, x, _, _) => acc += n * x - t; acc }
    assert(got.map(_._3).toSeq === jvm.toSeq)
    val maxAbs = jvm.map(math.abs).max
    got.zip(jvm).foreach { case ((_, _, _, peak), s) =>
      assert(peak === (if (math.abs(s) == maxAbs) 1 else 0))
    }
    assert(got.map(_._4).sum >= 1)
  }
}
