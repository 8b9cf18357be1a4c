package graft

import graft.queries.DataQualityPack

/** q192 PSI drift audit: independent JVM recompute on testdata, plus the
  * detection property the statistic exists for — a shifted source scores
  * above a faithful one.
  */
class DriftSpec extends SparkSpecBase {

  import spark.implicits._

  private val bins = 16
  private val binW = 32

  private def jvmPsi(rows: Seq[(String, String)]): Map[String, Double] = {
    def bin(text: String): Int =
      math.min(text.split(" ").count(_.nonEmpty) / binW, bins - 1)
    val byBin = rows.groupBy { case (src, t) => (src, bin(t)) }
      .map { case (k, g) => k -> g.size.toLong }
    val sources = rows.map(_._1).distinct
    val nS = rows.groupBy(_._1).map { case (s, g) => s -> g.size.toLong }
    val nG = rows.size.toLong
    sources.map { src =>
      val terms = (0 until bins).map { b =>
        val c = byBin.getOrElse((src, b), 0L)
        val g = sources.map(s2 => byBin.getOrElse((s2, b), 0L)).sum
        val a = (c + 1).toDouble / (nS(src) + bins).toDouble
        val e = (g + 1).toDouble / (nG + bins).toDouble
        (a - e) * math.log(a / e)
      }
      src -> BigDecimal(terms.sum).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }.toMap
  }

  test("PSI on testdata matches an independent JVM recompute") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val expected = jvmPsi(docs.select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq)
    val got = DataQualityPack.psi(spark, docs).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (src, v) =>
      assert(math.abs(v - expected(src)) < 2e-6, s"source $src")
    }
  }

  test("a length-shifted source scores above a faithful clone") {
    val base = (1 to 400).map(i =>
      ("base", Seq.fill(20 + (i * 37) % 200)("w").mkString(" ")))
    val clone = base.map { case (_, t) => ("clone", t) }
    // truncation bug: the same docs cut to their first 40 tokens
    val cut = base.map { case (_, t) =>
      ("truncated", t.split(" ").take(40).mkString(" "))
    }
    val docs = (base ++ clone ++ cut).toDF("source", "text")
    val psi = DataQualityPack.psi(spark, docs).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    // the truncated third also pollutes the GLOBAL baseline, which lifts
    // the clone's PSI — the signal is the ratio, not an absolute gap
    assert(psi("truncated") > 3 * math.max(psi("clone"), 1e-6))
    assert(math.abs(psi("clone") - psi("base")) < 1e-6)
  }
}
