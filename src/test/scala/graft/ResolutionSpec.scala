package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

/** Resolution-pack checks: ER recall against the JVM-recomputed variant
  * set, caliper-matching contract bounds, skew-audit algebra, KMV error
  * bound, and the q255 two-pass prefix-max against the naive global
  * window (the claim that the bucketed form IS the running max).
  */
class ResolutionSpec extends SparkSpecBase {

  private val sf0001 = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf0001)

  private def md5u32(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  test("q251: every synthesized variant is merged (100% blocking recall)") {
    val keys = spark.read.parquet(s"$sf0001/customer.parquet")
      .select("c_custkey").collect().map(_.getLong(0))
    val nVariants = keys.count(k => md5u32(s"erdup|$k") % 4 == 0)
    val rows = run("q251_entity_resolution").collect()
    val nRecords = rows.map(_.getLong(2)).sum
    val nEntities = rows.map(_.getLong(1)).sum
    val nMerged = rows.map(_.getLong(3)).sum
    assert(nRecords === keys.length + nVariants, "dirty registry size")
    assert(nRecords - nEntities === nMerged, "merge accounting")
    // rare-gram blocking recall: a variant always shares a rare gram with
    // its source (scaladoc proof), so at least one merge per variant.
    assert(nMerged >= nVariants, "a variant escaped its source cluster")
    assert(nEntities <= keys.length, "entities exceed true customers")
  }

  test("q252: matching respects the caliper and its own accounting") {
    val r = run("q252_propensity_match").collect().head
    val (nT, nM) = (r.getLong(0), r.getLong(1))
    assert(nT > 0 && nM > 0 && nM <= nT)
    assert(r.getDouble(2) === nM.toDouble / nT)
    assert(r.getDouble(4) <= 0.05 + 1e-12, "avg gap beyond caliper")
  }

  test("q253: skew metrics stay in their algebraic ranges") {
    val r = run("q253_skew_audit").collect().head
    val (n, ndv, maxC) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(maxC * ndv >= n, "max below mean is impossible")
    assert(r.getDouble(3) >= 1.0 / ndv, "max share below uniform")
    val gini = r.getDouble(5)
    assert(gini >= 0.0 && gini < 1.0, s"gini out of range: $gini")
    assert(r.getDouble(6) >= 0.0, "cv negative")
    assert(r.getLong(7) >= 1L, "salt factor below 1")
  }

  test("q254: KMV estimate lands near the exact overlap") {
    val r = run("q254_corpus_overlap").collect().head
    val (nA, nB, nBoth, nUnion) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nBoth <= math.min(nA, nB))
    assert(nUnion === nA + nB - nBoth, "inclusion-exclusion")
    val est = r.getDouble(5)
    assert(est >= 0.0 && est <= 1.0)
    assert(r.getDouble(7) <= 0.25, s"KMV error too large: ${r.getDouble(7)}")
  }

  test("q255: bucketed prefix-max equals the naive global running max") {
    // Naive recompute: single sort over (akey, event_id), sequential max.
    val ev = graft.catalog.Tables.load(spark, sf0001, "events")
      .select(col("event_id"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getLong(1) / 1000L))
      .map { case (id, us) => (id + md5u32(s"jit|$id") % 41 + 6, id, us) }
      .sortBy(t => (t._1, t._2))
    var runmax = Long.MinValue
    var (nOoo, late1, maxLag, sumLag) = (0L, 0L, 0L, 0L)
    ev.foreach { case (_, _, us) =>
      runmax = math.max(runmax, us)
      val lag = runmax - us
      if (lag > 0) nOoo += 1
      if (lag > 60000000L) late1 += 1
      maxLag = math.max(maxLag, lag)
      sumLag += lag
    }
    val r = run("q255_watermark_audit").collect().head
    assert(r.getLong(0) === ev.length.toLong)
    assert(r.getLong(1) === nOoo, "out-of-order count")
    assert(r.getLong(2) === late1, "late at 1m")
    assert(r.getLong(5) === maxLag, "max lag")
    assert(r.getDouble(6) === sumLag.toDouble / ev.length / 1000000.0)
    // watermark ladder is monotone
    assert(r.getLong(2) >= r.getLong(3) && r.getLong(3) >= r.getLong(4))
  }
}
