package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.HeavyHitters
import graft.streaming.HeavyHitters.Obs

/** SpaceSaving streaming heavy hitters: exact-regime parity (m ≥
  * cardinality ⇒ counts are the true counts, err 0), bounded-regime
  * guarantees (every frequent item present, overestimate ≤ recorded err
  * ≤ N/m), and a JVM replay of the identical per-batch fold.
  */
class StreamingHeavyHittersSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private lazy val obs: Seq[Obs] =
    graft.catalog.Tables.load(spark, dir, "events")
      .selectExpr("event_type", "user_id").collect()
      .map(r => Obs(r.getString(0), r.getLong(1))).toSeq

  private def runStream(m: Int, k: Int, name: String) = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Obs]
    val q = HeavyHitters.topKWithState(mem.toDS(), m, k)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update()).start()
    try {
      val (b1, rest) = obs.splitAt(obs.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b3: _*); q.processAllAvailable()
      val all = s.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(3),
          r.getLong(4), r.getLong(5)))
      // latest batch per key (driver-side: the memory sink self-join
      // trips conflicting-reference resolution)
      val lastBatch = all.groupBy(_._1)
        .map { case (k, g) => k -> g.map(_._2).max }
      all.filter { case (k, b, _, _, _) => lastBatch(k) == b }
        .map { case (k, _, item, cnt, err) => (k, item, cnt, err) }
    } finally q.stop()
  }

  test("m ≥ cardinality: streaming summary is exactly the true counts") {
    val got = runStream(m = 64, k = 64, "hh_exact")
      .map { case (key, item, cnt, err) => (key, item) -> ((cnt, err)) }
      .toMap
    val truth = obs.groupBy(o => (o.key, o.item))
      .map { case (p, g) => p -> g.size.toLong }
    assert(got.keySet === truth.keySet)
    truth.foreach { case (p, c) =>
      assert(got(p)._1 === c, s"$p count")
      assert(got(p)._2 === 0L, s"$p err must be 0 in the exact regime")
    }
  }

  test("m = 4: overestimates bounded by err ≤ N/m; top item still exact") {
    val rows = runStream(m = 4, k = 4, "hh_tight")
    val truth = obs.groupBy(o => (o.key, o.item))
      .map { case (p, g) => p -> g.size.toLong }
    val nPerKey = obs.groupBy(_.key).map { case (t, g) => t -> g.size.toLong }
    rows.foreach { case (key, item, cnt, err) =>
      val t = truth.getOrElse((key, item), 0L)
      assert(cnt >= t, s"SpaceSaving never undercounts ($key,$item)")
      assert(cnt - t <= err, s"overestimate bounded by recorded err")
      assert(err <= nPerKey(key) / 4 + 1, s"err ≤ N/m ($key)")
    }
  }

  test("JVM replay of the identical per-batch fold matches bit-for-bit") {
    val got = runStream(m = 4, k = 4, "hh_replay")
      .map { case (key, item, cnt, err) => (key, item) -> ((cnt, err)) }
      .toMap
    val (b1, rest) = obs.splitAt(obs.size / 3)
    val (b2, b3) = rest.splitAt(rest.size / 2)
    val expect = scala.collection.mutable.Map[
      String, Map[Long, (Long, Long)]]()
    for (batch <- Seq(b1, b2, b3); (key, g) <- batch.groupBy(_.key)) {
      var sum = expect.getOrElse(key, Map.empty[Long, (Long, Long)])
      g.map(_.item).sorted.foreach { it =>
        sum.get(it) match {
          case Some((c, e)) => sum = sum.updated(it, (c + 1, e))
          case None if sum.size < 4 => sum = sum.updated(it, (1L, 0L))
          case None =>
            val (minItem, (minCnt, _)) =
              sum.minBy { case (i, (c, _)) => (c, i) }
            sum = (sum - minItem).updated(it, (minCnt + 1, minCnt))
        }
      }
      expect(key) = sum
    }
    val expTop = expect.toMap.flatMap { case (key, sum) =>
      sum.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.take(4)
        .map { case (i, ce) => (key, i) -> ce }
    }
    assert(got === expTop)
  }
}
