package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.PrioritySampler
import graft.streaming.PrioritySampler.{Est, Obs}

/** Batch parity for the streaming priority sampler: the final snapshot
  * after any micro-batch split (with at-least-once redelivery thrown in)
  * must equal the batch q229 computation over the same rows — same τ,
  * same estimator, down to the cent — because top-(k+1) by priority is a
  * mergeable sketch. A small-k JVM fold pins eviction order exactly.
  */
class StreamingSamplerSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  private lazy val orders: Seq[Obs] =
    graft.catalog.Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .collect()
      .map(r => Obs("all", r.getLong(0), r.getLong(1)))
      .sortBy(_.id).toSeq

  private def latest(estDf: org.apache.spark.sql.DataFrame): Est = {
    val r = estDf.orderBy(col("batch").desc).limit(1).collect().head
    Est(r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3),
      r.getLong(4), r.getLong(5))
  }

  test("final snapshot equals batch q229 across splits and redelivery") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Obs]
    val q = PrioritySampler.sampleWithState(mem.toDS(), k = 100)
      .writeStream.format("memory").queryName("psample")
      .outputMode(OutputMode.Update()).start()
    try {
      val (b1, rest) = orders.splitAt(orders.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      mem.addData(b1: _*); q.processAllAvailable()
      // redeliver part of b1 with b2: ids still in the sketch are ignored
      mem.addData((b1.takeRight(20) ++ b2): _*); q.processAllAvailable()
      mem.addData(b3: _*); q.processAllAvailable()
      val fin = latest(s.table("psample"))
      // batch q229 on the same table: (k, tau, est_total, true_total, _)
      val batch = SparkEntry.queries("q229_priority_sample")(spark, sf)
        .collect().head
      assert(fin.n_sample === batch.getLong(0).toInt)
      assert(fin.tau === batch.getLong(1), "tau must match batch q229")
      assert(fin.est_cents / 100.0 === batch.getDouble(2),
        "estimator must match batch q229 to the cent")
    } finally q.stop()
  }

  test("small-k eviction follows the exact (priKey desc, id) order") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Obs]
    val q = PrioritySampler.sampleWithState(mem.toDS(), k = 5)
      .writeStream.format("memory").queryName("psample_small")
      .outputMode(OutputMode.Update()).start()
    try {
      val items = orders.take(40)
      items.grouped(7).foreach { g =>
        mem.addData(g: _*); q.processAllAvailable()
      }
      val fin = latest(s.table("psample_small"))
      // JVM replica of the mergeable-sketch law: global top-6, then the
      // q229 estimator
      val sorted = items
        .map(o => (PrioritySampler.priKey(o.cents, o.id), o.id, o.cents))
        .sortBy { case (pk, id, _) => (-pk, id) }
      val (sample, rest) = sorted.take(6).splitAt(5)
      val tau = rest.headOption.map(_._1).getOrElse(0L)
      val est = sample.map { case (_, _, c) => math.max(c, tau) }.sum
      assert(fin.n_seen === 40L)
      assert(fin.n_sample === 5)
      assert(fin.tau === tau)
      assert(fin.est_cents === est)
    } finally q.stop()
  }
}
