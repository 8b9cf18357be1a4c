package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.CcStream
import graft.streaming.CcStream.Edge

/** Batch parity for the incremental connected-components twin: across any
  * micro-batch split of the verified near-dup pair stream (including
  * redelivered edges), the reconstructed latest label table must equal
  * batch q66's (node, component, keeper) EXACTLY — and at every
  * intermediate batch boundary, the labels must equal
  * [[graft.functions.ConnectedComponents]] run on the edge prefix.
  */
class StreamingCcSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  private lazy val batchEdges: Seq[(Long, Long)] =
    SparkEntry.queries("q62_minhash_lsh")(spark, sf)
      .select("doc_id", "doc_id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

  private lazy val batchLabels: Seq[(Long, Long, Int)] =
    SparkEntry.queries("q66_dup_clusters")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq

  /** Latest label per node from the emitted update stream. */
  private def latest(updates: Seq[(Long, Long, Long)]): Seq[(Long, Long)] =
    updates.groupBy(_._2)
      .map { case (node, us) => node -> us.maxBy(_._1)._3 }
      .toSeq.sorted

  test("incremental CC labels equal batch q66 across micro-batch splits") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Edge]
    val q = CcStream.labelsWithState(mem.toDS())
      .writeStream.format("memory").queryName("cc_labels")
      .outputMode(OutputMode.Append()).start()
    try {
      def emitted(): Seq[(Long, Long, Long)] =
        s.table("cc_labels").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val (b1, rest) = batchEdges.splitAt(batchEdges.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)

      mem.addData(b1.map(e => Edge(e._1, e._2)): _*)
      q.processAllAvailable()
      // intermediate parity: labels over the prefix equal batch CC on it
      val prefixCc = graft.functions.ConnectedComponents
        .run(b1.toDF("a", "b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(latest(emitted()) === prefixCc, "prefix labels diverge")

      mem.addData(b2.map(e => Edge(e._1, e._2)): _*)
      q.processAllAvailable()
      // at-least-once: redeliver part of b2 alongside b3 — no-op unions
      mem.addData((b2.take(b2.size / 4) ++ b3).map(e => Edge(e._1, e._2)): _*)
      q.processAllAvailable()

      val lbl = latest(emitted())
      assert(lbl.nonEmpty, "doubled corpus must produce dup clusters")
      assert(lbl === batchLabels.map(t => (t._1, t._2)),
        "final labels diverge from batch q66")
      // keeper contract: keeper ⇔ node == component (min-label root)
      val keepers = lbl.collect { case (n, c) if n == c => n }.toSet
      assert(batchLabels.forall { case (n, _, k) =>
        (k == 1) == keepers.contains(n) })
    } finally q.stop()
  }

  test("merge across batches: a bridging edge relabels the absorbed side") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Edge]
    val q = CcStream.labelsWithState(mem.toDS())
      .writeStream.format("memory").queryName("cc_bridge")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(Edge(10, 20), Edge(30, 40))
      q.processAllAvailable()
      mem.addData(Edge(20, 30)) // bridges {10,20} and {30,40}
      q.processAllAvailable()
      val updates = s.table("cc_bridge").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(latest(updates) === Seq(10L -> 10L, 20L -> 10L,
        30L -> 10L, 40L -> 10L))
      // batch 2 re-emits ONLY the absorbed side (30, 40), nothing else
      assert(updates.filter(_._1 == 2L).map(u => (u._2, u._3)).sorted ===
        Seq(30L -> 10L, 40L -> 10L))
    } finally q.stop()
  }
}
