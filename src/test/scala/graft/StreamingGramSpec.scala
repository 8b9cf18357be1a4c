package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.GramProbe
import graft.streaming.GramProbe.{DocFeat, Gram}

/** Exact batch parity for the streaming incremental probe: folding the
  * real per-document features through `mapGroupsWithState` across
  * micro-batch splits must land on bit-identical coefficients to the
  * batch q281 closed-form fit — Gram sums are a commutative monoid, so
  * the state hand-off is the fold's accumulator with NO ordering
  * contract. Mid-stream snapshots are additionally checked against the
  * shared solve() over a JVM-accumulated prefix state.
  */
class StreamingGramSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private lazy val feats: Seq[DocFeat] =
    spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("source", "n_chars", "text").collect()
      .map { r =>
        val t = r.getString(2).split(" ").filter(_.nonEmpty)
        DocFeat(r.getString(0), r.getLong(1), t.distinct.length.toLong,
          t.length.toLong)
      }.toSeq

  private def gramOf(rows: Seq[DocFeat]): Map[String, Gram] =
    rows.groupBy(_.source).map { case (src, v) =>
      src -> v.foldLeft(Gram(0, 0, 0, 0, 0, 0, 0, 0, 0, 0)) { (g, r) =>
        Gram(g.n + 1, g.s1 + r.x1, g.s2 + r.x2, g.sy + r.y,
          g.s11 + r.x1 * r.x1, g.s12 + r.x1 * r.x2, g.s22 + r.x2 * r.x2,
          g.s1y + r.x1 * r.y, g.s2y + r.x2 * r.y, g.syy + r.y * r.y)
      }
    }

  test("streaming incremental probe equals batch q281 after split replay") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[DocFeat]
    val q = GramProbe.fitsWithState(mem.toDS())
      .writeStream.format("memory").queryName("gram_out")
      .outputMode(OutputMode.Update()).start()
    def snapshot(): Map[String, (Long, Option[Double], Option[Double],
        Option[Double], Option[Double])] =
      s.table("gram_out").collect().map { r =>
        def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
        r.getString(0) -> ((r.getLong(1), opt(2), opt(3), opt(4), opt(5)))
      }.groupBy(_._1).map { case (k, v) =>
        // Update-mode memory sink keeps every emission; the row with the
        // largest n per key is the latest state
        k -> v.map(_._2).maxBy(_._1)
      }
    try {
      val (b1, rest) = feats.splitAt(feats.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      mem.addData(b1: _*); q.processAllAvailable()
      // mid-stream: snapshot equals the shared solve over the JVM prefix
      val mid = snapshot()
      gramOf(b1).foreach { case (src, g) =>
        val f = GramProbe.solve(src, g)
        assert(mid(src) === ((f.n, f.beta0, f.beta1, f.beta2, f.r2)), src)
      }
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b3: _*); q.processAllAvailable()
      val fin = snapshot()
      // final state equals the batch q281 fit, bit for bit
      val batch = SparkEntry.queries("q281_grouped_probes")(s, dir)
        .collect().map { r =>
          def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
          r.getString(0) -> ((r.getLong(1), opt(2), opt(3), opt(4), opt(5)))
        }.toMap
      assert(fin.keySet === batch.keySet)
      batch.foreach { case (src, b) => assert(fin(src) === b, src) }
      // and equals the shared solve over the full JVM accumulation —
      // commutativity: batch-split boundaries leave no trace
      gramOf(feats).foreach { case (src, g) =>
        val f = GramProbe.solve(src, g)
        assert(fin(src) === ((f.n, f.beta0, f.beta1, f.beta2, f.r2)), src)
      }
    } finally q.stop()
  }
}
