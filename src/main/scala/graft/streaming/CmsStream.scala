package graft.streaming

import java.security.MessageDigest

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of q295's count-min sketch — the always-current
  * heavy-hitter monitor: token occurrences arrive in micro-batches,
  * each of the [[depth]] sketch rows keeps its [[width]] cells in
  * `flatMapGroupsWithState` state (one group per row — state is
  * `depth × width` longs at ANY stream length), and every batch emits
  * the row's refreshed cell vector. A point estimate reads min over
  * the d cells a token hashes to, with the IDENTICAL salted-md5
  * bucketing as batch q295 — StreamingCmsSpec pins the final grid and
  * the audit estimates bit-equal to the batch query.
  *
  * Semantics note vs [[NdvStream]]: cell addition is commutative, so
  * ANY micro-batch split yields the batch grid exactly — but unlike
  * register max it is NOT idempotent, so at-least-once REDELIVERY
  * inflates cells. That is inherent to every sum-based sketch; the
  * engine-level answer is Structured Streaming's checkpointed
  * exactly-once delivery into the stateful operator, not a property
  * the sketch could add back.
  */
object CmsStream {

  final case class TokRow(tok: String)

  final case class RowCells(r: Int, seq: Long, cells: Seq[Long])

  final case class CellState(cells: Seq[Long], seq: Long)

  val depth = 4
  val width = 512

  /** First 8 md5 hex chars of `cms{r}|tok` as a uint32 mod [[width]] —
    * the shared md5Hash32 convention, bit-identical to batch q295. */
  def bucket(r: Int, tok: String): Int = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(s"cms$r|$tok".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(8)
    (java.lang.Long.parseLong(hex, 16) % width).toInt
  }

  /** Min-over-rows point estimate from a materialized grid. */
  def estimate(grid: Map[Int, Seq[Long]], tok: String): Long =
    (0 until depth).map(r => grid(r)(bucket(r, tok))).min

  def cellsWithState(rows: Dataset[TokRow]): Dataset[RowCells] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .flatMap(t => (0 until depth).map(r => (r, bucket(r, t.tok))))
      .groupByKey(_._1)
      .flatMapGroupsWithState[CellState, RowCells](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (r: Int, it: Iterator[(Int, Int)], state: GroupState[CellState]) =>
          val st = state.getOption.getOrElse(
            CellState(Seq.fill(width)(0L), 0L))
          val cells = st.cells.toArray
          it.foreach { case (_, b) => cells(b) += 1L }
          val seq = st.seq + 1
          state.update(CellState(cells.toSeq, seq))
          Iterator.single(RowCells(r, seq, cells.toSeq))
      }
  }
}
