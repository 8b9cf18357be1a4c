package graft.streaming

import java.security.MessageDigest

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of q284's per-column HLL table profile — the
  * always-current distinct-count monitor: value rows arrive in
  * micro-batches, each column's 64 HLL registers live in
  * `flatMapGroupsWithState` state, and every batch emits the column's
  * refreshed estimate using the IDENTICAL estimator expression as the
  * batch query (exact-integer Σ2^(27−reg), one final double chain,
  * linear-counting fallback below 2.5 m, round-4).
  *
  * Register max is commutative and idempotent, so any micro-batch split
  * AND at-least-once redelivery produce the batch sketch exactly —
  * bit-equal registers, therefore bit-equal estimates
  * (StreamingNdvSpec pins both against batch q284). State is 64 longs
  * per column at any stream length — the constant-state property that
  * makes sketch maintenance the streaming answer where exact distinct
  * counting would hold unbounded key sets.
  */
object NdvStream {

  final case class ValueRow(column: String, v: String)

  final case class NdvEstimate(column: String, seq: Long, nZeroRegs: Long,
      sumScaled: Long, hllNdv: Double)

  final case class RegState(regs: Seq[Long], seq: Long)

  private val M = 64

  /** First 8 md5 hex chars of `hllp|v` as a uint32 — the shared
    * md5Hash32 convention (q284's hash, bit-identical). */
  private def h32(v: String): Long = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(s"hllp|$v".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(8)
    java.lang.Long.parseLong(hex, 16)
  }

  private def rho(w: Long): Long =
    if (w == 0) 27L else java.lang.Long.numberOfTrailingZeros(w) + 1L

  /** The q284 estimator over a register vector, identical op order. */
  private[graft] def estimate(regs: Seq[Long]): (Long, Long, Double) = {
    val sumScaled = regs.map(r => 1L << (27 - r).toInt).sum
    val zeros = regs.count(_ == 0L).toLong
    val raw = 0.709 * 4096.0 * 134217728.0 / sumScaled.toDouble
    val est =
      if (raw <= 160.0 && zeros > 0) 64.0 * math.log(64.0 / zeros) else raw
    val rounded = BigDecimal(est)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    (zeros, sumScaled, rounded)
  }

  def estimatesWithState(rows: Dataset[ValueRow]): Dataset[NdvEstimate] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .groupByKey(_.column)
      .flatMapGroupsWithState[RegState, NdvEstimate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (column: String, it: Iterator[ValueRow], state: GroupState[RegState]) =>
          val st = state.getOption.getOrElse(
            RegState(Seq.fill(M)(0L), 0L))
          val regs = st.regs.toArray
          it.foreach { r =>
            val h = h32(r.v)
            val idx = (h % M).toInt
            val p = rho(h / M)
            if (p > regs(idx)) regs(idx) = p
          }
          val seq = st.seq + 1
          state.update(RegState(regs.toSeq, seq))
          val (zeros, sumScaled, est) = estimate(regs.toSeq)
          Iterator.single(
            NdvEstimate(column, seq, zeros, sumScaled, est))
      }
  }
}
