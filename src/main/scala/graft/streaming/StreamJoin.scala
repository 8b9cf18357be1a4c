package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream–stream interval join: the streaming twin of the batch
  * temporal-range attribution join (LakehousePack q78 — clicks by the same
  * user in the hour before each purchase). Both sides are unbounded
  * streams, so Spark buffers each side in state and the join condition
  * itself must bound how long a row can wait for a match:
  *
  *   - equi key (`user_id`) partitions both state stores the same way —
  *     the same co-partitioning the batch shuffle join uses;
  *   - the time-range predicate `p_ts - 1h <= c_ts < p_ts` plus the two
  *     watermarks lets Spark compute an eviction horizon per side: a click
  *     older than (purchase watermark − 1 h) can never match a future
  *     purchase and is dropped from state; a purchase older than the click
  *     watermark likewise. Without the range predicate, state would grow
  *     forever — which is why the interval-join shape, not a bare equi
  *     join, is THE scalable stream–stream pattern.
  *
  * Inner join: a purchase with no prior click emits nothing (the batch
  * q78 uses LEFT to count zeros; a streaming left outer join emits its
  * null row only once the watermark proves no match can arrive — same
  * semantics, delayed by the horizon). StreamJoinSpec asserts exact pair
  * parity against the batch inner form over the same events.
  */
object StreamJoin {

  /** purchases: (p_id, p_user, p_ts); clicks: (c_user, c_ts).
    * Returns matched (p_id, p_user, p_ts, c_ts) pairs in Append mode.
    */
  def attributionPairs(purchases: DataFrame, clicks: DataFrame,
      lateness: String = "2 hours"): DataFrame =
    purchases.withWatermark("p_ts", lateness)
      .join(
        clicks.withWatermark("c_ts", lateness),
        expr("""
          p_user = c_user AND
          c_ts >= p_ts - INTERVAL 1 HOUR AND
          c_ts <  p_ts
        """),
        "inner")
      .select(col("p_id"), col("p_user"), col("p_ts"), col("c_ts"))

  /** Left-outer variant: every purchase emits, matched or not — the true
    * streaming twin of batch q78's LEFT (which counts zero-click
    * purchases). The state shape differs from the inner join in one
    * essential way: an unmatched purchase's null row CANNOT be emitted
    * when the purchase arrives (a matching click may still be in flight);
    * it is emitted exactly when the purchase is EVICTED from state — i.e.
    * when the global watermark proves no click in `[p_ts − 1h, p_ts)` can
    * ever arrive. Outer results are therefore delayed by the eviction
    * horizon (watermark delay + interval width), which is the price of
    * exactly-once null semantics on unbounded streams; state stays
    * bounded by the same horizon as the inner form.
    */
  def attributionWithUnmatched(purchases: DataFrame, clicks: DataFrame,
      lateness: String = "2 hours"): DataFrame =
    purchases.withWatermark("p_ts", lateness)
      .join(
        clicks.withWatermark("c_ts", lateness),
        expr("""
          p_user = c_user AND
          c_ts >= p_ts - INTERVAL 1 HOUR AND
          c_ts <  p_ts
        """),
        "left_outer")
      .select(col("p_id"), col("p_user"), col("p_ts"), col("c_ts"))
}
