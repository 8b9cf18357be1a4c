package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.SketchPack

/** Streaming twin of the count-min sketch (batch q210): the d×w counter
  * table maintained as an incremental stateful aggregation over the key
  * stream. [[counters]] works identically on a batch or a streaming
  * DataFrame — the streaming planner turns the same groupBy into a
  * running stateful agg — and routes keys through [[SketchPack]]'s ONE
  * set of salted bucket expressions, so after any prefix of the stream
  * the counter state is bit-identical to the batch sketch over the rows
  * seen so far (StreamingSketchSpec proves it batch-by-batch).
  *
  * Why this is the scale shape: CMS state is d·w counters — CONSTANT, not
  * per-key — so unlike a streaming `groupBy(key).count()` whose state
  * grows with distinct keys forever (needing watermark eviction the
  * frequency question can't tolerate), the sketch answers "how often has
  * key k appeared, ever" over an unbounded stream in fixed memory, with
  * the one-sided overestimate error CMS guarantees. Complete-mode output
  * is viable for the same reason: the result relation is 1,536 rows
  * however long the stream runs.
  */
object SketchStream {

  /** The CMS counter table for a stream (or batch) of keys: one row per
    * (hash-row d, bucket b) with its running count. On a streaming input,
    * use OutputMode.Complete — the full counter table is re-emitted each
    * trigger and is tiny by construction.
    */
  def counters(keys: DataFrame, keyCol: String): DataFrame =
    keys.select(SketchPack.cmsExplode(col(keyCol)).as("db"))
      .groupBy(col("db.d").as("d"), col("db.b").as("b"))
      .agg(count(lit(1)).as("c"))

  /** Point-estimate readout against a counter table (streamed or batch):
    * each probe key's estimate is the MIN of its d counters — the CMS
    * guarantee (never underestimates) survives streaming because the
    * counters are exact running counts. Counter table broadcasts (≤ d·w
    * rows); probing any number of keys is a map-side join.
    */
  def pointEstimates(countersDf: DataFrame, probes: DataFrame,
      keyCol: String): DataFrame =
    probes
      .select(col(keyCol), SketchPack.cmsExplode(col(keyCol)).as("db"))
      .select(col(keyCol), col("db.d").as("d"), col("db.b").as("b"))
      .join(broadcast(countersDf), Seq("d", "b"))
      .groupBy(keyCol)
      .agg(min("c").as("cms_est"))
}
