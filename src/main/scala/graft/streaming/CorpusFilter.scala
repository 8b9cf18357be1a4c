package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.queries.CorpusOpsPack

/** Streaming twins of the stateless corpus-hygiene ops: the quality-rule
  * cascade (q158) and the stratified sampler (q160) are pure per-row
  * expressions, so the SAME definitions (shared from [[CorpusOpsPack]], the
  * TextOps one-tokenizer doctrine applied to rules) run unchanged on an
  * unbounded stream — no watermark, no state store, no output-mode
  * constraint beyond Append. This is the shape a streaming ingest pipeline
  * uses to gate documents before they ever land in the lake: verdicts at
  * arrival time, bit-identical to what a batch backfill over the same rows
  * would decide (proven in StreamingCorpusSpec).
  *
  * Scale notes: stateless streaming stages scale with input rate only —
  * no per-key memory, no shuffle; Spark fuses them into the source's
  * micro-batch projection. The deterministic md5 sampling bucket also
  * means REPLAYED documents get the same verdict — at-least-once sources
  * need no dedup before this gate.
  */
object CorpusFilter {

  /** Per-document rule verdicts (all signal columns + keep/reason). */
  def verdicts(docs: DataFrame): DataFrame =
    CorpusOpsPack.ruleVerdicts(docs)

  /** Only the documents the rule cascade keeps. */
  def kept(docs: DataFrame): DataFrame =
    verdicts(docs).filter(org.apache.spark.sql.functions.col("keep") === 1)

  /** The stratified sample of the stream (per-language md5 keep-rates). */
  def stratified(docs: DataFrame): DataFrame =
    docs.filter(CorpusOpsPack.stratKeep)

  /** Per-document classifier score + keep prediction — q174's hashed
    * linear scorer as the in-row fold
    * ([[graft.queries.TrainingPipelinePack.classifierScore]]), so the
    * model gate runs at ingest with no shuffle and no state, bit-equal
    * to a batch backfill (StreamingCorpusSpec).
    */
  def scored(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    val sc = graft.queries.TrainingPipelinePack.classifierScore(col("text"))
    docs.withColumn("score_milli", sc)
      .withColumn("pred", (col("score_milli") > 0).cast("int"))
  }
}
