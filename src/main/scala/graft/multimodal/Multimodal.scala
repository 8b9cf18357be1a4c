package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Tables

/** Multimodal-column plumbing: image/audio/video payloads modeled as opaque
  * `binary` columns with typed metadata, plus batched feature extraction.
  *
  * The container has no media codecs, so the *decode* step is a
  * clearly-marked deterministic stub ([[fakeDecode]]) — the Spark-side
  * plumbing (schema, binary columns, batch iteration shape, partitioning)
  * is real and oracle/spec-tested. In PySpark this stage would be
  * `mapInPandas` (arrow-batched pandas UDF); the Scala-native equivalent
  * of that batch shape is `Dataset.mapPartitions` with an `Encoder` —
  * per-partition imperative iteration, zero driver involvement, state
  * bounded by one row (SURVEY.md §2.10: the one sanctioned mapPartitions
  * use).
  *
  * Scale notes: payloads stay opaque bytes end-to-end (no per-row JVM
  * object blowup beyond the byte array); metadata is computed as native
  * column expressions; feature extraction is embarrassingly parallel. At
  * 100 TB the media table would be bucketed by doc_id so joins back to
  * text/metadata tables avoid a shuffle of the payload bytes — payload
  * columns should never cross an exchange (project them out before any
  * join, re-join features by key instead).
  */
object Multimodal {

  /** Derive a media table from `documents`: the UTF-8 text bytes stand in
    * for an image/audio payload (deterministic fake), with hash-derived
    * typed metadata exactly as a real ingest would carry
    * (kind/width/height/sample_rate).
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(
        col("doc_id"),
        col("text").cast("binary").as("payload"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        (col("doc_id") % 7 * 64 + 64).cast("int").as("width"),
        (col("doc_id") % 5 * 64 + 64).cast("int").as("height"),
        (col("doc_id") % 2 * 22050 + 22050).cast("int").as("sample_rate"))

  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      histogram: Array[Long], // 16-bin byte-value histogram
      byte_sum: Long, // exact Σ byte values (mean = byte_sum/n_bytes)
      mean_byte: Double)

  /** STUB decoder — deterministic fake standing in for image/audio decode
    * (no codecs in this container). Consumes the payload bytes in one pass
    * and emits a 16-bin byte histogram + exact byte sum: the *shape* of a
    * feature extractor (bounded output per row, single sequential read of
    * the payload), which is what the pipeline plumbing cares about. Swap
    * the body for a real decoder (???) when codecs exist; the Spark
    * plumbing around it does not change.
    */
  def fakeDecode(payload: Array[Byte]): (Array[Long], Long) = {
    val hist = new Array[Long](16)
    var sum = 0L
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      hist(b >> 4) += 1
      sum += b
      i += 1
    }
    (hist, sum)
  }

  /** Batched feature extraction — the mapInPandas-equivalent stage. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "payload").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val (hist, sum) = fakeDecode(r.payload)
          val n = r.payload.length
          MediaFeatures(r.doc_id, n, hist, sum,
            if (n == 0) 0.0 else sum.toDouble / n)
        }
      }
  }

  /** "Frame sampling" over an opaque payload: every `stride`-th byte of
    * the first `maxFrames·stride` bytes, as native expressions (the
    * binary analog of video frame subsampling — no UDF, stays codegen'd).
    */
  def frameSample(payload: org.apache.spark.sql.Column, stride: Int,
      maxFrames: Int): org.apache.spark.sql.Column = {
    val nFrames = greatest(lit(1), least(lit(maxFrames),
      ceil(length(payload) / lit(stride.toDouble)).cast("int")))
    transform(
      sequence(lit(1), nFrames),
      i => call_function("substring", payload, (i - 1) * stride + 1, lit(1)))
  }
}
