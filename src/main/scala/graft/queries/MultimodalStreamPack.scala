package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Tables
import graft.multimodal.Multimodal

/** Multimodal-column queries + the batch twin of the streaming session
  * window.
  *
  * q95/q96 exercise the binary-payload plumbing ([[Multimodal]]): metadata
  * over opaque payloads is pure native expressions (oracle-checkable —
  * payload bytes are the documents' ASCII text, so DuckDB's VARCHAR
  * functions see the same bytes); q96's feature extraction goes through
  * the mapPartitions/Encoder batch path (the mapInPandas shape), with its
  * histogram flattened to per-bin rows so the oracle hash-compares it,
  * plus exact-value coverage in MultimodalSpec.
  *
  * q49 runs Spark's native `session_window` in *batch* over `events` —
  * same operator the streaming path uses ([[graft.streaming.Sessionize]]),
  * so its semantics get a DuckDB oracle here: merge events whose 30-min
  * windows overlap (new session when gap ≥ 30 min — note ≥, the window is
  * half-open, vs q43's legacy > semantics).
  */
object MultimodalStreamPack extends QueryPack {

  /** q95 — typed metadata over opaque binary payloads. */
  private def q95(s: SparkSession, dir: String): DataFrame =
    Multimodal.mediaTable(s, dir)
      .select(
        col("doc_id"), col("kind"), col("width"), col("height"),
        col("sample_rate"),
        length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("payload_md5"),
        hex(expr("substring(payload, 1, 8)")).as("head_hex"),
        size(Multimodal.frameSample(col("payload"), 32, 10)).as("n_frames"))
      .orderBy("doc_id")

  /** q96 — batched feature extraction through the stubbed decoder
    * (mapPartitions). Output is flattened to exact-integer scalars (one
    * row per histogram bin via posexplode; array columns don't survive the
    * driver's sort-based compare, and doubles would hit rounding-parity
    * traps) so the whole mapPartitions path is DuckDB-oracle-checked: the
    * oracle rebuilds the byte histogram by unnesting one row per character
    * (documents.text is pure ASCII, so char code = byte value).
    */
  private def q96(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(Multimodal.mediaTable(s, dir))
      .toDF()
      .select(col("doc_id"), col("n_bytes"), col("byte_sum"),
        posexplode(col("histogram")).as(Seq("bin", "bin_count")))
      .orderBy("doc_id", "bin")

  /** q298 — REAL codec decode: each document's bytes travel as a VALID
    * Netpbm P5 (binary PGM) grayscale image — a published,
    * dependency-free format — and [[Multimodal.decodePgm]] is a genuine
    * parser (magic, `#` comments, whitespace runs, exact plane length),
    * not q96's documented stand-in. This closes the round-6 "real
    * codec-backed decode" gap to the extent the sandbox allows: real
    * decode for a real format that needs no codec library. Features
    * flow through the same sanctioned mapPartitions batch path; the
    * oracle recomputes pixel stats from the payload CONSTRUCTION (text
    * bytes zero-padded to width×height — padding contributes 0), while
    * the parser itself is pinned by MultimodalSpec's roundtrip,
    * comment/whitespace, and malformation cases.
    */
  private def q298(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractPgmFeatures(Multimodal.pgmTable(s, dir))
      .toDF()
      .select(col("doc_id"), col("width"), col("height"),
        col("n_pixels"), col("pix_sum"),
        meanRound6("pix_sum", "n_pixels").as("mean_pixel6"))
      .orderBy("doc_id")

  /** Exact half-up round-6 of an integer quotient, in integer space:
    * `round(sum/cnt, 6)` over two exact integers lands on EXACT decimal
    * ties (a 256-pixel image makes sum∕256 end in …0625), where Spark's
    * HALF_UP on the exact decimal and DuckDB's scaled-double rounding
    * disagree by one final digit — caught by the sf1 oracle gate at row
    * grain (q298/q307/q309). `(2·10⁶·sum + cnt) div (2·cnt)` is
    * half-up by construction (positive operands) and both engines then
    * divide two exact integers below 2⁵³, which every IEEE engine
    * rounds to the same double. DuckDB twin: the same algebra with
    * `//`. */
  private def meanRound6(sum: String, cnt: String): Column =
    expr(s"CAST((2000000 * $sum + $cnt) div (2 * $cnt) AS DOUBLE) / 1e6")

  /** q307 — REAL COMPRESSED-CODEC decode: each document's bytes become a
    * genuine PNG (written through the JDK's `javax.imageio` PNG encoder —
    * an actual DEFLATE codec in the java.desktop module, no external
    * library), and [[Multimodal.decodeImage]] reads it back through the
    * same codec stack: container parse, zlib inflation, raster access.
    * This retires the long-standing "no codecs in the sandbox" caveat for
    * the image modality — the JDK ships PNG/JPEG/GIF/BMP/TIFF readers.
    * PNG grayscale is lossless, so the decoded plane reproduces the
    * source bytes exactly and the oracle recomputes the identical pixel
    * stats from the payload CONSTRUCTION, exactly as q298 (the two real
    * tiers share dimension/plane algebra); the codec roundtrip itself
    * plus multi-format (BMP) and corrupt-stream behavior are pinned in
    * MultimodalSpec.
    */
  private def q307(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractImageFeatures(Multimodal.pngTable(s, dir))
      .toDF()
      .select(col("doc_id"), col("width"), col("height"),
        col("n_pixels"), col("pix_sum"),
        meanRound6("pix_sum", "n_pixels").as("mean_pixel6"))
      .orderBy("doc_id")

  /** q309 — REAL AUDIO-CODEC decode: each document's bytes become 8-bit
    * unsigned PCM mono samples inside a genuine RIFF/WAVE container
    * (written through the JDK's `javax.sound.sampled` encoder), and
    * [[Multimodal.decodeWav]] parses it back through the same codec
    * stack — container chunks, format negotiation, sample stream. With
    * q307's PNG tier this leaves only COMPRESSED audio/video (mp3/aac/
    * h264) on the stub route, codecs the JVM genuinely does not ship.
    * PCM is lossless, so the oracle recomputes sample stats from the
    * payload construction (the document's own bytes + the hash-derived
    * rate); the codec roundtrip, declared-vs-decoded rate, and
    * corrupt-container rejects are pinned in MultimodalSpec.
    */
  private def q309(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractWavFeatures(Multimodal.wavTable(s, dir))
      .toDF()
      .select(col("doc_id"), col("sample_rate"), col("n_samples"),
        col("sample_sum"),
        when(col("n_samples") === 0, lit(0.0))
          .otherwise(meanRound6("sample_sum", "n_samples"))
          .as("mean_sample6"))
      .orderBy("doc_id")

  /** q310 — IMAGE NEAR-DUP over REAL decoded pixels: the multimodal
    * pipeline composed end-to-end. Documents travel as genuine PNGs
    * ([[Multimodal.pngTable]]), the perceptual hash
    * ([[Multimodal.imageAHash]]) reads each image back through the JDK
    * codec and thresholds 63 sampled raster positions against the image
    * mean, and near-duplicate pairs come from the NAIVE hamming theta
    * self-join (`bit_count(h ⊕ h2) ≤ 1 ∧ id < id2`, q276's authorship
    * doctrine) — which [[graft.plans.HammingJoinBlocking]] plans as a
    * pigeonhole segment equi-join at scale. The oracle recomputes the
    * identical integer aHash from the source plane and replays the
    * all-pairs join; the lookalike synthetic corpus legitimately yields
    * a dense duplicate set (the miner's honest output on it).
    */
  private def q310(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashes = Multimodal.pngTable(s, dir)
      .select("doc_id", "payload").as[Multimodal.MediaRow]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap(r =>
          Multimodal.imageAHash(r.payload).map(h => (r.doc_id, h)))
      }
      .toDF("doc_id", "ahash")
    val y = hashes.select(col("doc_id").as("doc_id2"),
      col("ahash").as("ahash2"))
    hashes.join(y,
        bit_count(col("ahash").bitwiseXOR(col("ahash2"))) <= 1 &&
          col("doc_id") < col("doc_id2"))
      .select(col("doc_id"), col("doc_id2"),
        bit_count(col("ahash").bitwiseXOR(col("ahash2")))
          .cast("int").as("dist"))
      .orderBy("doc_id", "doc_id2")
  }

  /** q49 — native session_window, batch mode, over the events table. */
  private def q49(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .withColumn("ts_ts", Tables.tsMicros(col("ts")))
      .groupBy(session_window(col("ts_ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("n_events"))
      .orderBy("user_id", "session_start")

  /** q58 — tumbling event-time window aggregation (`window()`), the batch
    * twin of the streaming `groupBy(window(...))` path: daily event counts
    * and value totals. Window start surfaces as the oracle's day
    * truncation.
    */
  private def q58(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .withColumn("ts_ts", Tables.tsMicros(col("ts")))
      .groupBy(window(col("ts_ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        moneySum2(col("value")).as("total_value"))
      .select(col("window.start").as("day_start"), col("event_type"),
        col("n_events"), col("total_value"))
      .orderBy("day_start", "event_type")

  /** q59 — sliding (overlapping) windows: 2-day windows sliding by 1 day,
    * so every event lands in two windows. The oracle replicates Spark's
    * epoch-aligned window starts by unnesting the two containing starts
    * per event. Completes the window-aggregation family: tumbling (q58),
    * sliding (q59), session (q49 / streaming).
    */
  private def q59(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .withColumn("ts_ts", Tables.tsMicros(col("ts")))
      .groupBy(window(col("ts_ts"), "2 days", "1 day"))
      .agg(count(lit(1)).as("n_events"),
        moneySum2(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"),
        col("n_events"), col("total_value"))
      .orderBy("win_start")

  override val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q95_media_meta" -> q95 _,
    "q96_media_features" -> q96 _,
    "q298_pgm_decode" -> q298 _,
    "q307_png_decode" -> q307 _,
    "q309_wav_decode" -> q309 _,
    "q310_image_neardup" -> q310 _,
    "q49_session_window" -> q49 _,
    "q58_tumbling_window" -> q58 _,
    "q59_sliding_window" -> q59 _)

  /** q298 and q307 share their oracle algebra: both real-codec tables
    * use the same hash-derived dimensions and zero-padded plane, so the
    * decoded stats recompute identically from the construction. */
  private val pixelStatsOracle =
    """WITH base AS (
      | SELECT doc_id,
      |  CAST(doc_id % 7 * 8 + 16 AS INT) AS width,
      |  CAST(doc_id % 5 * 8 + 16 AS INT) AS height,
      |  text
      | FROM documents),
      |px AS (
      | SELECT doc_id, width, height, width * height AS n_pixels,
      |  CAST(coalesce(list_sum(list_transform(
      |    string_split(text[1:width * height], ''), c -> ascii(c))), 0)
      |   AS BIGINT) AS pix_sum
      | FROM base)
      |SELECT doc_id, width, height, CAST(n_pixels AS INT) AS n_pixels,
      | pix_sum,
      | CAST((2000000 * pix_sum + n_pixels) // (2 * n_pixels)
      |  AS DOUBLE) / 1e6 AS mean_pixel6
      |FROM px ORDER BY doc_id""".stripMargin

  override val oracle: Seq[(String, String)] = Seq(
    "q307_png_decode" -> pixelStatsOracle,
    "q310_image_neardup" ->
      """WITH base AS (
        | SELECT doc_id, CAST(doc_id % 7 * 8 + 16 AS INT) AS w,
        |  CAST(doc_id % 5 * 8 + 16 AS INT) AS h, text
        | FROM documents),
        |px AS (
        | SELECT doc_id, w, h, CAST(w * h AS BIGINT) AS n, text,
        |  CAST(coalesce(list_sum(list_transform(
        |    string_split(text[1:w * h], ''), c -> ascii(c))), 0)
        |   AS BIGINT) AS pix_sum
        | FROM base),
        |hsh AS (
        | SELECT doc_id,
        |  CAST(list_sum(list_transform(generate_series(0, 62), i ->
        |   CASE WHEN (CASE
        |      WHEN (i * (n - 1) // 62) + 1 <= least(length(text), n)
        |      THEN ascii(text[((i * (n - 1) // 62) + 1):
        |                     ((i * (n - 1) // 62) + 1)])
        |      ELSE 0 END) > pix_sum // n
        |    THEN (1::BIGINT << i) ELSE 0 END)) AS BIGINT) AS ahash
        | FROM px)
        |SELECT a.doc_id, b.doc_id AS doc_id2,
        | CAST(bit_count(xor(a.ahash, b.ahash)) AS INT) AS dist
        |FROM hsh a JOIN hsh b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.ahash, b.ahash)) <= 1
        |ORDER BY a.doc_id, doc_id2""".stripMargin,
    "q309_wav_decode" ->
      """WITH s AS (
        | SELECT doc_id,
        |  CAST(doc_id % 2 * 22050 + 22050 AS INT) AS sample_rate,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_samples,
        |  CAST(coalesce(list_sum(list_transform(
        |    string_split(text, ''), c -> ascii(c))), 0) AS BIGINT)
        |   AS sample_sum
        | FROM documents)
        |SELECT doc_id, sample_rate, n_samples, sample_sum,
        | CASE WHEN n_samples = 0 THEN 0.0
        |  ELSE CAST((2000000 * sample_sum + n_samples)
        |   // (2 * n_samples) AS DOUBLE) / 1e6 END
        |  AS mean_sample6
        |FROM s ORDER BY doc_id""".stripMargin,
    "q298_pgm_decode" -> pixelStatsOracle,
    "q95_media_meta" ->
      """SELECT doc_id,
        | (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
        | CAST(doc_id % 7 * 64 + 64 AS INT) AS width,
        | CAST(doc_id % 5 * 64 + 64 AS INT) AS height,
        | CAST(doc_id % 2 * 22050 + 22050 AS INT) AS sample_rate,
        | CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        | md5(text) AS payload_md5,
        | hex(encode(substring(text, 1, 8))) AS head_hex,
        | CAST(greatest(1, least(10,
        |   CAST(ceil(octet_length(encode(text)) / 32.0) AS INT))) AS INT)
        |   AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q96_media_features" ->
      """WITH chars AS (
        |  SELECT doc_id, ascii(substring(text, CAST(i AS INT), 1)) AS b
        |  FROM documents, unnest(generate_series(1, length(text))) AS t(i)),
        |stats AS (
        |  -- from documents, not chars: an empty text has no chars rows but
        |  -- must still yield 16 zero-count bins (Spark side does)
        |  SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes
        |  FROM documents),
        |sums AS (
        |  SELECT doc_id, CAST(sum(b) AS BIGINT) AS byte_sum
        |  FROM chars GROUP BY doc_id),
        |hist AS (
        |  SELECT doc_id, b // 16 AS bin, count(*) AS bin_count
        |  FROM chars GROUP BY 1, 2),
        |grid AS (
        |  SELECT doc_id, unnest(generate_series(0, 15)) AS bin
        |  FROM documents)
        |SELECT g.doc_id, s.n_bytes,
        |  CAST(COALESCE(m.byte_sum, 0) AS BIGINT) AS byte_sum,
        |  CAST(g.bin AS INT) AS bin,
        |  CAST(COALESCE(h.bin_count, 0) AS BIGINT) AS bin_count
        |FROM grid g
        |JOIN stats s ON s.doc_id = g.doc_id
        |LEFT JOIN sums m ON m.doc_id = g.doc_id
        |LEFT JOIN hist h ON h.doc_id = g.doc_id AND h.bin = g.bin
        |ORDER BY g.doc_id, g.bin""".stripMargin,
    "q59_sliding_window" ->
      """WITH w AS (
        | SELECT value, unnest([
        |   CAST(date_trunc('day', ts) AS TIMESTAMP),
        |   CAST(date_trunc('day', ts) AS TIMESTAMP) - INTERVAL 1 DAY
        |  ]) AS win_start
        | FROM events)
        |SELECT win_start, count(*) AS n_events,
        | ((CASE WHEN sum(CAST(round((value) * 10000) AS BIGINT)) >= 0 THEN (sum(CAST(round((value) * 10000) AS BIGINT)) + 50) - (sum(CAST(round((value) * 10000) AS BIGINT)) + 50) % 100 ELSE -((-sum(CAST(round((value) * 10000) AS BIGINT)) + 50) - (-sum(CAST(round((value) * 10000) AS BIGINT)) + 50) % 100) END) / 10000.0) AS total_value
        |FROM w GROUP BY win_start ORDER BY win_start""".stripMargin,
    "q58_tumbling_window" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
        | event_type, count(*) AS n_events,
        | ((CASE WHEN sum(CAST(round((value) * 10000) AS BIGINT)) >= 0 THEN (sum(CAST(round((value) * 10000) AS BIGINT)) + 50) - (sum(CAST(round((value) * 10000) AS BIGINT)) + 50) % 100 ELSE -((-sum(CAST(round((value) * 10000) AS BIGINT)) + 50) - (-sum(CAST(round((value) * 10000) AS BIGINT)) + 50) % 100) END) / 10000.0) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY day_start, event_type""".stripMargin,
    "q49_session_window" ->
      """WITH flagged AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
        |              >= 1800000000 THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sessions AS (
        |  SELECT user_id, ts,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT user_id, min(ts) AS session_start,
        | count(*) AS n_events
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin)
}
