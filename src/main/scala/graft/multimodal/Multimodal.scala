package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Tables

/** Multimodal-column plumbing: image/audio/video payloads modeled as opaque
  * `binary` columns with typed metadata, plus batched feature extraction.
  *
  * THREE decode tiers, by how real the codec is:
  *   1. [[decodeImage]] — the JDK's `javax.imageio` (java.desktop module:
  *      PNG/JPEG/GIF/BMP/TIFF readers, an actual DEFLATE/Huffman codec
  *      stack, zero external dependencies) over REAL PNGs that
  *      [[pngTable]] encodes through the same library (q307);
  *   2. [[decodeWav]] — the JDK's `javax.sound.sampled` RIFF/WAVE codec
  *      over REAL WAV files that [[wavTable]] encodes through the same
  *      library (q309) — the audio modality decodes for real too;
  *   3. [[decodePgm]] — a genuine Netpbm P5 parser written here, over
  *      valid images [[pgmTable]] encodes with native expressions (q298)
  *      — real decode of a published format that needs no library;
  *   4. [[fakeDecode]] — a clearly-marked deterministic stub for the
  *      modalities whose codecs the JVM does NOT ship (COMPRESSED
  *      audio — mp3/aac — and video); the plumbing around it is
  *      identical.
  * Whatever the tier, the Spark side (schema, binary columns, batch
  * iteration shape, partitioning) is oracle/spec-tested. In PySpark this
  * stage would be
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

  /** STUB decoder — deterministic fake standing in for the decode of
    * modalities whose codecs the JVM does not ship (compressed
    * audio — mp3/aac — and video; images decode for REAL via
    * [[decodeImage]], PCM audio via [[decodeWav]]). Consumes
    * the payload bytes in one pass
    * and emits a 16-bin byte histogram + exact byte sum: the *shape* of a
    * feature extractor (bounded output per row, single sequential read of
    * the payload), which is what the pipeline plumbing cares about. Swap
    * the body for a real decoder (???) when such codecs exist; the Spark
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

  // --- REAL codec: Netpbm P5 (binary PGM) ----------------------------------

  /** A media table whose payloads are REAL images: each document's bytes
    * become the pixel plane of a valid Netpbm P5 (binary PGM) grayscale
    * image — a published, codec-free format, so the decode step below is
    * a genuine parser rather than [[fakeDecode]]'s stand-in. The header
    * is built with native string expressions; the pixel plane is the
    * UTF-8 text zero-padded/truncated to width×height via binary rpad.
    * Dimensions vary per document (hash-derived), so the parser's field
    * reading is actually exercised.
    */
  def pgmTable(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        (col("doc_id") % 7 * 8 + 16).cast("int").as("width"),
        (col("doc_id") % 5 * 8 + 16).cast("int").as("height"),
        col("text"))
      .select(col("doc_id"), col("width"), col("height"),
        expr("cast(concat(" +
          "cast(concat('P5\n', cast(width as string), ' ', " +
          "cast(height as string), '\n255\n') as binary), " +
          "rpad(cast(text as binary), width * height, X'00')) as binary)")
          .as("payload"))

  final case class PgmImage(width: Int, height: Int, maxVal: Int,
      pixels: Array[Byte])

  /** REAL Netpbm P5 parser (the published netpbm spec): `P5` magic,
    * whitespace runs and `#`-to-end-of-line comments between header
    * fields, three decimal fields (width, height, maxval ≤ 255), exactly
    * ONE whitespace byte after maxval, then exactly width×height raw
    * pixel bytes. Returns None on ANY malformation — truncated planes,
    * trailing garbage, missing fields, out-of-range maxval.
    */
  def decodePgm(payload: Array[Byte]): Option[PgmImage] = {
    if (payload.length < 2 || payload(0) != 'P'.toByte ||
      payload(1) != '5'.toByte) return None
    var i = 2
    def isWs(b: Byte): Boolean =
      b == ' '.toByte || b == '\n'.toByte || b == '\r'.toByte ||
        b == '\t'.toByte
    def skipWsAndComments(): Unit = {
      var go = true
      while (go && i < payload.length) {
        if (isWs(payload(i))) i += 1
        else if (payload(i) == '#'.toByte) {
          while (i < payload.length && payload(i) != '\n'.toByte) i += 1
        } else go = false
      }
    }
    def readField(): Int = {
      skipWsAndComments()
      val s = i
      while (i < payload.length && payload(i) >= '0'.toByte &&
        payload(i) <= '9'.toByte) i += 1
      if (i == s || i - s > 7) -1
      else new String(payload, s, i - s, "US-ASCII").toInt
    }
    val w = readField()
    val h = readField()
    val m = readField()
    if (w <= 0 || h <= 0 || m <= 0 || m > 255) return None
    // exactly one whitespace byte separates maxval from the plane
    if (i >= payload.length || !isWs(payload(i))) return None
    i += 1
    val n = w.toLong * h.toLong
    if (n > Int.MaxValue || payload.length - i != n.toInt) return None
    Some(PgmImage(w, h, m,
      java.util.Arrays.copyOfRange(payload, i, payload.length)))
  }

  final case class PgmFeatures(doc_id: Long, width: Int, height: Int,
      n_pixels: Int, pix_sum: Long, mean_pixel: Double)

  /** Batched REAL decode + feature extraction — the same sanctioned
    * mapPartitions batch shape as [[extractFeatures]], but the body is
    * the genuine [[decodePgm]] parser; undecodable payloads are dropped
    * (the DLQ shape — count them upstream via `decodePgm(..).isEmpty`
    * if the pipeline needs the audit).
    */
  def extractPgmFeatures(media: DataFrame): Dataset[PgmFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "payload").as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          decodePgm(r.payload).map { img =>
            var sum = 0L
            var j = 0
            while (j < img.pixels.length) {
              sum += img.pixels(j) & 0xff; j += 1
            }
            val n = img.width * img.height
            PgmFeatures(r.doc_id, img.width, img.height, n, sum,
              if (n == 0) 0.0 else sum.toDouble / n)
          }
        }
      }
  }

  // --- REAL codec: PNG (and friends) via the JDK's javax.imageio -----------

  /** A media table whose payloads are REAL PNGs: each document's bytes
    * become the gray plane of a width×height 8-bit grayscale image,
    * encoded through the JDK's PNG writer (`javax.imageio`, java.desktop
    * module) — an actual DEFLATE-compressed codec, not a header format.
    * Same hash-derived dimensions and zero-padded/truncated plane as
    * [[pgmTable]], so the two real-codec tiers share their oracle
    * algebra. Encoding runs in the sanctioned mapPartitions batch shape
    * (the write IS a codec invocation, not a column expression).
    */
  def pngTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        (col("doc_id") % 7 * 8 + 16).cast("int").as("width"),
        (col("doc_id") % 5 * 8 + 16).cast("int").as("height"),
        col("text"))
      .select(col("doc_id"), col("width"), col("height"),
        expr("rpad(cast(text as binary), width * height, X'00')")
          .as("plane"))
      .as[(Long, Int, Int, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // no temp-file cache
        rows.map { case (id, w, h, plane) =>
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          img.getRaster.setDataElements(0, 0, w, h, plane)
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, bos.toByteArray)
        }
      }
      .toDF("doc_id", "payload")
  }

  /** REAL image decode through `javax.imageio` — whatever readers the
    * JDK registers (PNG, JPEG, GIF, BMP, TIFF, WBMP): container parse,
    * pixel-data inflation, raster access. Returns the gray-plane
    * (band 0) dimensions and exact sample sum; None when no registered
    * reader accepts the bytes or the stream is corrupt. PNG grayscale is
    * lossless, so a [[pngTable]] roundtrip reproduces the source plane
    * bit-exactly (MultimodalSpec pins it, and BMP's uncompressed
    * roundtrip too).
    */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Long)] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val raster = img.getRaster
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
          y += 1
        }
        Some((w, h, sum))
      }
    } catch { case _: java.io.IOException => None }

  /** Sampled-position AVERAGE HASH (aHash) over a decoded gray raster —
    * the perceptual-hash step of an image near-dup pipeline: 63 evenly
    * spaced raster positions (row-major linear index
    * `i·(n−1)/62`, integer division; 63 bits keep the sign bit clear),
    * bit i set iff the sample exceeds
    * the image's integer mean (Σ/n). Every quantity is exact integer
    * arithmetic on decoded pixel values, so an oracle can recompute the
    * hash from the source plane — while THIS path reads the pixels
    * through the real codec ([[decodeImage]]'s raster).
    */
  def imageAHash(payload: Array[Byte]): Option[Long] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val n = w.toLong * h.toLong
        val raster = img.getRaster
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
          y += 1
        }
        val mean = sum / n
        var hash = 0L
        var i = 0
        while (i < 63) {
          val idx = i.toLong * (n - 1) / 62L
          val s = raster.getSample((idx % w).toInt, (idx / w).toInt, 0)
          if (s > mean) hash |= (1L << i)
          i += 1
        }
        Some(hash)
      }
    } catch { case _: java.io.IOException => None }

  /** Batched REAL codec decode + feature extraction — identical batch
    * shape to [[extractPgmFeatures]], with the JDK codec stack as the
    * body; unreadable payloads are dropped (the DLQ shape).
    */
  def extractImageFeatures(media: DataFrame): Dataset[PgmFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "payload").as[MediaRow]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { r =>
          decodeImage(r.payload).map { case (w, h, sum) =>
            val n = w * h
            PgmFeatures(r.doc_id, w, h, n, sum,
              if (n == 0) 0.0 else sum.toDouble / n)
          }
        }
      }
  }

  // --- REAL codec: WAV via the JDK's javax.sound.sampled -------------------

  /** A media table whose payloads are REAL WAV files: each document's
    * bytes become 8-bit unsigned PCM mono samples at a hash-derived
    * sample rate, written through the JDK's WAV encoder
    * (`javax.sound.sampled.AudioSystem`, java.desktop module) — the
    * audio sibling of [[pngTable]]. PCM is lossless, so the decoded
    * sample stream reproduces the document bytes exactly.
    */
  def wavTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        (col("doc_id") % 2 * 22050 + 22050).cast("int").as("rate"),
        col("text").cast("binary").as("samples"))
      .as[(Long, Int, Array[Byte])]
      .mapPartitions { rows =>
        // the RIFF/WAVE container is hand-assembled here (44-byte
        // canonical PCM header): this is FIXTURE construction — the
        // codec claim lives on the DECODE side, which still runs the
        // genuine javax.sound.sampled stack (and MultimodalSpec's
        // roundtrip pin builds ITS payloads through the JDK encoder).
        // The encoder used to run per row, and AudioSystem.write's
        // provider lookup serializes under 32 threads — measured as
        // q309's 2× past-linear drift in the sf1 stress sweep.
        rows.map { case (id, rate, samples) =>
          val n = samples.length
          // RIFF chunks are word-aligned: an odd-length data chunk
          // carries one zero PAD byte, counted in the RIFF size but
          // NOT in the data chunk size (the JDK decoder tolerates a
          // final unpadded chunk; strict parsers may not)
          val pad = n & 1
          val out = java.nio.ByteBuffer.allocate(44 + n + pad)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          out.put("RIFF".getBytes("US-ASCII")).putInt(36 + n + pad)
            .put("WAVE".getBytes("US-ASCII"))
            .put("fmt ".getBytes("US-ASCII")).putInt(16)
            .putShort(1) // PCM
            .putShort(1) // mono
            .putInt(rate)
            .putInt(rate) // byte rate = rate · 1 ch · 1 B
            .putShort(1) // block align
            .putShort(8) // bits/sample (8-bit PCM is UNSIGNED in RIFF)
            .put("data".getBytes("US-ASCII")).putInt(n)
            .put(samples)
          if (pad == 1) out.put(0.toByte)
          (id, out.array())
        }
      }
      .toDF("doc_id", "payload")
  }

  final case class WavFeatures(doc_id: Long, sample_rate: Int,
      n_samples: Long, sample_sum: Long, mean_sample: Double)

  /** REAL audio decode through `javax.sound.sampled`: RIFF/WAVE
    * container parse (fmt/data chunks, sample rate, channels, bit
    * depth) and the PCM sample stream. None when the bytes aren't a
    * supported audio file. For the 8-bit unsigned mono PCM that
    * [[wavTable]] writes, the decoded bytes ARE the original samples.
    */
  def decodeWav(payload: Array[Byte]): Option[(Float, Long, Long)] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val rate = ais.getFormat.getSampleRate
        val buf = new Array[Byte](8192)
        var n = 0L
        var sum = 0L
        var read = ais.read(buf)
        while (read > 0) {
          var i = 0
          while (i < read) { sum += buf(i) & 0xff; i += 1 }
          n += read
          read = ais.read(buf)
        }
        Some((rate, n, sum))
      } finally ais.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** Batched REAL audio decode — the same sanctioned mapPartitions
    * batch shape; undecodable payloads drop (the DLQ shape). */
  def extractWavFeatures(media: DataFrame): Dataset[WavFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "payload").as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          decodeWav(r.payload).map { case (rate, n, sum) =>
            WavFeatures(r.doc_id, rate.toInt, n, sum,
              if (n == 0) 0.0 else sum.toDouble / n)
          }
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
