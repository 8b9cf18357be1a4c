package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpecBase {

  test("fakeDecode: exact histogram and byte sum over known bytes") {
    val bytes = "AAaa00".getBytes("UTF-8") // 0x41 0x41 0x61 0x61 0x30 0x30
    val (hist, sum) = Multimodal.fakeDecode(bytes)
    assert(hist(0x4) === 2L && hist(0x6) === 2L && hist(0x3) === 2L)
    assert(hist.sum === 6L)
    assert(sum === (0x41 * 2 + 0x61 * 2 + 0x30 * 2).toLong)
  }

  test("extractFeatures runs the mapPartitions batch path end-to-end") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val out = Multimodal.extractFeatures(df).collect()
      .map(f => f.doc_id -> f).toMap
    assert(out(1L).n_bytes === 3)
    assert(out(1L).histogram(6) === 3L) // 'a','b','c' all in bin 0x6
    assert(out(1L).byte_sum === ('a' + 'b' + 'c').toLong)
    assert(out(1L).mean_byte === ('a' + 'b' + 'c') / 3.0)
    assert(out(2L).n_bytes === 0 && out(2L).byte_sum === 0L
      && out(2L).mean_byte === 0.0)
  }

  test("decodePgm: roundtrip against the encoded table") {
    val media = Multimodal.pgmTable(spark, "/root/testdata/sf0.001")
      .select("doc_id", "width", "height", "payload")
      .collect().take(50)
    assert(media.nonEmpty)
    for (r <- media) {
      val img = Multimodal.decodePgm(r.getAs[Array[Byte]]("payload"))
      assert(img.isDefined, s"doc ${r.getLong(0)} must decode")
      assert(img.get.width === r.getInt(1) &&
        img.get.height === r.getInt(2) && img.get.maxVal === 255)
      assert(img.get.pixels.length === r.getInt(1) * r.getInt(2))
    }
  }

  test("decodePgm: real-parser behaviors — comments, whitespace, maxval") {
    def pgm(header: String, planeLen: Int): Array[Byte] =
      header.getBytes("US-ASCII") ++ Array.fill(planeLen)(7.toByte)
    // canonical
    assert(Multimodal.decodePgm(pgm("P5\n3 2\n255\n", 6)).exists(i =>
      i.width == 3 && i.height == 2 && i.maxVal == 255))
    // '#' comments run to end-of-line anywhere between fields
    assert(Multimodal.decodePgm(
      pgm("P5 # made by graft\n 3 # w\n2\t255\n", 6)).exists(i =>
      i.width == 3 && i.height == 2))
    // arbitrary whitespace runs between fields
    assert(Multimodal.decodePgm(pgm("P5\r\n\t 3\n\n2  \t255 ", 6)).isDefined)
    // sub-255 maxval is legal
    assert(Multimodal.decodePgm(pgm("P5\n1 1\n15\n", 1))
      .exists(_.maxVal == 15))
  }

  test("decodePgm: malformations all reject") {
    def pgm(header: String, planeLen: Int): Array[Byte] =
      header.getBytes("US-ASCII") ++ Array.fill(planeLen)(7.toByte)
    val bad = Seq(
      pgm("P6\n3 2\n255\n", 6), // wrong magic (that's binary PPM)
      pgm("P5\n3 2\n255\n", 5), // truncated plane
      pgm("P5\n3 2\n255\n", 7), // trailing garbage
      pgm("P5\n3 2\n65535\n", 6), // 2-byte maxval unsupported here
      pgm("P5\n3\n255\n", 6), // missing height
      pgm("P5\n0 2\n255\n", 0), // zero dimension
      pgm("P5\n3 2\n255", 6), // no whitespace after maxval
      Array[Byte](), // empty
      "just text".getBytes("US-ASCII"))
    for ((p, i) <- bad.zipWithIndex)
      assert(Multimodal.decodePgm(p).isEmpty, s"malformation $i must reject")
  }

  test("decodeImage: PNG roundtrip through the JDK codec is bit-exact") {
    // encode a known gray plane through javax.imageio's PNG writer (a
    // real DEFLATE codec), decode through decodeImage, expect the exact
    // dimensions and pixel sum — PNG grayscale is lossless
    def png(w: Int, h: Int, plane: Array[Byte]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setDataElements(0, 0, w, h, plane)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val plane = Array.tabulate(24 * 16)(i => ((i * 37 + 11) % 256).toByte)
    val expected = plane.map(_ & 0xff).map(_.toLong).sum
    assert(Multimodal.decodeImage(png(24, 16, plane)) ===
      Some((24, 16, expected)))
    // the PNG bytes really are a compressed container, not raw pixels
    val bytes = png(24, 16, plane)
    assert(bytes.take(8).map(_ & 0xff).toSeq ===
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a), "PNG magic")
    assert(bytes.length < 24 * 16, "DEFLATE must compress this plane")
  }

  test("decodeImage: multi-format (BMP lossless, JPEG lossy) and rejects") {
    def imgBytes(fmt: String, w: Int, h: Int,
        plane: Array[Byte]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setDataElements(0, 0, w, h, plane)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val plane = Array.tabulate(16 * 16)(i => ((i * 31 + 5) % 256).toByte)
    val exact = plane.map(_ & 0xff).map(_.toLong).sum
    // BMP stores the plane uncompressed — roundtrip is exact too
    assert(Multimodal.decodeImage(imgBytes("bmp", 16, 16, plane)) ===
      Some((16, 16, exact)))
    // JPEG is lossy: dimensions survive, the sum only approximately
    val Some((jw, jh, jsum)) =
      Multimodal.decodeImage(imgBytes("jpg", 16, 16, plane))
    assert((jw, jh) === (16, 16))
    assert(math.abs(jsum - exact) < exact / 10, "JPEG sum within 10%")
    // corrupt stream (valid magic, truncated body) and garbage reject
    val truncated = imgBytes("png", 16, 16, plane).take(40)
    assert(Multimodal.decodeImage(truncated).isEmpty, "truncated PNG")
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
    assert(Multimodal.decodeImage(Array[Byte]()).isEmpty)
  }

  test("pngTable payloads decode to the documents' own bytes") {
    val media = Multimodal.pngTable(spark, "/root/testdata/sf0.001")
    val feats = Multimodal.extractImageFeatures(media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(feats.size === media.count(), "every PNG must decode")
    // recompute from the construction for a sample of docs
    val docs = graft.catalog.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for (id <- docs.keys.take(25)) {
      val (w, h) = ((id % 7 * 8 + 16).toInt, (id % 5 * 8 + 16).toInt)
      val bytes = docs(id).getBytes("UTF-8").take(w * h)
      val f = feats(id)
      assert((f.width, f.height) === (w, h), s"doc $id dims")
      assert(f.pix_sum === bytes.map(_ & 0xff).map(_.toLong).sum,
        s"doc $id pixel sum (padding contributes 0)")
    }
  }

  test("decodeWav: RIFF/WAVE roundtrip through the JDK codec is exact") {
    def wav(rate: Int, samples: Array[Byte]): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
        rate.toFloat, 8, 1, 1, rate.toFloat, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(samples), fmt,
        samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val samples = Array.tabulate(1000)(i => ((i * 13 + 7) % 256).toByte)
    val expected = samples.map(_ & 0xff).map(_.toLong).sum
    val bytes = wav(44100, samples)
    // a real container: RIFF magic + WAVE form type, not bare samples
    assert(new String(bytes.take(4), "US-ASCII") === "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") === "WAVE")
    assert(Multimodal.decodeWav(bytes) ===
      Some((44100.0f, 1000L, expected)))
    // declared rate surfaces from the container, not from metadata
    assert(Multimodal.decodeWav(wav(22050, samples)).get._1 === 22050.0f)
    // empty sample stream decodes to an empty, valid file
    assert(Multimodal.decodeWav(wav(44100, Array[Byte]())) ===
      Some((44100.0f, 0L, 0L)))
    // corrupt container and garbage reject
    assert(Multimodal.decodeWav(bytes.take(20)).isEmpty, "truncated WAV")
    assert(Multimodal.decodeWav("not audio at all".getBytes).isEmpty)
  }

  test("q310's naive hamming join is the engine's to plan at scale") {
    // the composed multimodal pipeline: real-codec decode → aHash →
    // NAIVE theta join; above the broadcast threshold the hamming rule
    // must plan the pigeonhole segment equi-join (forced here via -1)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val r = SparkEntry.queries("q310_image_neardup")(
        spark, "/root/testdata/sf0.001")
      val p = r.queryExecution.executedPlan.toString
      assert(p.contains("graft_seg"),
        s"hamming rule must plan the aHash join:\n${p.take(3000)}")
    } finally spark.conf.set(key, old)
  }

  test("frameSample strides through the payload as 1-byte frames") {
    val s = spark
    import s.implicits._
    val df = Seq(("abcdefgh" * 8)).toDF("text") // 64 bytes
      .select(col("text").cast("binary").as("payload"))
    val frames = df.select(
      Multimodal.frameSample(col("payload"), 32, 10).as("f"))
      .selectExpr("transform(f, x -> decode(x, 'UTF-8')) AS chars")
      .head().getSeq[String](0)
    assert(frames === Seq("a", "a")) // bytes 1 and 33, both 'a'
  }
}
