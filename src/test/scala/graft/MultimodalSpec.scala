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
