package graft

import org.apache.spark.sql.functions._

/** The native one-pass [[graft.functions.MinHashSig]] must be bit-identical
  * to the layered HOF construction it replaces — q62's oracle parity rides
  * on it.
  */
class MinHashSigSpec extends SparkSpecBase {

  test("graft_minhash ≡ array_min(transform(md5-windows)) for all k") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(100)(Seq.fill(rnd.nextInt(30) + 1)(
      rnd.alphanumeric.take(12).mkString))
    val df = rows.toDF("sh")
      .withColumn("m", transform(col("sh"), x => md5(x)))
      .withColumn("hs", call_function("graft_minhash", col("sh"), lit(8)))
    (0 until 8).foreach { i =>
      val mismatches = df.filter(
        !(element_at(col("hs"), i + 1) <=>
          array_min(transform(col("m"), x => substring(x, 4 * i + 1, 8)))))
        .count()
      assert(mismatches === 0L, s"window $i diverges from HOF form")
    }
  }

  test("graft_minhash: empty array yields null minima, null input → null") {
    val s = spark
    import s.implicits._
    val df = Seq(Some(Seq.empty[String]), None).toDF("sh")
      .withColumn("hs", call_function("graft_minhash", col("sh"), lit(2)))
    val rows = df.select("hs").collect()
    assert(rows(0).getSeq[String](0) === Seq(null, null))
    assert(rows(1).isNullAt(0))
  }
}
