package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Sessions
import graft.functions.Vectors

/** Scale stress proof for CosineJoinBlocking (the opt-in eighth rule):
  * the embeddings corpus ∪ planted cos≈0.999 twins, scaled k× by
  * per-copy deterministic ±1 component masks (norms and WITHIN-copy
  * angles are exactly preserved, so true twins replicate k×; cross-copy
  * angles scatter near orthogonality on this corpus). Both arms run the
  * SAME naive query text `cosine ≥ 0.95 ∧ id < id2`:
  *
  *   - naive arm: conf off (the default) — the exact nested loop,
  *     k² pair evaluations;
  *   - rule arm: `spark.graft.srpjoin.segments=3, bits=24` — the SRP
  *     contract subset through the hamming pigeonhole join.
  *
  * Because the rule is approximate BY CONTRACT, the assertion is not
  * bag equality: the probe asserts rule ⊆ naive (exact precision) and
  * reports measured recall per k alongside the times — the documented
  * contract, quantified. The `bits` arg demonstrates the WIDTH LAW:
  * candidate generation is bucket-quadratic at 2^(bits∕m) buckets per
  * segment, so the signature width must grow with the corpus (the
  * q277 SimHash width law, surfaced here as the rule's conf knob).
  * Usage: sbt "runMain graft.tools.SrpJoinProbe [sfDir] [ks]
  * [naiveMaxK] [segments] [bits]".
  */
object SrpJoinProbe {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val ks = args.lift(1).getOrElse("1,2,4")
      .split(",").map(_.trim.toInt).toSeq
    val naiveMaxK = args.lift(2).map(_.toInt).getOrElse(4)
    val mSeg = args.lift(3).getOrElse("3")
    val nBits = args.lift(4).getOrElse("24")
    val spark = Sessions.local("graft-srpjoin-scale")

    val raw = graft.catalog.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val dims = 64
    val base = raw.unionAll(
      raw.filter(col("vec_id") % 25 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          concat(array(col("v")(0) + lit(0.1)),
            slice(col("v"), 2, dims - 1)).as("v")))

    def scaled(k: Int): DataFrame =
      (0 until k).map { i =>
        // ±1 mask per (copy, dim): xxhash-free deterministic flip
        base.select((col("vec_id") + lit(i * 10000000L)).as("id"),
          zip_with(col("v"),
            transform(sequence(lit(0), lit(dims - 1)),
              d => pmod(hash(lit(i), d), lit(2)) * 2 - 1),
            (x, s) => x * s.cast("double")).as("v"))
      }.reduce(_ unionAll _)

    val segC = "spark.graft.srpjoin.segments"
    val bitC = "spark.graft.srpjoin.bits"

    for (k <- ks) {
      val d = scaled(k)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = d.count()
      val b = d.select(col("id").as("id2"), col("v").as("v2"))
      def cos = Vectors.dot(col("v"), col("v2")) /
        (sqrt(Vectors.dot(col("v"), col("v"))) *
          sqrt(Vectors.dot(col("v2"), col("v2"))))
      def pairs(): Set[(Long, Long)] =
        d.join(b, cos >= lit(0.95) && col("id") < col("id2"))
          .select(col("id"), col("id2")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet

      spark.conf.set(segC, mSeg); spark.conf.set(bitC, nBits)
      val (ruleBag, tRule) = timed(pairs())
      spark.conf.unset(segC); spark.conf.unset(bitC)
      val (naiveBag, tNaive) = if (k <= naiveMaxK) timed(pairs())
        else (null, -1.0)

      val subset = naiveBag == null || ruleBag.subsetOf(naiveBag)
      require(subset, s"k=$k: rule found pairs naive did not — " +
        s"precision broken: ${(ruleBag -- naiveBag).take(5)}")
      val recall = if (naiveBag == null || naiveBag.isEmpty) -1.0
        else ruleBag.size.toDouble / naiveBag.size
      println(s"""{"k":$k,"rows":$n,"rule_pairs":${ruleBag.size},""" +
        s""""naive_pairs":${if (naiveBag == null) -1 else naiveBag.size},""" +
        s""""recall":${f"$recall%.4f"},"rule_sec":${f"$tRule%.2f"},""" +
        s""""naive_sec":${f"$tNaive%.2f"},"subset":$subset}""")
      d.unpersist()
    }
    spark.stop()
  }
}
