package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Sessions

/** Scale stress proof for the q260 SRP-LSH embedding near-dup path: a k×
  * corpus with CONSTANT planted-twin density, timing the 3-segment
  * pigeonhole candidate join against the all-pairs hamming scan, at both
  * the 16-bit toy width and the 32-bit production-law width (SimHash/SRP
  * width must grow ~2·log₂ n — a property of the operator, not the
  * blocking; same law BASELINE.md's SimHash probe measured for q63).
  *
  * Corpus construction: copy i of the embeddings table cyclically ROTATES
  * the dimension axis by i — an orthogonal transform, so every copy has
  * exactly the base corpus's internal pairwise-cosine structure, while
  * cross-copy cosines stay in the synthetic corpus's near-orthogonal
  * noise band (« τ), and cross-copy SRP signatures decorrelate (fixed
  * per-dim hyperplane weights meet rotated vectors). Twins are planted
  * with q260's rule (`vec_id % 25 == 0`, +0.1 on the first component);
  * the 10⁷·i id offset is ≡ 0 (mod 25), so planted density is constant
  * in k. Segment and all-pairs candidate sets are asserted IDENTICAL
  * (pigeonhole is a guarantee) for k ≤ oldMaxK.
  *
  * Usage: sbt "runMain graft.tools.SrpScaleProbe [sfDir] [ks] [oldMaxK]"
  * Prints one JSON line per (k, bits).
  */
object SrpScaleProbe {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private val dims = 64

  private def weights(planes: Int): Array[Array[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(planes, dims) { (p, d) =>
      val hex = md.digest(s"srp|$p|$d".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(8)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1 else -1
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ks = args.lift(1).getOrElse("1,2,4,8")
      .split(",").map(_.trim.toInt).toSeq
    val oldMaxK = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = Sessions.local("graft-srp-scale")
    // keep the all-pairs baseline HONEST: the HammingJoinBlocking rule
    // would otherwise rewrite it into the very segment join under test
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "graft.plans.HammingJoinBlocking")
    val base = graft.catalog.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

    // copy i rotates the dimension axis by i (orthogonal: preserves all
    // within-copy dots, decorrelates against the fixed hyperplanes)
    def scaled(k: Int): DataFrame =
      (0 until k).map { i =>
        if (i == 0) base
        else base.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
          concat(slice(col("v"), i + 1, dims - i),
            slice(col("v"), 1, i)).as("v"))
      }.reduce(_ union _)

    def sigsOf(corpus: DataFrame, bits: Int): DataFrame = {
      val w = weights(bits)
      val quant = corpus
        .unionAll(corpus.filter(col("vec_id") % 25 === 0)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            concat(array(col("v")(0) + lit(0.1)),
              slice(col("v"), 2, dims - 1)).as("v")))
        .withColumn("scale",
          array_max(transform(col("v"), x => abs(x))) / 127.0)
        .withColumn("qv",
          transform(col("v"), x => floor(x / col("scale") + 0.5).cast("int")))
      val sig = (0 until bits).map { p =>
        val wp = array(w(p).map(lit(_)): _*)
        val dot = aggregate(zip_with(col("qv"), wp, (x, y) => x * y),
          lit(0L), (acc, x) => acc + x)
        when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
      quant.select(col("vec_id"), sig.as("sig"))
    }

    def segPairs(sigs: DataFrame, bits: Int): DataFrame = {
      val segBits = bits / 3
      val segs = sigs.select(col("vec_id"), col("sig"),
          explode(array((0 until 3).map { i =>
            val lo = i * segBits
            val width = if (i == 2) bits - 2 * segBits else segBits
            struct(lit(i).as("seg_idx"),
              shiftright(col("sig"), lo)
                .bitwiseAND(lit((1L << width) - 1)).as("seg_val"))
          }: _*)).as("seg"))
        .select(col("vec_id"), col("sig"),
          col("seg.seg_idx").as("seg_idx"), col("seg.seg_val").as("seg_val"))
      segs.alias("x").join(segs.alias("y"),
          col("x.seg_idx") === col("y.seg_idx") &&
            col("x.seg_val") === col("y.seg_val") &&
            col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
          bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).as("h"))
        .filter(col("h") <= 2)
        .distinct()
    }

    def allPairs(sigs: DataFrame): DataFrame =
      sigs.alias("x").join(sigs.alias("y"),
          col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
          bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).as("h"))
        .filter(col("h") <= 2)

    for (k <- ks; bits <- Seq(16, 32)) {
      val corpus = scaled(k)
      val sigs = sigsOf(corpus, bits)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = sigs.count()
      val nPlanted = sigs.filter(col("vec_id") >= 1000000L &&
        col("vec_id") % 10000000L >= 1000000L).count()
      val (segN, tSeg) = timed(segPairs(sigs, bits).count())
      val plantedFound = segPairs(sigs, bits)
        .filter(col("b") === col("a") + 1000000L &&
          col("a") % 25 === 0).count()
      val (apN, tAp) = if (k <= oldMaxK) {
        val (c, t) = timed(allPairs(sigs).count())
        (c, t)
      } else (-1L, -1.0)
      if (k <= oldMaxK) {
        val diff = segPairs(sigs, bits).select("a", "b")
          .exceptAll(allPairs(sigs).select("a", "b")).count() +
          allPairs(sigs).select("a", "b")
            .exceptAll(segPairs(sigs, bits).select("a", "b")).count()
        require(diff == 0, s"pigeonhole mismatch at k=$k bits=$bits")
      }
      println(s"""{"k":$k,"bits":$bits,"n":$n,"planted":$nPlanted,""" +
        s""""seg_pairs":$segN,"t_seg":${f"$tSeg%.2f"},""" +
        s""""recall":${f"${plantedFound.toDouble / math.max(1, nPlanted)}%.3f"},""" +
        s""""allpairs":$apN,"t_allpairs":${f"$tAp%.2f"}}""")
      sigs.unpersist()
    }
    spark.stop()
  }
}
