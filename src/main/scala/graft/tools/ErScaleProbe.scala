package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.Sessions

/** Scale stress proof for the q251 entity-resolution path, mirroring
  * DedupScaleProbe's method: synthesize a k× customer registry with
  * CONSTANT duplicate density and measure rare-gram blocking as k grows.
  *
  * Registry construction: copy i shifts keys by i·10⁷ and rotates every
  * DIGIT of the name by i (`translate`) — a character bijection on the
  * digit alphabet, so each copy carries the base registry's internal
  * near-dup structure while its digit-bearing grams (the discriminative
  * ones) are value-disjoint from other copies *as pre-images*. The
  * variant-insertion (md5-selected quarter, suffix typo) then plants the
  * usual dups inside each copy.
  *
  * The quantity under test is the BLOCKING-KEY SPACE. Character 3-grams
  * of zero-padded numeric ids live in a ~10³ digit-space: as n grows the
  * space saturates, per-gram document frequency rises ∝ n, and rare-gram
  * blocks grow with it — candidates trend toward n². With 5-grams (10⁵
  * space) the same corpus keeps blocks near-constant and candidates
  * near-linear. Same law as SimHash width (q63: bits ~ 2·log₂ n):
  * **the blocking key space must outgrow the corpus — |Σ|^ℓ ≫ n is a
  * property of the operator, not of the data.** Verification is held
  * fixed (3-gram Jaccard ≥ 0.9 + field agreement, the q251 contract) so
  * only candidate generation varies; recall of the planted variant pairs
  * is asserted 100% for BOTH lengths (the ≤1-novel-gram proof in the
  * q251 scaladoc is length-independent).
  *
  * Usage: sbt "runMain graft.tools.ErScaleProbe [sfDir] [ks]"
  * Prints one JSON line per k.
  */
object ErScaleProbe {

  private val ErOffset = 5000000L
  private val CopyShift = 10000000L

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def md5Hash32(id: Column, salt: String): Column =
    conv(substring(md5(concat(lit(s"$salt|"), id.cast("string"))), 1, 8),
      16, 10).cast("long")

  private def charGrams(nm: Column, len: Int): Column =
    when(length(nm) < len, array(nm))
      .otherwise(array_distinct(transform(
        sequence(lit(1), length(nm) - (len - 1)),
        i => nm.substr(i, lit(len)))))

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ks = args.lift(1).getOrElse("1,2,4,8")
      .split(",").map(_.trim.toInt).toSeq
    val spark = Sessions.local("graft-er-scale")
    val base = graft.catalog.Tables.load(spark, dir, "customer")
      .select(col("c_custkey").as("rec_id"), col("c_name").as("raw_name"),
        col("c_nationkey").as("nation"), col("c_mktsegment").as("segment"))

    def scaled(k: Int): DataFrame =
      (0 until k).map { i =>
        val rot = "0123456789".map(c => (('0' + (c - '0' + i) % 10)).toChar)
        base.select((col("rec_id") + lit(i * CopyShift)).as("rec_id"),
          translate(col("raw_name"), "0123456789", rot).as("raw_name"),
          col("nation"), col("segment"))
      }.reduce(_ union _)

    for (k <- ks) {
      val reg = scaled(k)
      val dirty = reg.unionByName(
        reg.filter(md5Hash32(col("rec_id"), "erdup") % 4 === 0)
          .select((col("rec_id") + ErOffset).as("rec_id"),
            upper(concat(col("raw_name"), lit("x"))).as("raw_name"),
            col("nation"), col("segment")))
        .withColumn("nm", lower(col("raw_name")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nRecords = dirty.count()
      // verification grams fixed at the q251 contract (3-grams)
      val recs = dirty.select(col("rec_id"), col("nation"), col("segment"),
        charGrams(col("nm"), 3).as("vgrams"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      recs.count()

      def block(gramLen: Int): (Long, Double, Long, Long) = {
        val gr = dirty.select(col("rec_id"),
          explode(charGrams(col("nm"), gramLen)).as("g"))
        val gdf = gr.groupBy("g").agg(count(lit(1)).as("df"))
        val rare = gr.join(gdf, Seq("g"))
          .withColumn("rk", row_number().over(
            Window.partitionBy("rec_id").orderBy(col("df"), col("g"))))
          .filter(col("rk") <= 2)
          .select(col("rec_id"), col("g"))
        val cand = rare
          .join(rare.select(col("rec_id").as("rec_id2"), col("g")), Seq("g"))
          .filter(col("rec_id") < col("rec_id2"))
          .select("rec_id", "rec_id2").distinct()
          .persist(StorageLevel.MEMORY_AND_DISK)
        val (nCand, tCand) = timed(cand.count())
        val verified = cand
          .join(recs, Seq("rec_id"))
          .join(recs.select(col("rec_id").as("rec_id2"),
            col("vgrams").as("vgrams2"), col("nation").as("nation2"),
            col("segment").as("segment2")), Seq("rec_id2"))
          .filter(col("nation") === col("nation2") &&
            col("segment") === col("segment2") &&
            size(array_intersect(col("vgrams"), col("vgrams2")))
              .cast("double") /
              size(array_union(col("vgrams"), col("vgrams2"))) >= 0.9)
          .select("rec_id", "rec_id2")
          .persist(StorageLevel.MEMORY_AND_DISK)
        val nVer = verified.count()
        // planted-pair recall: variant K+offset must pair with source K
        val nFound = verified
          .filter(col("rec_id2") === col("rec_id") + ErOffset).count()
        Seq(cand, verified).foreach(_.unpersist())
        (nCand, tCand, nVer, nFound)
      }

      val nVariants = nRecords - k.toLong *
        base.count() // variants = dirty − k copies of base
      val (c3, t3, v3, f3) = block(3)
      val (c5, t5, v5, f5) = block(5)
      // the q251 auto-ℓ arm: the SAME sizing rule the shipped query
      // applies in-plan — must track the good curve at every k
      val lAuto = graft.queries.ResolutionPack.blockLenOf(nRecords)
      val (ca, ta, va, fa) = block(lAuto)
      if (f3 != nVariants || f5 != nVariants || fa != nVariants)
        sys.error(s"recall break at k=$k: planted=$nVariants " +
          s"found3=$f3 found5=$f5 foundAuto=$fa")
      println(s"""{"k":$k,"n_records":$nRecords,""" +
        s""""n_variants":$nVariants,""" +
        s""""cand_3gram":$c3,"t_3gram":${f"$t3%.2f"},""" +
        s""""verified_3gram":$v3,""" +
        s""""cand_5gram":$c5,"t_5gram":${f"$t5%.2f"},""" +
        s""""verified_5gram":$v5,""" +
        s""""l_auto":$lAuto,"cand_auto":$ca,"t_auto":${f"$ta%.2f"},""" +
        s""""verified_auto":$va,"recall":1.0}""")
      Seq(recs, dirty).foreach(_.unpersist())
    }
    spark.stop()
  }
}
