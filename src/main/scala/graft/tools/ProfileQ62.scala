package graft.tools

import org.apache.spark.sql.functions._
import graft.Sessions
import graft.catalog.Tables

/** Throwaway: stage-by-stage timing of the q62 pipeline at a given SF. */
object ProfileQ62 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local("profile-q62")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[t] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    import graft.queries.DedupPack
    // piecewise replica of q62
    def toks(c: org.apache.spark.sql.Column) =
      filter(split(c, " "), x => x =!= lit(""))
    def shingles(text: org.apache.spark.sql.Column) = {
      val tk = toks(text)
      when(size(tk) < 3, array(concat_ws(" ", tk)))
        .otherwise(array_distinct(transform(
          sequence(lit(1), size(tk) - 2),
          i => concat_ws(" ", element_at(tk, i), element_at(tk, i + 1),
            element_at(tk, i + 2)))))
    }
    val d = Tables.loadParallel(spark, dir, "documents")
      .select("doc_id", "text")
    val doubled = d.union(
      d.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val sig0 = doubled
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .withColumn("m", transform(col("sh"), x => md5(x)))
    val sig = sig0.select(Seq(col("doc_id"), col("sh")) ++
      (0 until 8).map(i => array_min(transform(col("m"),
        x => substring(x, 4 * i + 1, 8))).as(s"h$i")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("materialize sig")(sig.count())
    val banded = sig.select(col("doc_id"),
      explode(array((0 until 4).map(b => md5(concat(lit(s"$b|"),
        col(s"h${2 * b}"), col(s"h${2 * b + 1}")))): _*)).as("band"))
    t("banded count")(println(banded.count()))
    t("band key cardinality")(println(
      banded.select("band").distinct().count()))
    val pairs = banded.alias("x")
      .join(banded.alias("y"),
        col("x.band") === col("y.band") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("doc_id2"))
      .distinct()
    t("pairs count")(println(pairs.count()))
    val sets = sig.select(col("doc_id"), col("sh"))
    val verified = pairs
      .join(sets, "doc_id")
      .join(sets.select(col("doc_id").as("doc_id2"), col("sh").as("sh2")),
        "doc_id2")
      .withColumn("jaccard",
        size(array_intersect(col("sh"), col("sh2"))) /
          size(array_union(col("sh"), col("sh2"))))
      .filter(col("jaccard") >= 0.9)
    t("verified count")(println(verified.count()))
    t("full q62 via pack")(
      println(graft.queries.DedupPack.queries.toMap
        .apply("q62_minhash_lsh")(spark, dir).count()))
    spark.stop()
  }
}
