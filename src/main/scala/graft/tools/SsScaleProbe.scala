package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Sessions

/** Scale stress proof for SetSimilarityJoinBlocking (q338's Jaccard
  * join): document token sets scaled k× by NAMESPACE-TAGGING every
  * token with a per-copy prefix (cross-copy intersections are empty,
  * so the true pair set grows exactly k× and prefix-token buckets stay
  * flat by construction). The law this regime separates: the naive
  * theta join evaluates |n|² intersect/union pairs — k² growth with a
  * per-pair set-op cost — while the prefix-filtered rewrite generates
  * candidates through token hash buckets — k¹. Both forms run, are
  * timed, and are asserted to produce IDENTICAL pair bags.
  *
  * Usage: sbt "runMain graft.tools.SsScaleProbe [sfDir] [ks]
  * [naiveMaxK]". Prints one JSON line per k.
  */
object SsScaleProbe {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val ks = args.lift(1).getOrElse("1,2,4,8")
      .split(",").map(_.trim.toInt).toSeq
    val naiveMaxK = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = Sessions.local("graft-ss-scale")

    val base = graft.catalog.Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("id"),
        array_distinct(graft.queries.TextOps.toks(col("text"))).as("tk"))

    def scaled(k: Int): DataFrame =
      (0 until k).map { i =>
        base.select((col("id") + lit(i * 100000000L)).as("id"),
          transform(col("tk"),
            x => concat(lit(i.toString), lit("_"), x)).as("tk"))
      }.reduce(_ union _)

    for (k <- ks) {
      val d = scaled(k)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = d.count()
      val b = d.select(col("id").as("id2"), col("tk").as("tk2"))

      // the naive text — what a user writes; the rule plans it
      def pairs(): DataFrame = d.join(b,
        size(array_intersect(col("tk"), col("tk2"))) >=
          lit(0.8) * size(array_union(col("tk"), col("tk2"))) &&
          col("id") < col("id2"))
        .select(col("id"), col("id2"))

      val rule = "graft.plans.SetSimilarityJoinBlocking"

      def bag() = pairs().groupBy("id", "id2").count()
        .agg(count(lit(1)), sum(col("count")),
          sum(hash(col("id"), col("id2")) * col("count")))
        .collect().head

      val (ruleBag, tRule) =
        RuleToggle.withIncluded(spark, rule)(timed(bag()))
      // frequency-ordered arm: top tokens of THIS corpus as stopTokens
      // (what graft.tools.TokenStats computes offline) — identical bag
      // required, time reported separately
      val stops = d.select(explode(col("tk")).as("t"))
        .groupBy("t").count().orderBy(col("count").desc, col("t"))
        .limit(48 * k).collect().map(_.getString(0))
        .filterNot(_.contains(",")).mkString(",")
      val (stopBag, tStop) = RuleToggle.withIncluded(spark, rule) {
        spark.conf.set("spark.graft.setsim.stopTokens", stops)
        try timed(bag())
        finally spark.conf.unset("spark.graft.setsim.stopTokens")
      }
      require(stopBag == ruleBag, s"k=$k: stop-ordered bag != rule bag")
      val (naiveBag, tNaive) = if (k <= naiveMaxK) {
        RuleToggle.withExcluded(spark, rule)(timed(bag()))
      } else (null, -1.0)

      val parity = naiveBag == null || ruleBag == naiveBag
      require(parity, s"k=$k: rule bag != naive bag")
      println(s"""{"k":$k,"rows":$n,"pairs":${ruleBag.getLong(1)},""" +
        s""""rule_sec":${f"$tRule%.2f"},"stop_sec":${f"$tStop%.2f"},""" +
        s""""naive_sec":${f"$tNaive%.2f"},"parity":$parity}""")
    }
    spark.stop()
  }
}
