package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Sessions

/** Scale stress proof for EditDistanceJoinBlocking (q334's fuzzy
  * join): document title-prefixes scaled k× by NAMESPACE-TAGGING each
  * copy with a 3-character per-copy prefix (any two tags differ in all
  * 3 positions, so cross-copy distance ≥ 3 > 2 and the true pair set
  * grows exactly k×). The law this regime separates: the naive theta
  * join verifies |n|² pairs, each by an O(|s|²) dynamic program — k²
  * quadratic growth of an already-heavy verify — while the PassJoin
  * rewrite generates candidates through (segment, length, content)
  * hash buckets — k¹ as long as bucket densities stay flat (namespace
  * tags keep them flat by construction). Both forms run, are timed,
  * and are asserted to produce IDENTICAL pair bags.
  *
  * Usage: sbt "runMain graft.tools.EdScaleProbe [sfDir] [ks]
  * [naiveMaxK]" — naiveMaxK caps the naive (rule-excluded) timing arm;
  * higher k run the rule arm only. Prints one JSON line per k.
  */
object EdScaleProbe {

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
    val spark = Sessions.local("graft-ed-scale")

    val base = graft.catalog.Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("id"),
        substring(col("text"), 1, 16).as("pre"))

    // one tag per copy, all three positions distinct across copies —
    // the 26-letter alphabet caps k at 26 (beyond that, tag reuse
    // merges namespaces: parity still holds but pair growth turns
    // superlinear and the k¹-vs-k² law reading is void)
    require(ks.forall(_ <= 26), "k > 26 exceeds the tag alphabet")
    def tag(i: Int): String = {
      val c = ('a' + (i % 26)).toChar
      s"$c$c$c"
    }
    def scaled(k: Int): DataFrame =
      (0 until k).map { i =>
        base.select((col("id") + lit(i * 100000000L)).as("id"),
          concat(lit(tag(i)), col("pre")).as("pre"))
      }.reduce(_ union _)

    for (k <- ks) {
      val d = scaled(k)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = d.count()
      val b = d.select(col("id").as("id2"), col("pre").as("pre2"))

      // the naive text — what a user writes; the rule plans it
      def pairs(): DataFrame = d.join(b,
        levenshtein(col("pre"), col("pre2")) <= 2 &&
          col("id") < col("id2"))
        .select(col("id"), col("id2"))

      val rule = "graft.plans.EditDistanceJoinBlocking"

      def bag() = pairs().groupBy("id", "id2").count()
        .agg(count(lit(1)), sum(col("count")),
          sum(hash(col("id"), col("id2")) * col("count")))
        .collect().head

      val (ruleBag, tRule) =
        RuleToggle.withIncluded(spark, rule)(timed(bag()))
      val (naiveBag, tNaive) = if (k <= naiveMaxK) {
        RuleToggle.withExcluded(spark, rule)(timed(bag()))
      } else (null, -1.0)

      val parity = naiveBag == null || ruleBag == naiveBag
      require(parity, s"k=$k: rule bag != naive bag")
      println(s"""{"k":$k,"rows":$n,"pairs":${ruleBag.getLong(1)},""" +
        s""""rule_sec":${f"$tRule%.2f"},""" +
        s""""naive_sec":${f"$tNaive%.2f"},"parity":$parity}""")
    }
    spark.stop()
  }
}
