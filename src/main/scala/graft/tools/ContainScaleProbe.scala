package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Sessions

/** Scale stress proof for SetSimilarityJoinBlocking's CONTAINMENT arm
  * (q350/q351/q352): order part-sets scaled k× by NAMESPACE-TAGGING
  * every element with a per-copy offset (cross-copy intersections are
  * empty, so the true pair set grows exactly k× and min-token buckets
  * stay flat by construction). The law this regime separates: the
  * naive `size(array_except(sub, sup)) = 0` theta join evaluates
  * |A|·|O| array-except pairs — k² growth with a per-pair set-op cost
  * — while the rewrite probes each subset's MINIMAL element through a
  * hash bucket — k¹. All three shapes run (inner probes→corpus,
  * MIRRORED left semi, MIRRORED left anti — the r10 rid/ExistenceJoin
  * machinery), are timed, and are asserted to produce IDENTICAL bags
  * against the naive plan. The corpus has no empty sets (groupBy
  * cannot make one), so the measured law is the NON-∅ branch's; the
  * ∅-branch truth table is pinned in SetSimilarityRuleSpec.
  *
  * Usage: sbt "runMain graft.tools.ContainScaleProbe [sfDir] [ks]
  * [naiveMaxK]". Prints one JSON line per k.
  */
object ContainScaleProbe {

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
    val spark = Sessions.local("graft-contain-scale")

    val base = graft.catalog.Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_orderkey").as("id"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))

    def scaled(k: Int): DataFrame =
      (0 until k).map { i =>
        base.select((col("id") + lit(i * 100000000L)).as("id"),
          transform(col("parts"),
            x => x + lit(i * 1000000000L)).as("parts"))
      }.reduce(_ union _)

    for (k <- ks) {
      val o = scaled(k)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = o.count()
      // probe (subset) side: the q350 slice — 100000000 % 20 == 0, so
      // the slice replicates exactly per namespace copy
      val a = o.filter(col("id") % 20 === 0 && size(col("parts")) <= 3)
        .select(col("id").as("aid"), col("parts").as("aparts"))

      def inner(): DataFrame = a.join(o,
        size(array_except(col("aparts"), col("parts"))) === 0 &&
          col("aid") =!= col("id"))
        .select(col("aid"), col("id"))
      def bagI() = inner().groupBy("aid", "id").count()
        .agg(count(lit(1)), sum(col("count")),
          sum(hash(col("aid"), col("id")) * col("count")))
        .collect().head

      def semi(): DataFrame = o.join(a,
        size(array_except(col("aparts"), col("parts"))) === 0 &&
          col("id") =!= col("aid"), "left_semi")
        .select(col("id"))
      def anti(): DataFrame = o.join(a,
        size(array_except(col("aparts"), col("parts"))) === 0 &&
          col("id") =!= col("aid"), "left_anti")
        .select(col("id"))
      def bagOf(df: => DataFrame) = df.groupBy("id").count()
        .agg(count(lit(1)), sum(col("count")),
          sum(hash(col("id")) * col("count")))
        .collect().head

      val rule = "graft.plans.SetSimilarityJoinBlocking"
      val (ruleI, tI) = RuleToggle.withIncluded(spark, rule)(timed(bagI()))
      val (ruleS, tS) =
        RuleToggle.withIncluded(spark, rule)(timed(bagOf(semi())))
      val (ruleA, tA) =
        RuleToggle.withIncluded(spark, rule)(timed(bagOf(anti())))

      val (tNI, tNS, tNA) = if (k <= naiveMaxK) {
        val (nI, t1) = RuleToggle.withExcluded(spark, rule)(timed(bagI()))
        val (nS, t2) =
          RuleToggle.withExcluded(spark, rule)(timed(bagOf(semi())))
        val (nA, t3) =
          RuleToggle.withExcluded(spark, rule)(timed(bagOf(anti())))
        require(nI == ruleI, s"k=$k: inner rule bag != naive bag")
        require(nS == ruleS, s"k=$k: semi rule bag != naive bag")
        require(nA == ruleA, s"k=$k: anti rule bag != naive bag")
        (t1, t2, t3)
      } else (-1.0, -1.0, -1.0)

      println(s"""{"k":$k,"rows":$n,"pairs":${ruleI.getLong(1)},""" +
        s""""covering":${ruleS.getLong(0)},""" +
        s""""inner_rule_sec":${f"$tI%.2f"},"inner_naive_sec":${f"$tNI%.2f"},""" +
        s""""semi_rule_sec":${f"$tS%.2f"},"semi_naive_sec":${f"$tNS%.2f"},""" +
        s""""anti_rule_sec":${f"$tA%.2f"},"anti_naive_sec":${f"$tNA%.2f"}}""")
      o.unpersist()
    }
    spark.stop()
  }
}
