package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Sessions

/** Scale stress proof for the round-7 MULTI-WORD arm of
  * HammingJoinBlocking: the q292-shape naive 120-bit hamming self-join
  * (two 60-bit words, summed `bit_count(s0⊕t0) + bit_count(s1⊕t1) ≤ 3`,
  * zero blocking in the query text) on a k× corpus with the rule ON
  * versus EXCLUDED (true nested loop), asserting identical pair sets
  * and timing both — [[RuleScaleProbe]]'s law extended past one machine
  * word. Corpus scaling is the same vocabulary-prefix bijection: true
  * pairs grow exactly k×, cross-copy signatures decorrelate.
  *
  * Usage: sbt "runMain graft.tools.WideRuleScaleProbe [sfDir] [ks] [offMaxK]"
  */
object WideRuleScaleProbe {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ks = args.lift(1).getOrElse("1,2,4,8")
      .split(",").map(_.trim.toInt).toSeq
    val offMaxK = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = Sessions.local("graft-wide-rule-scale")
    val base = graft.catalog.Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        array_distinct(filter(split(col("text"), " "), t => t =!= lit("")))
          .as("ts"))

    def scaled(k: Int): DataFrame =
      (0 until k).map { i =>
        if (i == 0) base
        else base.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          transform(col("ts"), t => concat(lit(s"c${i}_"), t)).as("ts"))
      }.reduce(_ union _)

    for (k <- ks) {
      val sigs = graft.queries.DedupPack.simWideSigs(scaled(k))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = sigs.count()
      val y = sigs.select(col("doc_id").as("doc_id2"),
        col("sig0").as("t0"), col("sig1").as("t1"))
      def joined(): DataFrame = sigs.join(y,
          (bit_count(col("sig0").bitwiseXOR(col("t0"))) +
            bit_count(col("sig1").bitwiseXOR(col("t1")))) <= 3 &&
            col("doc_id") < col("doc_id2"))
        .select("doc_id", "doc_id2")

      spark.conf.unset("spark.sql.optimizer.excludedRules")
      val (nOn, tOn) = timed(joined().count())
      val planOn = joined().queryExecution.executedPlan.toString
      require(planOn.contains("graft_seg"), "rule must fire")

      val (nOff, tOff) = if (k <= offMaxK) {
        spark.conf.set("spark.sql.optimizer.excludedRules",
          "graft.plans.HammingJoinBlocking")
        val r = timed(joined().count())
        val offSet = joined().collect()
          .map(x => (x.getLong(0), x.getLong(1))).toSet
        spark.conf.unset("spark.sql.optimizer.excludedRules")
        val onSet = joined().collect()
          .map(x => (x.getLong(0), x.getLong(1))).toSet
        require(onSet == offSet, s"rule output mismatch at k=$k")
        r
      } else (-1L, -1.0)
      spark.conf.unset("spark.sql.optimizer.excludedRules")

      println(s"""{"k":$k,"docs":$n,"pairs":$nOn,""" +
        s""""t_rule":${f"$tOn%.2f"},"pairs_off":$nOff,""" +
        s""""t_naive":${f"$tOff%.2f"}}""")
      sigs.unpersist()
    }
    spark.stop()
  }
}
