package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Sessions

/** Scale stress proof for the HammingJoinBlocking OPTIMIZER RULE itself:
  * the q277-shape naive hamming self-join (60-bit SimHash, hamming ≤ 3,
  * zero blocking in the query text) run on a k× corpus with the rule ON
  * versus the rule EXCLUDED (true nested-loop all-pairs), asserting
  * identical pair sets and timing both. Corpus scaling is the
  * DedupScaleProbe bijection: copy i prefixes every token `c{i}_`, so
  * each copy reproduces the base corpus's internal near-dup structure
  * with a disjoint vocabulary — true pairs grow exactly k×, and
  * cross-copy signatures decorrelate.
  *
  * This converts "the engine owns the hamming-join scale plan" from a
  * plan-shape pin into a measured law: rule-on time should track
  * OUTPUT (~k× candidates), rule-off tracks the n²/2 comparison count.
  *
  * Usage: sbt "runMain graft.tools.RuleScaleProbe [sfDir] [ks] [offMaxK]"
  */
object RuleScaleProbe {

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
    val spark = Sessions.local("graft-rule-scale")
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
      val sigs = graft.queries.DedupPack.sim64Sigs(scaled(k))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = sigs.count()
      val y = sigs.select(col("doc_id").as("doc_id2"),
        col("sig").as("sig2"))
      def joined(): DataFrame = sigs.join(y,
          bit_count(col("sig").bitwiseXOR(col("sig2"))) <= 3 &&
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
        // conf is read lazily at optimization time: materialize each
        // side's pair set under its own conf before comparing
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
