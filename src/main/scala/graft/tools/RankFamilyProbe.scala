package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Sessions

/** Scale stress proof for the round-7 RANK-FAMILY arm of
  * GlobalRankRewrite: naive global `rank()/dense_rank()/percent_rank()`
  * over a TIE-HEAVY key (each key value repeats ~20k/999 ≈ 20·k times —
  * exactly the shape whose tie semantics round 6 stood down on) with
  * the rule forced versus excluded (true single-partition WindowExec),
  * outputs asserted identical, both timed. Expected law: the naive form
  * is one task (≥ ×2 per doubling, the 100 TB cliff); the rule form
  * scales with the shuffle like [[RankScaleProbe]]'s ntile arm.
  *
  * Usage: sbt "runMain graft.tools.RankFamilyProbe [ks] [naiveMaxK]"
  */
object RankFamilyProbe {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val ks = args.headOption.getOrElse("1,2,4,8,16")
      .split(",").map(_.trim.toInt).toSeq
    val naiveMaxK = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = Sessions.local("graft-rank-family-scale")
    val baseN = 200000L

    // 100k distinct key values → real sort entropy, with every value
    // still tied ~2k/100003·n times (ties are the point of this probe)
    def corpus(k: Int): DataFrame =
      spark.range(baseN * k).select(col("id"),
        (col("id") * 1103515245L % 100003L).as("t"))

    for (k <- ks) {
      val df = corpus(k).persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = df.count()
      val w = Window.orderBy(col("t"))
      def build() = df.select(col("id"), col("t"),
        rank().over(w).as("rk"),
        dense_rank().over(w).as("dr"),
        percent_rank().over(w).as("pr"))
      def profile(r: DataFrame): (Long, Double) =
        timed(r.groupBy(col("t") % 7)
          .agg(count(lit(1)), min("rk"), max("dr"), max("pr"))
          .collect().length.toLong)

      val (_, tRule) = {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try {
          val r = build()
          require(r.queryExecution.executedPlan.toString
            .contains("graft_rank_pid"), s"rule did not fire at k=$k")
          profile(r)
        } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
          "10485760")
      }
      val excl = "spark.sql.optimizer.excludedRules" ->
        "graft.plans.GlobalRankRewrite"
      val (tNaive, ok) = if (k <= naiveMaxK) {
        spark.conf.set(excl._1, excl._2)
        val (_, tN) = profile(build())
        val naive = build().collect()
          .map(r => (r.getLong(0), r.getInt(2), r.getInt(3),
            r.getDouble(4))).sorted.toSeq
        spark.conf.unset(excl._1)
        val ruled = {
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          try build().collect()
            .map(r => (r.getLong(0), r.getInt(2), r.getInt(3),
              r.getDouble(4))).sorted.toSeq
          finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
            "10485760")
        }
        require(ruled == naive, s"rank family diverged at k=$k")
        (tN, true)
      } else { spark.conf.unset(excl._1); (-1.0, false) }

      println(s"""{"k":$k,"n":$n,"t_rule":${f"$tRule%.2f"},""" +
        s""""t_naive":${f"$tNaive%.2f"},"verified":$ok}""")
      df.unpersist()
    }
    spark.stop()
  }
}
