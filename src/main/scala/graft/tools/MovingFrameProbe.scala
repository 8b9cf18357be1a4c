package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Sessions

/** Scale stress proof for the MOVING-FRAME arm of GlobalRankRewrite:
  * a naive global `sum/count OVER (ORDER BY … ROWS 999 PRECEDING..CR)`
  * (the trailing-window monitor shape, q305) with the rule forced
  * versus excluded (true single-partition sliding WindowExec), outputs
  * asserted identical per row, both timed. Expected law: the naive form
  * is one task sliding a 1000-row frame over the whole corpus (≥ ×2 per
  * doubling — the 100 TB cliff); the rule form pays per-slice sliding
  * windows plus the cum-fetch self-join and scales with the shuffle.
  *
  * Usage: sbt "runMain graft.tools.MovingFrameProbe [ks] [naiveMaxK]"
  * (SPARK_GRAFT_CPUS=16 to reproduce BASELINE.md records)
  */
object MovingFrameProbe {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val ks = args.headOption.getOrElse("1,2,4,8,16")
      .split(",").map(_.trim.toInt).toSeq
    val naiveMaxK = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = Sessions.local("graft-moving-frame-scale")
    val baseN = 200000L

    // unique (t, id) order; the summed input is the first key (the
    // tie-safety condition the rule requires)
    def corpus(k: Int): DataFrame =
      spark.range(baseN * k).select(col("id"),
        (col("id") * 1103515245L % 100003L).as("t"))

    for (k <- ks) {
      val df = corpus(k).persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = df.count()
      val w = Window.orderBy(col("t"), col("id")).rowsBetween(-999, 0)
      def build() = df.select(col("id"), col("t"),
        sum(col("t")).over(w).as("ms"),
        count(lit(1)).over(w).as("mn"))
      def profile(r: DataFrame): (Long, Double) =
        timed(r.groupBy(col("t") % 7)
          .agg(count(lit(1)), sum("ms"), min("mn"), max("ms"))
          .collect().length.toLong)

      val (_, tRule) = {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try {
          val r = build()
          require(r.queryExecution.executedPlan.toString
            .contains("graft_rank_jrn"), s"rule did not fire at k=$k")
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
          .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
          .sorted.toSeq
        spark.conf.unset(excl._1)
        val ruled = {
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          try build().collect()
            .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
            .sorted.toSeq
          finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
            "10485760")
        }
        require(ruled == naive, s"moving frames diverged at k=$k")
        (tN, true)
      } else { spark.conf.unset(excl._1); (-1.0, false) }

      println(s"""{"k":$k,"n":$n,"t_rule":${f"$tRule%.2f"},""" +
        s""""t_naive":${f"$tNaive%.2f"},"verified":$ok}""")
      df.unpersist()
    }
    spark.stop()
  }
}
