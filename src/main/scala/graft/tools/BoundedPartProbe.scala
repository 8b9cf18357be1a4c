package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Sessions

/** Scale stress proof for the BOUNDED-PARTITION arm of
  * GlobalRankRewrite: a naive `row_number()/ntile() OVER (PARTITION BY
  * id % 3 ORDER BY …)` window is pigeonhole-capped at 3 tasks at any
  * data size — the rewrite runs per-(group, slice) windows with
  * per-group offsets and scales with the shuffle. Rule forced vs
  * excluded, per-row outputs asserted identical.
  *
  * Usage: sbt "runMain graft.tools.BoundedPartProbe [ks] [naiveMaxK]"
  * (SPARK_GRAFT_CPUS=16 to reproduce BASELINE.md records)
  */
object BoundedPartProbe {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val ks = args.headOption.getOrElse("1,2,4,8,16")
      .split(",").map(_.trim.toInt).toSeq
    val naiveMaxK = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = Sessions.local("graft-bounded-part-scale")
    val baseN = 400000L

    def corpus(k: Int): DataFrame =
      spark.range(baseN * k).select(col("id"),
        (col("id") * 1103515245L % 100003L).as("t"))

    for (k <- ks) {
      val df = corpus(k).persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = df.count()
      val w = Window.partitionBy(col("id") % 3)
        .orderBy(col("t"), col("id"))
      def build() = df.select(col("id"), col("t"),
        row_number().over(w).as("rn"),
        ntile(100).over(w).as("nt"))
      def profile(r: DataFrame): (Long, Double) =
        timed(r.groupBy(col("nt"))
          .agg(count(lit(1)), min("rn"), max("rn"), sum("t"))
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
          .map(r => (r.getLong(0), r.getInt(2), r.getInt(3)))
          .sorted.toSeq
        spark.conf.unset(excl._1)
        val ruled = {
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          try build().collect()
            .map(r => (r.getLong(0), r.getInt(2), r.getInt(3)))
            .sorted.toSeq
          finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
            "10485760")
        }
        require(ruled == naive, s"bounded-part family diverged at k=$k")
        (tN, true)
      } else { spark.conf.unset(excl._1); (-1.0, false) }

      println(s"""{"k":$k,"n":$n,"t_rule":${f"$tRule%.2f"},""" +
        s""""t_naive":${f"$tNaive%.2f"},"verified":$ok}""")
      df.unpersist()
    }
    spark.stop()
  }
}
