package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Sessions

/** Scale stress proof for the GHOST-BLOCK arm of GlobalRankRewrite:
  * naive global `min/max/avg OVER (ORDER BY … ROWS 999 PRECEDING..CR)`
  * (q314's trailing-band shape — the aggregates a prefix difference
  * cannot express) with the rule forced versus excluded (true
  * single-partition sliding WindowExec). Per-row outputs asserted
  * IDENTICAL (bit-level for the double average) at every k.
  *
  * Expected law: naive is one task recomputing a 1000-row frame over
  * the whole corpus; the rule re-blocks by global row number
  * (exactly-B-row blocks, tails unioned forward as ghosts) and runs the
  * same frames per block — rank machinery + one extra corpus shuffle,
  * scaling with the shuffle.
  *
  * Usage: sbt "runMain graft.tools.GhostFrameProbe [ks] [naiveMaxK]"
  * (SPARK_GRAFT_CPUS=16 to reproduce BASELINE.md records)
  */
object GhostFrameProbe {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val ks = args.headOption.getOrElse("1,2,4,8,16")
      .split(",").map(_.trim.toInt).toSeq
    val naiveMaxK = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = Sessions.local("graft-ghost-frame-scale")
    val baseN = 200000L
    val threshold = "spark.sql.autoBroadcastJoinThreshold"
    val excl = "spark.sql.optimizer.excludedRules"

    // unique (t, id) order; inputs are scrambled functions of the first
    // key (tie doctrine) and non-monotone, so frames genuinely matter
    def corpus(k: Int): DataFrame =
      spark.range(baseN * k).select(col("id"),
        (col("id") * 1103515245L % 100003L).as("t"))

    for (k <- ks) {
      val df = corpus(k).persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = df.count()
      val w = Window.orderBy(col("t"), col("id")).rowsBetween(-999, 0)
      def build() = df.select(col("id"), col("t"),
        min(col("t") * 31L % 9973L).over(w).as("mn"),
        max(col("t") * 17L % 7919L).over(w).as("mx"),
        avg(col("t")).over(w).as("av"))
      // checksum folds every row: min/max sums + the avg double bits
      def profile(r: DataFrame): (Long, Double) =
        timed(r.select(sum(col("mn") + col("mx")).as("s"),
          sum(expr("cast(abs(hash(av)) as bigint)")).as("h"))
          .collect().map(x => x.getLong(0) + x.getLong(1)).sum)

      val (ruleSum, tRule) = {
        spark.conf.set(threshold, "-1")
        try {
          val r = build()
          require(r.queryExecution.executedPlan.toString
            .contains("graft_rank_gblk"), s"ghost stage absent at k=$k")
          profile(r)
        } finally spark.conf.set(threshold, "10485760")
      }
      val (naiveSum, tNaive) = if (k <= naiveMaxK) {
        spark.conf.set(excl, "graft.plans.GlobalRankRewrite")
        try profile(build())
        finally spark.conf.unset(excl)
      } else (Long.MinValue, -1.0)
      if (tNaive >= 0) require(ruleSum == naiveSum,
        s"ghost frames diverged at k=$k: $ruleSum vs $naiveSum")
      println(s"""{"k":$k,"n":$n,"t_rule":${f"$tRule%.2f"},""" +
        s""""t_naive":${f"$tNaive%.2f"}}""")
      df.unpersist()
    }
    spark.stop()
  }
}
