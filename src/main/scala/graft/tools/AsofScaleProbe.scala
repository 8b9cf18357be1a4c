package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Sessions

/** Scale stress proof for the q261/q264 tolerance-bucketed as-of join:
  * events scaled k× by TIME-EXTENDING each user's history (copy i shifts
  * timestamps by i·span, span > tolerance, so copies never interact
  * within the 7-day window and the true match set grows exactly k×).
  * This is precisely the regime q264's scaladoc claims separates the two
  * plans: the naive per-user equi-join materializes (k·purchases_u) ×
  * (k·views_u) pairs per user BEFORE the time filter — k² joined rows —
  * while the (user, bucket) equi-join's fan-in is the 2-bucket window
  * density — k¹. Both forms are run, timed, and asserted to produce
  * IDENTICAL per-purchase matches.
  *
  * Usage: sbt "runMain graft.tools.AsofScaleProbe [sfDir] [ks] [naiveMaxK]"
  * Prints one JSON line per k.
  */
object AsofScaleProbe {

  private val tolUs = 604800000000L // 7 days

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ks = args.lift(1).getOrElse("1,2,4,8")
      .split(",").map(_.trim.toInt).toSeq
    val naiveMaxK = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = Sessions.local("graft-asof-scale")
    val base = graft.catalog.Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000").as("us"))
      .filter(col("event_type").isin("view", "purchase"))
    val Array(lo, hi) = base.agg(min("us"), max("us")).collect()
      .map(r => Array(r.getLong(0), r.getLong(1))).head
    val span = (hi - lo) + 2 * tolUs

    def scaled(k: Int): DataFrame =
      (0 until k).map { i =>
        base.select((col("event_id") + lit(i * 100000000L)).as("event_id"),
          col("user_id"), col("event_type"),
          (col("us") + lit(i * span)).as("us"))
      }.reduce(_ union _)

    for (k <- ks) {
      val e = scaled(k)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_event"), col("user_id"),
          col("us").as("ts_p"))
      val v = e.filter(col("event_type") === "view")
        .select(col("event_id").as("v_event"), col("user_id"),
          col("us").as("ts_v"))
      val n = e.count()

      // bucketed 2-probe form (the q261 plan)
      def bucketed(): DataFrame = {
        val vb = v.withColumn("bkt", expr(s"ts_v div ${tolUs}L"))
        p.select(col("p_event"), col("user_id"), col("ts_p"),
            explode(array(expr(s"ts_p div ${tolUs}L"),
              expr(s"ts_p div ${tolUs}L - 1"))).as("bkt"))
          .join(vb, Seq("user_id", "bkt"))
          .filter(col("ts_v") <= col("ts_p") &&
            col("ts_v") >= col("ts_p") - tolUs)
          .groupBy("p_event")
          .agg(max(struct(col("ts_v"), col("v_event"))).as("m"))
          .select(col("p_event"), col("m.v_event").as("v_event"))
      }

      // naive per-user equi-join + residual time filter (the q131 plan)
      def naive(): DataFrame = p.join(v, Seq("user_id"))
        .filter(col("ts_v") <= col("ts_p") &&
          col("ts_v") >= col("ts_p") - tolUs)
        .groupBy("p_event")
        .agg(max(struct(col("ts_v"), col("v_event"))).as("m"))
        .select(col("p_event"), col("m.v_event").as("v_event"))

      // analytic candidate-row counts BEFORE the residual time filter —
      // the quantity each join materializes, robust to wall-clock noise
      val pu = p.groupBy("user_id").agg(count(lit(1)).as("np"))
      val vu = v.groupBy("user_id").agg(count(lit(1)).as("nv"))
      val naivePairs = pu.join(vu, "user_id")
        .agg(sum(col("np") * col("nv"))).collect().head.getLong(0)
      val vb2 = v.withColumn("bkt", expr(s"ts_v div ${tolUs}L"))
        .groupBy("user_id", "bkt").agg(count(lit(1)).as("nv"))
      val pb2 = p.select(col("user_id"),
          explode(array(expr(s"ts_p div ${tolUs}L"),
            expr(s"ts_p div ${tolUs}L - 1"))).as("bkt"))
        .groupBy("user_id", "bkt").agg(count(lit(1)).as("np"))
      val bucketPairs = pb2.join(vb2, Seq("user_id", "bkt"))
        .agg(sum(col("np") * col("nv"))).collect().head.getLong(0)

      val (nb, tB) = timed(bucketed().count())
      // since round 7 the naive text is itself auto-planned by
      // BandJoinBlocking whenever neither side broadcasts — that IS the
      // engine arm. The true naive baseline needs the rule excluded
      // (conf is read at optimization time, so each arm materializes
      // under its own conf — the RuleScaleProbe drill).
      val excl = "spark.sql.optimizer.excludedRules" ->
        "graft.plans.BandJoinBlocking"
      val (nr, tR) = {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try {
          require(naive().queryExecution.executedPlan.toString
            .contains("graft_band"), s"band rule did not fire at k=$k")
          timed(naive().count())
        } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
          "10485760")
      }
      spark.conf.set(excl._1, excl._2)
      val (nn, tN) = if (k <= naiveMaxK) timed(naive().count())
        else (-1L, -1.0)
      if (k <= naiveMaxK) {
        val naiveRows = naive()
        val diff = bucketed().exceptAll(naiveRows).count() +
          naiveRows.exceptAll(bucketed()).count()
        require(diff == 0, s"as-of mismatch at k=$k")
      }
      spark.conf.unset(excl._1)
      if (k <= naiveMaxK) {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try {
          val ruled = naive()
          val diff = bucketed().exceptAll(ruled).count() +
            ruled.exceptAll(bucketed()).count()
          require(diff == 0, s"rule-planned as-of diverged at k=$k")
        } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
          "10485760")
      }
      println(s"""{"k":$k,"events":$n,"matched":$nb,""" +
        s""""naive_pairs":$naivePairs,"bucket_pairs":$bucketPairs,""" +
        s""""t_bucketed":${f"$tB%.2f"},"t_rule":${f"$tR%.2f"},""" +
        s""""rule_matched":$nr,"naive_matched":$nn,""" +
        s""""t_naive":${f"$tN%.2f"}}""")
      e.unpersist()
    }
    spark.stop()
  }
}
