package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Sessions

/** Scale stress proof for the BandJoinBlocking INTERVAL-OVERLAP arm
  * (q331's variable-width windows): order fulfillment intervals scaled
  * k× by TIME-SHIFTING each copy past the previous copy's reach (shift
  * > corpus span + max width, so copies never overlap each other and
  * the true pair set grows exactly k×). The law this regime separates:
  * the naive per-customer equi-join materializes (k·n_c)² candidate
  * pairs per customer before the overlap filter — k² — while the
  * tiled join's fan-in is per-(customer, tile) density — k¹ (widths
  * ≤ 89 days over bin 64 touch ≤ 3 tiles). Both forms run, are timed,
  * and are asserted to produce IDENTICAL overlap-pair bags.
  *
  * Usage: sbt "runMain graft.tools.IvScaleProbe [sfDir] [ks]
  * [naiveMaxK] [parityMaxK]" — naiveMaxK caps the naive TIMING arm,
  * parityMaxK (default = naiveMaxK, capped by it) the full-bag
  * driver-collect parity check (identical bags at driver-safe sizes;
  * high-k runs are timing-only). Prints one JSON line per k.
  */
object IvScaleProbe {

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
    val parityMaxK = math.min(naiveMaxK,
      args.lift(3).map(_.toInt).getOrElse(naiveMaxK))
    val spark = Sessions.local("graft-iv-scale")
    // intervals in epoch-day LONG space: [sd, sd + 30..89]
    val base = graft.catalog.Tables.load(spark, dir, "orders")
      .select(col("o_custkey").as("ck"), col("o_orderkey").as("id"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
          .as("sd"))
      .withColumn("ed", col("sd") + pmod(col("id"), lit(60L)) + lit(30L))
    val Array(lo, hi) = base.agg(min("sd"), max("ed")).collect()
      .map(r => Array(r.getLong(0), r.getLong(1))).head
    val span = (hi - lo) + 200L

    def scaled(k: Int): DataFrame =
      (0 until k).map { i =>
        base.select((col("id") + lit(i * 100000000L)).as("id"),
          col("ck"),
          (col("sd") + lit(i * span)).as("sd"),
          (col("ed") + lit(i * span)).as("ed"))
      }.reduce(_ union _)

    for (k <- ks) {
      val iv = scaled(k)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = iv.count()
      val b = iv.select(col("ck").as("ck2"), col("id").as("id2"),
        col("sd").as("sd2"), col("ed").as("ed2"))

      // the naive text — what a user writes; BandJoinBlocking's
      // interval arm plans it whenever neither side broadcasts. No
      // id < id2 tiebreaker here: in an ALL-INTEGRAL condition it
      // would be a second endpoint quadruple (pushdown folds post-join
      // filters back into the condition) and the arm correctly
      // refuses to guess — the law counts ordered pairs instead.
      def overlaps(): DataFrame = iv.join(b,
        col("ck") === col("ck2") &&
          col("sd") <= col("ed2") && col("sd2") <= col("ed"))
        .select(col("id"), col("id2"))

      // analytic candidate counts BEFORE the overlap filter
      val perCk = iv.groupBy("ck").agg(count(lit(1)).as("nc"))
      val naivePairs = perCk.agg(sum(col("nc") * col("nc")))
        .collect().head.getLong(0)
      val bin = 64L
      val tiled = iv.select(col("ck"), explode(sequence(
        expr(s"sd div $bin"), expr(s"ed div $bin"))).as("tile"))
        .groupBy("ck", "tile").agg(count(lit(1)).as("nt"))
      val tilePairs = tiled.agg(sum(col("nt") * col("nt")))
        .collect().head.getLong(0)

      val excl = "spark.sql.optimizer.excludedRules" ->
        "graft.plans.BandJoinBlocking"
      // rule arm (threshold −1 forces it at any probe scale)
      val (nr, tR) = {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try {
          require(overlaps().queryExecution.executedPlan.toString
            .contains("graft_band"),
            s"interval arm did not fire at k=$k")
          timed(overlaps().count())
        } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
          "10485760")
      }
      // true naive baseline: rule excluded, no broadcast
      val (nn, tN) = if (k <= naiveMaxK) {
        spark.conf.set(excl._1, excl._2)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try timed(overlaps().count())
        finally {
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
            "10485760")
          spark.conf.unset(excl._1)
        }
      } else (-1L, -1.0)
      // identical bags, rule vs naive
      if (k <= parityMaxK) {
        val ruled = {
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          try overlaps().collect().map(r => (r.getLong(0), r.getLong(1)))
          finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
            "10485760")
        }
        val naive = {
          spark.conf.set(excl._1, excl._2)
          try overlaps().collect().map(r => (r.getLong(0), r.getLong(1)))
          finally spark.conf.unset(excl._1)
        }
        require(ruled.sorted.toSeq == naive.sorted.toSeq,
          s"interval-overlap bag mismatch at k=$k")
      }
      println(s"""{"k":$k,"intervals":$n,"matched":$nr,""" +
        s""""naive_pairs":$naivePairs,"tile_pairs":$tilePairs,""" +
        s""""t_rule":${f"$tR%.2f"},"naive_matched":$nn,""" +
        s""""t_naive":${f"$tN%.2f"}}""")
      iv.unpersist()
    }
    spark.stop()
  }
}
