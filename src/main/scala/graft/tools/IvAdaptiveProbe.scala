package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Sessions

/** Adaptive-vs-static tile width proof for the BandJoinBlocking
  * interval-overlap arm on a HEAVY-TAILED length corpus — the regime
  * VERDICT r8 #7 named (event/session overlaps on real clickstreams
  * are length-skewed): 99.5% of intervals are 1–3 days wide, 0.5% are
  * 200–550 days. A static 64-day bin piles every short interval in a
  * 64-day window into one bucket (the verify term goes
  * bucket-quadratic: ~410 rows/tile at sf0.01 density ⇒ 6.4M candidate
  * pairs per copy against ~0.4M true pairs), while the data-derived
  * width lands near the geometric mean (2 days) — fine buckets for the
  * mass, honest fan-out only for the rare tail. Copies are
  * time-shifted so pairs grow exactly k× and per-tile density stays
  * constant: both arms scale k¹ and the gap is the CONSTANT
  * bucket-quadratic factor. All arms are asserted bag-identical via
  * count/hash aggregates (no driver collect).
  *
  * Usage: sbt "runMain graft.tools.IvAdaptiveProbe [sfDir] [ks]
  * [naiveMaxK]". Prints one JSON line per k.
  */
object IvAdaptiveProbe {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val ks = args.lift(1).getOrElse("1,2,4,8")
      .split(",").map(_.trim.toInt).toSeq
    val naiveMaxK = args.lift(2).map(_.toInt).getOrElse(1)
    val spark = Sessions.local("graft-iv-adaptive")

    // heavy-tailed widths keyed off the orderkey: 0.5% long tail
    val base = graft.catalog.Tables.load(spark, dir, "orders")
      .select(col("o_orderkey").as("id"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
          .as("sd"))
      .withColumn("ed", col("sd") +
        when(col("id") % 200 === 0,
          lit(200L) + pmod(col("id"), lit(350L)))
          .otherwise(lit(1L) + pmod(col("id"), lit(3L))))
    val Array(lo, hi) = base.agg(min("sd"), max("ed")).collect()
      .map(r => Array(r.getLong(0), r.getLong(1))).head
    val span = (hi - lo) + 200L

    def scaled(k: Int): DataFrame =
      (0 until k).map { i =>
        base.select((col("id") + lit(i * 100000000L)).as("id"),
          (col("sd") + lit(i * span)).as("sd"),
          (col("ed") + lit(i * span)).as("ed"))
      }.reduce(_ union _)

    for (k <- ks) {
      val iv = scaled(k)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = iv.count()
      val b = iv.select(col("id").as("id2"), col("sd").as("sd2"),
        col("ed").as("ed2"))

      def overlaps(): DataFrame = iv.join(b,
        col("sd") <= col("ed2") && col("sd2") <= col("ed"))
        .select(col("id"), col("id2"))
      def bag() = overlaps()
        .agg(count(lit(1)), sum(hash(col("id"), col("id2"))))
        .collect().head

      val binKey = "spark.graft.band.intervalBin"
      def noBcast[T](f: => T): T = {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try f
        finally spark.conf
          .set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      }
      // adaptive arm: conf UNSET (the r10 default)
      val (bagA, tA) = noBcast {
        spark.conf.unset(binKey)
        require(overlaps().queryExecution.executedPlan.toString
          .contains("graft_band"), s"arm did not fire at k=$k")
        timed(bag())
      }
      // static arm: the pre-r10 default 64
      val (bagS, tS) = noBcast {
        spark.conf.set(binKey, "64")
        try timed(bag()) finally spark.conf.unset(binKey)
      }
      require(bagS == bagA, s"k=$k: static bag != adaptive bag")
      // naive baseline: rule excluded
      val rule = "graft.plans.BandJoinBlocking"
      val (bagN, tN) = if (k <= naiveMaxK) {
        noBcast { RuleToggle.withExcluded(spark, rule)(timed(bag())) }
      } else (null, -1.0)
      require(bagN == null || bagN == bagA,
        s"k=$k: rule bag != naive bag")

      println(s"""{"k":$k,"intervals":$n,"pairs":${bagA.getLong(0)},""" +
        s""""adaptive_sec":${f"$tA%.2f"},"static64_sec":${f"$tS%.2f"},""" +
        s""""naive_sec":${f"$tN%.2f"}}""")
      iv.unpersist()
    }
    spark.stop()
  }
}
