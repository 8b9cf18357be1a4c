package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Salting

/** Measured comparison of the three answers to a skewed shuffle join —
  * the evidence behind the library's skew doctrine (Salting scaladoc:
  * "prefer AQE first; reach for explicit salting only on measured
  * residual skew"). Not part of the driver contract; run ad hoc:
  *
  *   sbt "runMain graft.tools.SkewBench [rows]"
  *
  * Setup: `rows` fact rows (default 20M), 60% on ONE hot key, the rest
  * uniform over 5k keys; a 5001-row dimension. Broadcast is disabled so
  * the join must shuffle (at real scale the dim is often too big or the
  * plan sits under an agg that forbids broadcast) — the shape where skew
  * actually bites. Variants, each min-of-2 after a warm-up count:
  *
  *   - plain:  AQE skew-split OFF — the hot key pins one reducer (the
  *             straggler baseline)
  *   - aqe:    AQE skew-split ON (the [[graft.Sessions]] default)
  *   - salted: [[Salting.saltedEquiJoin]] 16 ways, AQE skew-split OFF —
  *             the manual fix for shapes AQE can't rewrite
  *
  * Prints one JSON line {"rows":N,"plain":s,"aqe":s,"salted":s}.
  * Keys are deterministic functions of `id` — no RNG, identical data
  * every run.
  */
object SkewBench {

  private def time2(df: => DataFrame): Double =
    (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      df.count()
      (System.nanoTime() - t0) / 1e9
    }.min

  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 20000000L
    val spark = graft.Sessions.local("graft-skewbench")
    import spark.implicits._

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // make the skew visible to AQE at this scale
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8MB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4MB")

    val nKeys = 5000L
    val big = spark.range(rows)
      .select(
        when(col("id") % 5 < 3, lit(0L)) // 60% on key 0
          .otherwise(pmod(col("id"), lit(nKeys)) + 1).as("k"),
        col("id").as("payload"))
    val dim = spark.range(nKeys + 1)
      .select(col("id").as("k"), (col("id") * 7).as("v"))

    big.count() // materialize range codegen paths once
    def joined = big.join(dim, "k").select("payload", "v")

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val plain = time2(joined)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    val aqe = time2(joined)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val salted = time2(
      Salting.saltedEquiJoin(big, dim, "k", 16).select("payload", "v"))

    println(f"""{"rows":$rows,"plain":$plain%.3f,"aqe":$aqe%.3f,"salted":$salted%.3f}""")
    spark.stop()
  }
}
