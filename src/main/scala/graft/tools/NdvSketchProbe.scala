package graft.tools

import org.apache.spark.sql.functions._
import graft.Sessions

/** Error/cost law for the q284/q212 deterministic HLL distinct-count
  * sketch as the true cardinality grows 10³ → 10⁶ at CONSTANT 64-register
  * state: per n, the exact `count(distinct)` and the register-sketch
  * estimate over the same synthetic key set, with wall-times for both.
  *
  * What it proves: the sketch's relative error stays inside the
  * 1.04/√64 ≈ 13% band (it does NOT grow with n — the whole point of
  * HLL), while the exact path's shuffled state grows linearly with ndv.
  * The estimator is the q284 expression verbatim: exact integer
  * Σ2^(27−reg) + linear-counting fallback below 2.5m.
  *
  * Usage: sbt "runMain graft.tools.NdvSketchProbe [ns]"
  * Prints one JSON line per n.
  */
object NdvSketchProbe {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val ns = args.headOption.getOrElse("1000,10000,100000,1000000")
      .split(",").map(_.trim.toLong).toSeq
    val spark = Sessions.local("graft-ndv-sketch")
    val m = 64L

    for (n <- ns) {
      // synthetic keys: salted strings so the hash sees realistic input
      val keys = spark.range(n)
        .select(concat(lit("key|"), col("id")).as("v"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (nExact, tExact) =
        timed(keys.agg(countDistinct("v")).collect().head.getLong(0))
      val h = graft.queries.TrainingPipelinePack.md5Hash32(col("v"), "hllp")
      val w = call_function("div", col("h"), lit(m))
      val (est, tSketch) = timed {
        val agg = keys.select(h.as("h")).distinct()
          .select((col("h") % m).as("idx"), w.as("w"))
          .select(col("idx"),
            when(col("w") === 0, lit(27L))
              .otherwise(call_function("bit_count",
                col("w").bitwiseAND(lit(0L) - col("w")) - 1)
                .cast("long") + 1).as("rho"))
          .groupBy("idx").agg(max("rho").as("reg"))
          .agg(
            (sum(expr("shiftleft(1L, cast(27 - reg as int))")) +
              (lit(m) - count(lit(1))) * lit(134217728L)).as("s"),
            (lit(m) - count(lit(1))).as("v0"))
          .collect().head
        val s = agg.getLong(0)
        val v0 = agg.getLong(1)
        val raw = 0.709 * 4096.0 * 134217728.0 / s.toDouble
        if (raw <= 160.0 && v0 > 0) 64.0 * math.log(64.0 / v0) else raw
      }
      val relErr = (est - nExact) / nExact.toDouble
      println(s"""{"n":$n,"exact":$nExact,"est":${f"$est%.1f"},""" +
        s""""rel_err":${f"$relErr%.4f"},"t_exact":${f"$tExact%.2f"},""" +
        s""""t_sketch":${f"$tSketch%.2f"}}""")
      keys.unpersist()
    }
    spark.stop()
  }
}
