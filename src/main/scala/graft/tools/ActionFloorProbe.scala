package graft.tools

import graft.Sessions
import graft.catalog.Tables

/** Micro-probe: the fixed cost of one Spark ACTION in this session shape
  * (local[N], AQE on, shuffle partitions = cores). Every bench rep pays
  * this floor at least once; 355 queries × 2 reps multiply it into a
  * first-order bench term. Measures, warm:
  *   - range(1).count()            — pure job overhead, no source, no shuffle
  *   - range N groupBy count       — one shuffle (AQE stage + final)
  *   - parquet count (lineitem)    — scan task + agg
  *   - parquet scan+filter+count   — codegen'd scan pipeline
  * each ×10, reporting per-action ms.
  */
object ActionFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local("graft-actionfloor")
    import org.apache.spark.sql.functions._
    def ms[A](n: Int)(f: => A): Double = {
      val t0 = System.nanoTime(); (1 to n).foreach(_ => f)
      (System.nanoTime() - t0) / 1e6 / n
    }
    // warm every shape once
    spark.range(1).count()
    spark.range(100000).groupBy(col("id") % 97).count().count()
    val li = Tables.load(spark, sfDir, "lineitem")
    li.count(); li.filter(col("l_quantity") > 10).count()
    println(f"range1.count           ${ms(10)(spark.range(1).count())}%8.1f ms")
    println(f"shuffle groupBy.count  ${ms(10)(spark.range(100000).groupBy(col("id") % 97).count().count())}%8.1f ms")
    println(f"parquet count          ${ms(10)(li.count())}%8.1f ms")
    println(f"parquet filter count   ${ms(10)(li.filter(col("l_quantity") > 10).count())}%8.1f ms")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    println(f"[AQE off] range1.count ${ms(10)(spark.range(1).count())}%8.1f ms")
    println(f"[AQE off] shuffle gb   ${ms(10)(spark.range(100000).groupBy(col("id") % 97).count().count())}%8.1f ms")
    println(f"[AQE off] parquet cnt  ${ms(10)(li.count())}%8.1f ms")
    spark.stop()
  }
}
