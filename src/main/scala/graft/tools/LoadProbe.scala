package graft.tools

import graft.Sessions
import graft.catalog.Tables

/** Micro-probe (guide §1): isolate the per-call cost of
  * `spark.read.parquet` relation creation (file listing + footer schema
  * read + LogicalRelation build) vs reusing an already-loaded DataFrame,
  * and the per-action floor (count of an empty-projection scan). These
  * per-query constants multiply by 355 queries × 2 bench reps, so they
  * are a first-order term of the bench at sf0.1 where data is tiny.
  *
  * Usage: runMain graft.tools.LoadProbe <sfDir>
  */
object LoadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local("graft-loadprobe")
    def ms[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }
    // warm
    Tables.all.foreach(n => Tables.load(spark, sfDir, n).count())
    for (tbl <- Seq("lineitem", "orders", "events", "nation")) {
      val t1 = ms { (1 to 20).foreach(_ => Tables.load(spark, sfDir, tbl)) }
      val df = Tables.load(spark, sfDir, tbl)
      val sch = spark.read.parquet(Tables.path(sfDir, tbl)).schema
      val t1b = ms { (1 to 20).foreach(_ =>
        spark.read.schema(sch).parquet(Tables.path(sfDir, tbl))) }
      val t2 = ms { (1 to 20).foreach(_ => df.select("*")) }
      val t3 = ms { (1 to 5).foreach(_ => Tables.load(spark, sfDir, tbl).count()) }
      val t4 = ms { (1 to 5).foreach(_ => df.count()) }
      println(f"$tbl%-10s load×20=${t1}%8.1f ms  schemaLoad×20=${t1b}%8.1f ms  " +
        f"select×20=${t2}%8.1f ms  " +
        f"load+count×5=${t3}%8.1f ms  count×5=${t4}%8.1f ms")
    }
    spark.stop()
  }
}
