package graft.tools

import graft.{Sessions, SparkEntry}

/** Profiling utility (guide §1: measure first): split each query's
  * wall-clock into plan-side phases vs execution so optimization effort
  * lands where the time actually goes. For each selected query (prefix
  * match, all when none given), measures on a warm session:
  *
  *   build    — pack function runs (DataFrame construction + analysis
  *              triggered lazily later; building is mostly closure work)
  *   analyze  — `queryExecution.analyzed` forced
  *   optimize — `queryExecution.optimizedPlan` forced (Catalyst + the
  *              eight injected rules)
  *   plan     — `queryExecution.executedPlan` forced (physical planning;
  *              AQE wraps, so codegen happens at execution)
  *   exec1    — first `.count()` (includes codegen compile + run)
  *   exec2    — second `.count()` on a FRESH build (the Bench rep-2 path:
  *              replan + cached-codegen run; min-of-2 ≈ this)
  *
  * Usage: runMain graft.tools.PhaseProfile <sfDir> [prefix ...]
  */
object PhaseProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val prefixes = args.drop(1)
    val spark = Sessions.local("graft-phaseprofile")
    graft.catalog.Tables.all.foreach { n =>
      try graft.catalog.Tables.load(spark, sfDir, n).count()
      catch { case _: Throwable => () }
    }
    def ms[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.isEmpty || prefixes.exists(n.startsWith) }
    println(f"${"query"}%-34s ${"build"}%8s ${"analyze"}%8s ${"optim"}%8s ${"plan"}%8s ${"exec1"}%8s ${"exec2"}%8s")
    var (tb, ta, to2, tp, te1, te2) = (0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    qs.foreach { case (name, fn) =>
      try {
        var df: org.apache.spark.sql.DataFrame = null
        val b = ms { df = fn(spark, sfDir) }
        val a = ms { df.queryExecution.analyzed }
        val o = ms { df.queryExecution.optimizedPlan }
        val p = ms { df.queryExecution.executedPlan }
        val e1 = ms { df.count() }
        val e2 = ms { fn(spark, sfDir).count() }
        spark.sqlContext.clearCache()
        tb += b; ta += a; to2 += o; tp += p; te1 += e1; te2 += e2
        println(f"$name%-34s $b%8.1f $a%8.1f $o%8.1f $p%8.1f $e1%8.1f $e2%8.1f")
      } catch { case e: Throwable =>
        println(s"$name FAILED: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    println(f"${"TOTAL"}%-34s $tb%8.1f $ta%8.1f $to2%8.1f $tp%8.1f $te1%8.1f $te2%8.1f")
    spark.stop()
  }
}
