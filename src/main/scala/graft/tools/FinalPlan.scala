package graft.tools

import graft.{Sessions, SparkEntry}

/** Debugging utility: execute selected queries and dump the FINAL adaptive
  * plan (`isFinalPlan=true`) — AQE applies exchange/stage reuse only at
  * materialization, so `Explain` (pre-execution) can't show whether a
  * double-referenced subplan actually re-scans its input or reuses the
  * shuffle stage.
  *
  * Usage: sbt "runMain graft.tools.FinalPlan [sfDir] [q102 q134 ...]"
  */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1).toSet
    val spark = Sessions.local("graft-finalplan", "4")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (names.exists(name.startsWith)) {
        println(s"\n=================== $name ===================")
        try {
          val df = fn(spark, sfDir)
          // collect(), NOT count(): count() builds a SEPARATE
          // QueryExecution (groupBy().count()), leaving df's own adaptive
          // plan un-executed — the printed tree would be
          // isFinalPlan=false with runtime reuse decisions invisible
          df.collect()
          println(df.queryExecution.executedPlan.toString.take(6000))
        } catch { case e: Throwable =>
          println(s"FAILED: ${String.valueOf(e.getMessage).take(300)}")
        }
      }
    }
    spark.stop()
  }
}
