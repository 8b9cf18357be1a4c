package graft.tools

import graft.{Sessions, SparkEntry}

/** Debugging: run a subset of queries in order, timing each — used to
  * bisect cross-query JVM-state interference in Bench.
  * Usage: runMain graft.tools.BenchSeq <sfDir> <name-prefix> [<prefix>…]
  */
object BenchSeq {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val prefixes = args.drop(1)
    val spark = Sessions.local("graft-benchseq")
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
    qs.foreach { case (name, fn) =>
      // min-of-2 + clearCache between queries: the Bench methodology, so
      // targeted A/B numbers are comparable to the bench record.
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count()
        catch { case e: Throwable => println(s"$name FAILED: ${e.getMessage}") }
        (System.nanoTime() - t0) / 1e9
      }
      spark.sqlContext.clearCache()
      println(f"[t] $name%-28s ${times.min}%8.2f s  (reps ${times.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
