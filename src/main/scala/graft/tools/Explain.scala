package graft.tools

import graft.{Sessions, SparkEntry}

/** Debugging utility: dump `explain("formatted")` for selected queries
  * (all when no names given) — used to audit pushdown / broadcast / WSCG
  * shapes against the scale notes each pack's scaladoc claims.
  *
  * Usage: sbt "runMain graft.tools.Explain [sfDir] [q21 q34 ...]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1).toSet
    val spark = Sessions.local("graft-explain", "4")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (names.isEmpty || names.exists(name.startsWith)) {
        println(s"\n=================== $name ===================")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable =>
          println(s"FAILED: ${String.valueOf(e.getMessage).take(300)}")
        }
      }
    }
    spark.stop()
  }
}
