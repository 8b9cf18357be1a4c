package graft

/** Throwaway smoke main: read every testdata table, print schema + count. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = Sessions.local("graft-smoke", "4")
    graft.catalog.Tables.all.foreach { n =>
      try {
        val df = graft.catalog.Tables.load(spark, dir, n)
        println(s"== $n: ${df.count()} rows; ${df.schema.simpleString}")
        df.show(2, truncate = 40)
      } catch {
        case e: Throwable => println(s"== $n FAILED: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}")
      }
    }
    spark.stop()
  }
}
