package graft

import org.apache.spark.sql.SparkSession

/** Throwaway smoke main: read every testdata table, print schema + count. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.catalog.Tables.all.foreach { n =>
      try {
        val df = graft.catalog.Tables.load(spark, dir, n)
        println(s"== $n: ${df.count()} rows; ${df.schema.simpleString}")
        df.show(2, truncate = 40)
      } catch {
        case e: Throwable => println(s"== $n FAILED: ${e.getClass.getSimpleName}: ${e.getMessage.take(300)}")
      }
    }
    spark.stop()
  }
}
