package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

object Q220Tmp {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("q220tmp")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val s = spark
    import s.implicits._
    val cells = spark.range(4000)
      .select((col("id") % 64).cast("int").as("x"),
        (col("id") / 64).cast("int").as("y"))
      .distinct().persist()
    val lut = (for { hx <- 0 until 64; hy <- 0 until 64 }
      yield (hx, hy, graft.functions.Hilbert.indexJvm(6, hx.toLong, hy.toLong)))
      .toDF("hx", "hy", "h")
    val keyed = cells.join(broadcast(lut),
      col("x") === col("hx") && col("y") === col("hy"))
      .select(col("x"), col("y"), col("h"))
    val rk = keyed.withColumn("rn",
      row_number().over(Window.orderBy(col("h"), col("x"), col("y"))))
    val n = rk.count()
    val nd = rk.select("rn").distinct().count()
    val mx = rk.agg(max("rn")).collect().head.getInt(0)
    println(s"ROWS=$n DISTINCT_RN=$nd MAX_RN=$mx")
    println(rk.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
