package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.DistRank

/** [[graft.functions.DistRank]] must be BIT-IDENTICAL to Spark's own
  * single-partition `row_number`/`ntile` on every input shape — the swap
  * into q114/q115/q142/q171/q177/q183 is only sound if the distributed
  * form reproduces the exact global order arithmetic.
  */
class DistRankSpec extends SparkSpecBase {

  import spark.implicits._

  /** n rows keyed by a non-monotonic value with a unique id tiebreak —
    * hash-scrambled so range partitions don't align with input order.
    */
  private def corpus(n: Int): DataFrame =
    spark.range(n.toLong).select(
      col("id"),
      (col("id") * 1103515245L % 9973L).as("v"))

  private def checkRn(n: Int): Unit = {
    val df = corpus(n)
    val expect = df.withColumn("rn",
      row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
    val got = DistRank.withRowNumber(df, "rn", col("v"), col("id"))
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
      s"row_number mismatch at n=$n")
  }

  private def checkNtile(n: Int, k: Int): Unit = {
    val df = corpus(n)
    val expect = df.withColumn("t",
      ntile(k).over(Window.orderBy(col("v"), col("id"))))
    val got = DistRank.withNtile(df, "t", k, col("v"), col("id"))
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
      s"ntile mismatch at n=$n k=$k")
  }

  test("row_number parity across sizes incl. empty and single-row") {
    for (n <- Seq(0, 1, 2, 7, 100, 1777)) checkRn(n)
  }

  test("ntile parity: divisible, remainder, and n < k shapes") {
    checkNtile(100, 4)   // divisible
    checkNtile(1777, 3)  // remainder: first 1777%3 tiles one row larger
    checkNtile(2, 5)     // n < k: tiles 1..n of one row, k-n empty
    checkNtile(0, 4)     // empty
  }

  test("descending order keys rank identically") {
    val df = corpus(500)
    val expect = df.withColumn("rn",
      row_number().over(Window.orderBy(col("v").desc, col("id"))).cast("long"))
    val got = DistRank.withRowNumber(df, "rn", col("v").desc, col("id"))
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
  }

  test("heavy ties resolved by the unique tiebreak") {
    val df = spark.range(300).select(col("id"), (col("id") % 3).as("v"))
    val expect = df.withColumn("t",
      ntile(7).over(Window.orderBy(col("v"), col("id"))))
    val got = DistRank.withNtile(df, "t", 7, col("v"), col("id"))
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
  }

  test("no corpus-grain unpartitioned WindowExec in the physical plan") {
    val got = DistRank.withRowNumber(corpus(100), "rn", col("v"), col("id"))
    val p = got.queryExecution.executedPlan.toString
    val windowLines = p.linesIterator.filter(_.contains("Window ")).toList
    assert(windowLines.nonEmpty, p)
    // every window is either partitioned by the range-slice id or is the
    // P-row offsets prefix sum (which orders by it)
    assert(windowLines.forall(_.contains("graft_rank_pid")),
      s"corpus-grain global window leaked:\n$p")
  }
}
