package graft

import org.apache.spark.sql.functions._
import graft.catalog.Tables

/** Bucketed-table co-located join — the lake-layout technique the pack
  * scaladocs cite for 100 TB fact⋈fact joins (JoinsAggs: "both sides
  * arrive pre-bucketable on orderkey"). Writing lineitem and orders
  * bucketed by the join key lets Catalyst plan a SortMergeJoin with NO
  * Exchange on either side: the shuffle happened once at write time and
  * every subsequent join reuses the layout for free.
  *
  * This spec proves the claim end-to-end: same join, same data — the
  * parquet-path plan shuffles both sides, the bucketed plan shuffles
  * neither, and both return identical results.
  */
class BucketedJoinSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("bucketed fact-fact join plans zero exchanges and matches path-read") {
    // tables land in the session's default warehouse (dropped in finally;
    // warehouse.dir is a static conf and can't move per-test)
    // buckets must exceed the broadcast threshold's reach: disable
    // auto-broadcast so both variants plan a two-sided join
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.load(spark, sf, "lineitem")
        .select("l_orderkey", "l_extendedprice")
        .write.mode("overwrite")
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      Tables.load(spark, sf, "orders")
        .select("o_orderkey", "o_totalprice")
        .write.mode("overwrite")
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("o_bucketed")

      def joined(li: org.apache.spark.sql.DataFrame,
          o: org.apache.spark.sql.DataFrame) =
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderkey")
          .agg(count(lit(1)).as("n"),
            sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"))

      val bucketed = joined(spark.table("li_bucketed"), spark.table("o_bucketed"))
      val pathRead = joined(
        Tables.load(spark, sf, "lineitem").select("l_orderkey", "l_extendedprice"),
        Tables.load(spark, sf, "orders").select("o_orderkey", "o_totalprice"))

      // collect(), NOT count(): count() executes a separate
      // QueryExecution and would leave these Datasets' adaptive plans
      // un-finalized (isFinalPlan=false)
      val b = bucketed.orderBy("o_orderkey").collect()
      val p = pathRead.orderBy("o_orderkey").collect()
      bucketed.collect()
      pathRead.collect()
      val bPlan = bucketed.queryExecution.executedPlan.toString
      val pPlan = pathRead.queryExecution.executedPlan.toString

      def exchanges(p: String): Int =
        p.linesIterator.count(_.contains("Exchange hashpartitioning"))
      // path-read: both join sides shuffle (+1 for the final groupBy that
      // bucketing also absorbs)
      assert(exchanges(pPlan) >= 2, s"expected shuffles in path plan:\n$pPlan")
      assert(exchanges(bPlan) == 0,
        s"bucketed join must not shuffle:\n$bPlan")

      assert(b.sameElements(p), "bucketed and path-read results must match")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
