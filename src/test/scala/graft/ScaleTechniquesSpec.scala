package graft

import org.apache.spark.sql.functions._
import graft.functions.Salting

/** Plan-level assertions for the 100 TB techniques the library leans on:
  * bucketed co-located joins (no shuffle), salted skew joins (result
  * equivalence), and broadcast-join planning.
  */
class ScaleTechniquesSpec extends SparkSpecBase {

  test("bucketed tables co-locate: join plans with NO shuffle exchange") {
    val s = spark
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = graft.catalog.Tables
        .load(s, "/root/testdata/sf0.001", "lineitem")
        .select("l_orderkey", "l_quantity")
      val o = graft.catalog.Tables
        .load(s, "/root/testdata/sf0.001", "orders")
        .select("o_orderkey", "o_totalprice")
      li.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("li_bucketed")
      o.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("o_bucketed")
      val joined = s.table("li_bucketed")
        .join(s.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      s.sql("DROP TABLE IF EXISTS li_bucketed")
      s.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("salted join ≡ plain join on skewed data") {
    val s = spark
    import s.implicits._
    // 90% of the big side lands on one hot key.
    val big = s.range(10000)
      .select(when(col("id") % 10 === 0, col("id")).otherwise(lit(1L))
        .as("k"), col("id").as("payload"))
    val small = Seq((1L, "hot"), (10L, "a"), (20L, "b"), (30L, "c"))
      .toDF("k", "v")
    val plain = big.join(small, "k").select("k", "payload", "v")
    val salted = Salting.saltedEquiJoin(big, small, "k", 8)
      .select("k", "payload", "v")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("AQE splits a skewed shuffle-join partition at runtime") {
    val s = spark
    import s.implicits._
    val restore = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "10485760",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "5.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256MB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "67108864b",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.shuffle.partitions" ->
        s.conf.get("spark.sql.shuffle.partitions"))
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // enough reducers that the median partition is a normal key, making
      // the hot partition >> factor × median
      s.conf.set("spark.sql.shuffle.partitions", "16")
      // thresholds low enough that the hot key's partition counts as
      // skewed even at test scale
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      s.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // 300k rows, 2/3 on one hot key
      val big = s.range(0, 300000)
        .select(when(col("id") < 200000, lit(0L))
          .otherwise(pmod(col("id"), lit(50L)) + 1).as("k"),
          col("id").as("payload"))
      val dim = s.range(0, 51).select(col("id").as("k"),
        (col("id") * 2).as("v"))
      // bare join: a groupBy on k above it would forbid the split (it
      // needs the hash co-partitioning the split breaks)
      val j = big.join(dim, "k")
      // collect() finalizes THIS dataframe's adaptive plan (count() would
      // execute a different one)
      assert(j.collect().length === 300000)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"expected AQE skew handling in final plan:\n$plan")
    } finally restore.foreach { case (k, v) => s.conf.set(k, v) }
  }

  test("SQL BROADCAST hint forces the build side when autobroadcast is off") {
    val s = spark
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      graft.catalog.Tables.load(s, "/root/testdata/sf0.001", "lineitem")
        .createOrReplaceTempView("li_hint")
      graft.catalog.Tables.load(s, "/root/testdata/sf0.001", "part")
        .createOrReplaceTempView("p_hint")
      val q = s.sql(
        """SELECT /*+ BROADCAST(p_hint) */ p_brand, count(*) AS n
          |FROM li_hint JOIN p_hint ON l_partkey = p_partkey
          |GROUP BY p_brand""".stripMargin)
      assert(q.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("dimension under the threshold auto-broadcasts") {
    val s = spark
    val li = graft.catalog.Tables
      .load(s, "/root/testdata/sf0.001", "lineitem")
    val part = graft.catalog.Tables
      .load(s, "/root/testdata/sf0.001", "part")
    val joined = li.join(part, col("l_partkey") === col("p_partkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
