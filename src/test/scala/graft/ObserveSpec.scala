package graft

import org.apache.spark.sql.functions._
import graft.etl.Observe

/** `Dataset.observe` + QueryExecutionListener observability: metrics
  * computed inside a job's own pass must equal an independent direct
  * aggregation, survive alongside a real write action, and cost no extra
  * scan (the observed plan is the SAME plan).
  */
class ObserveSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("observed quality metrics equal a direct aggregation, zero extra scans") {
    val sink = Observe.attach(spark)
    try {
      val orders = graft.catalog.Tables.load(spark, dir, "orders")
      val observed = Observe.withMetrics(orders, "orders_quality",
        count(lit(1)).as("n_rows"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_cust"),
        max(round(col("o_totalprice") * 100).cast("long")).as("max_cents"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("sum_cents"))
      // drive the metrics with a real write action (the medallion shape)
      val out = java.nio.file.Files
        .createTempDirectory("observe_out").toString
      observed.write.mode("overwrite").parquet(out)
      val m = Observe.awaitMetric(sink, "orders_quality")
      val direct = orders.agg(
        count(lit(1)), sum(when(col("o_custkey").isNull, 1L).otherwise(0L)),
        max(round(col("o_totalprice") * 100).cast("long")),
        sum(round(col("o_totalprice") * 100).cast("long"))).collect().head
      assert(m.getLong(0) === direct.getLong(0))
      assert(m.getLong(1) === direct.getLong(1))
      assert(m.getLong(2) === direct.getLong(2))
      assert(m.getLong(3) === direct.getLong(3))
      // the written output is complete — metrics didn't fork the plan
      assert(spark.read.parquet(out).count() === m.getLong(0))
    } finally spark.listenerManager.unregister(sink)
  }

  test("awaitMetric consumes: a reused name delivers the NEW action's row") {
    val sink = Observe.attach(spark)
    try {
      def run(limit: Int): Long = {
        val df = Observe.withMetrics(
          graft.catalog.Tables.load(spark, dir, "orders").limit(limit),
          "reused_name", count(lit(1)).as("n_rows"))
        df.write.mode("overwrite").parquet(
          java.nio.file.Files.createTempDirectory("observe_out2").toString)
        Observe.awaitMetric(sink, "reused_name").getLong(0)
      }
      // before the remove-on-read fix the second await returned the
      // FIRST action's stale 7-row entry immediately (ADVICE r5)
      assert(run(7) === 7L)
      assert(run(11) === 11L)
      assert(!sink.metrics.contains("reused_name"), "read must consume")
    } finally spark.listenerManager.unregister(sink)
  }
}
