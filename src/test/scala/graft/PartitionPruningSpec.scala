package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The reference's optional date partitioning (README.md:288,468) and the
  * pruning it buys: a `partitionBy(event_date)` parquet layout must plan
  * date-filtered scans that read only matching partitions.
  */
class PartitionPruningSpec extends SparkSpecBase {

  test("partitionBy(event_date) write → date filter prunes partitions") {
    val s = spark
    val dir = Files.createTempDirectory("part").toString
    graft.etl.Medallion.factEvents(s, "/root/testdata/sf0.001")
      .write.mode("overwrite").partitionBy("event_date")
      .parquet(s"$dir/events_by_date")
    val dates = s.read.parquet(s"$dir/events_by_date")
      .select("event_date").distinct().collect().map(_.getDate(0)).sorted
    assert(dates.length > 1, "fixture must span multiple dates")
    val pick = dates(dates.length / 2)
    val q = s.read.parquet(s"$dir/events_by_date")
      .filter(col("event_date") === lit(pick))
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("event_date"), scan)
    // count must equal the partition's rows — i.e. the filter worked
    assert(q.count() > 0)
  }
}
