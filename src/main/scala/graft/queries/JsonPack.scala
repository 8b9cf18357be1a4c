package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, MapType, StringType, StructField, StructType}
import graft.catalog.Tables

/** Semi-structured (JSON) columns — `events.props` carries a JSON object
  * per event. Path extraction (`get_json_object`), schema-on-read
  * (`from_json` to a typed struct), and aggregation over extracted values.
  * The reference's raw zone is "CSV or JSON (as-is)" (README.md:423-424);
  * this is the JSON half of that surface, Spark-native.
  *
  * Scale note: both extraction forms are per-row codegen'd expressions —
  * no shuffle until the aggregate, which partial-aggregates map-side.
  * `from_json` with an explicit schema is the 100 TB shape (no sampling
  * pass); schema inference over a petabyte of JSON is the anti-pattern.
  */
object JsonPack extends QueryPack {

  /** Path extraction per event: `$.k` as a typed int. */
  private def q80(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .orderBy("event_id")

  /** Schema-on-read with an explicit StructType + aggregation over the
    * extracted field: events per k-bucket with value totals.
    */
  private def q81(s: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(StructField("k", IntegerType)))
    Tables.load(s, dir, "events")
      .select(from_json(col("props"), schema).getField("k").as("k"),
        col("value"))
      .groupBy((col("k") % 10).as("k_bucket"))
      .agg(
        count(lit(1)).as("n_events"),
        moneySum2(col("value")).as("total_value"))
      .orderBy("k_bucket")
  }

  /** q83 — schema-less map view of the JSON object: `from_json` to
    * `map<string,int>`, then map functions (size, key list) + explode to
    * one row per entry. The shape for JSON objects with *dynamic* keys,
    * where q81's fixed StructType can't apply; explode keeps the output
    * flat for the oracle compare. The DuckDB twin walks the same object
    * via `json_keys` + unnest — no key is hardcoded on either side.
    */
  private def q83(s: SparkSession, dir: String): DataFrame = {
    val mt = MapType(StringType, IntegerType)
    Tables.load(s, dir, "events")
      .withColumn("m", from_json(col("props"), mt))
      .select(col("event_id"),
        size(col("m")).as("n_keys"),
        array_join(map_keys(col("m")), ",").as("keys_csv"),
        explode(col("m")))
      .orderBy("event_id", "key")
  }

  override val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q80_json_extract" -> q80 _,
    "q81_json_agg" -> q81 _,
    "q83_json_map_explode" -> q83 _)

  override val oracle: Seq[(String, String)] = Seq(
    "q80_json_extract" ->
      """SELECT event_id,
        | CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "q83_json_map_explode" ->
      """WITH km AS (
        | SELECT event_id, props, unnest(json_keys(props)) AS key
        | FROM events)
        |SELECT event_id,
        | CAST(len(json_keys(props)) AS INT) AS n_keys,
        | array_to_string(json_keys(props), ',') AS keys_csv,
        | key,
        | CAST(json_extract_string(props, '$.' || key) AS INT) AS value
        |FROM km ORDER BY event_id, key""".stripMargin,
    "q81_json_agg" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10
        |   AS k_bucket,
        | count(*) AS n_events,
        | ((CASE WHEN sum(CAST(round((value) * 10000) AS BIGINT)) >= 0 THEN (sum(CAST(round((value) * 10000) AS BIGINT)) + 50) - (sum(CAST(round((value) * 10000) AS BIGINT)) + 50) % 100 ELSE -((-sum(CAST(round((value) * 10000) AS BIGINT)) + 50) - (-sum(CAST(round((value) * 10000) AS BIGINT)) + 50) % 100) END) / 10000.0) AS total_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)
}
