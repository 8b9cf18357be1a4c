package graft

import org.apache.spark.sql.types.LongType

import graft.catalog.Tables

/** Round-11 optimization: [[Tables.load]] caches the inferred parquet
  * schema per (dir, table, nanosAsLong) and re-loads via
  * `.schema(cached)` — a metastore-style metadata cache that skips the
  * per-call footer inference (~60 ms → ~6 ms). This spec pins the
  * correctness contract: the cached-schema relation must be
  * indistinguishable from a fresh-inference read — same schema
  * (including nullability), same rows — and the `events.ts`
  * BIGINT-nanos surface must survive the cached path.
  */
class TablesSchemaCacheSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("cached-schema load ≡ fresh inference for every table") {
    for (name <- Tables.all) {
      val cached = Tables.load(spark, dir, name)      // populates + uses cache
      val cached2 = Tables.load(spark, dir, name)     // pure cache hit
      val fresh = spark.read.parquet(Tables.path(dir, name))
      assert(cached2.schema === cached.schema, s"$name: cache hit drifted")
      if (name != "events") {
        assert(cached.schema === fresh.schema,
          s"$name: cached schema != freshly inferred schema")
        assert(cached.exceptAll(fresh).isEmpty && fresh.exceptAll(cached).isEmpty,
          s"$name: cached-path rows differ from fresh-path rows")
      }
    }
  }

  test("events.ts surfaces as BIGINT nanos through the cached path") {
    val e1 = Tables.load(spark, dir, "events")
    val e2 = Tables.load(spark, dir, "events")
    assert(e1.schema("ts").dataType === LongType)
    assert(e2.schema("ts").dataType === LongType)
    // nanos are µs-aligned (Tables scaladoc) and roundtrip through tsMicros
    val bad = e2.filter(Tables.tsMicros(org.apache.spark.sql.functions.col("ts")).isNull)
    assert(bad.count() === 0)
  }
}
