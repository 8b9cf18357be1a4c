package graft

import org.apache.spark.sql.functions._

/** Nondeterministic scalar functions (SURVEY.md §2.7 F5/F6) — excluded
  * from the DuckDB-verified set by design (SURVEY.md §5 caveat), asserted
  * here on shape and distribution instead.
  */
class ScalarFuncsSpec extends SparkSpecBase {

  test("uuid(): RFC-4122 shape, unique per row") {
    val s = spark
    import s.implicits._
    val ids = s.range(1000).select(expr("uuid()").as("u"))
      .collect().map(_.getString(0))
    val re = "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
    assert(ids.forall(_.matches(re)))
    assert(ids.distinct.length === ids.length)
  }

  test("rand(seed) + when/otherwise ladder: deterministic categorical draw") {
    val s = spark
    import s.implicits._
    def draw() = s.range(2000)
      .select(
        when(rand(7) < 0.4, "mobile")
          .when(rand(7) < 0.75, "desktop")
          .otherwise("tablet").as("device"))
      .groupBy("device").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val d1 = draw()
    assert(d1 === draw()) // seeded → reproducible
    assert(d1("mobile") > 600 && d1("mobile") < 1000) // ≈ 0.4 of 2000
    assert(d1.values.sum === 2000L)
  }

  test("element_at(array, 1 + rand*n) picks only valid members") {
    val s = spark
    import s.implicits._
    val choices = s.range(500).select(
      element_at(array(lit("direct"), lit("search"), lit("social")),
        (rand(3) * 3 + 1).cast("int")).as("src"))
      .collect().map(_.getString(0)).toSet
    assert(choices.subsetOf(Set("direct", "search", "social")))
  }
}
