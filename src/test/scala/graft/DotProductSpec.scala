package graft

import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** The native [[graft.functions.DotProduct]] expression must agree exactly
  * (bit-for-bit) with the higher-order-function fold it replaces — the
  * DuckDB oracle parity of every cosine query rides on this.
  */
class DotProductSpec extends SparkSpecBase {

  test("native graft_dot ≡ HOF fold, bit-exact, on random vectors") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)(
      (Seq.fill(64)(rnd.nextDouble() * 2 - 1),
        Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val diff = df.select(
      (Vectors.dot(col("a"), col("b")) -
        Vectors.dotHof(col("a"), col("b"))).as("d"))
      .agg(max(abs(col("d")))).head().getDouble(0)
    assert(diff === 0.0)
  }

  test("graft_dot: nulls propagate, zip semantics on length mismatch") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(4.0, 5.0))),
      (None, Some(Seq(1.0)))).toDF("a", "b")
    val out = df.select(Vectors.dot(col("a"), col("b")).as("d")).collect()
    assert(out(0).getDouble(0) === 1.0 * 4.0 + 2.0 * 5.0)
    assert(out(1).isNullAt(0))
  }

  test("graft_dot is callable from SQL") {
    val v = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
      .head().getDouble(0)
    assert(v === 11.0)
  }
}
