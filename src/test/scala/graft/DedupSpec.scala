package graft

import org.apache.spark.sql.functions._
import graft.functions.Vectors

class DedupSpec extends SparkSpecBase {

  test("cosine: exact on known vectors, ≈1 on self") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(1.0, 2.0), Seq(2.0, 4.0)),
      (Seq(3.0, 4.0), Seq(3.0, 4.0))).toDF("a", "b")
    val cos = df.select(Vectors.cosine(col("a"), col("b"))).collect()
      .map(_.getDouble(0))
    assert(cos(0) === 0.0)
    assert(math.abs(cos(1) - 1.0) < 1e-12)
    assert(math.abs(cos(2) - 1.0) < 1e-12)
  }

  test("dedup is idempotent and keeps exactly one row per key") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 1), ("a", 1), ("a", 2), ("b", 9)).toDF("k", "v")
    val once = df.dropDuplicates("k")
    assert(once.count() === 2)
    assert(once.dropDuplicates("k").count() === 2)
  }

  test("token-set jaccard is 1 for identical sets and bounded in [0,1]") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("x y z", "z y x"),
      ("a b", "c d"),
      ("a b c", "b c d")).toDF("t1", "t2")
    val j = df.select(
      (size(array_intersect(split(col("t1"), " "), split(col("t2"), " "))) /
        size(array_union(split(col("t1"), " "), split(col("t2"), " "))))
        .as("j")).collect().map(_.getDouble(0))
    assert(j(0) === 1.0)
    assert(j(1) === 0.0)
    assert(j(2) === 0.5)
    assert(j.forall(x => x >= 0.0 && x <= 1.0))
  }

  test("minhash signatures: identical token sets collide, disjoint differ") {
    val s = spark
    import s.implicits._
    val sig = (i: Int) =>
      array_min(transform(split(col("text"), " "),
        t => md5(concat(lit(s"$i|"), t))))
    val df = Seq(
      (1L, "red green blue"),
      (2L, "blue green red"), // same set, different order
      (3L, "cyan magenta yellow black white purple")).toDF("id", "text")
      .select(col("id"), sig(0).as("h0"), sig(1).as("h1"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
      .toMap
    assert(df(1L) === df(2L))
    assert(df(1L) !== df(3L))
  }

  test("q188: estimate-error audit is consistent and candidates skew high") {
    val row = graft.queries.DedupPack.queries.toMap
      .apply("q188_minhash_error")(spark, "/root/testdata/sf0.001").head()
    val (n, mean, mx, over) =
      (row.getLong(0), row.getDouble(1), row.getDouble(2), row.getLong(3))
    assert(n > 0, "banding must surface candidate pairs")
    assert(over <= n)
    assert(mean >= 0.0 && mean <= mx, "mean bounded by max")
    assert(mx <= 1.0)
    // k = 8 quantizes the estimate to eighths; a candidate set that
    // banding surfaced should still estimate within ~2 quanta on average
    assert(mean <= 0.25, s"mean abs error $mean — estimator off the rails")
  }
}
