package graft

import org.apache.spark.sql.functions._
import graft.etl.Lakehouse

/** Unit semantics for the lakehouse maintenance operators (exact expected
  * rows on tiny frames; the oracle gate covers them at scale via q76/q77).
  */
class LakehouseSpec extends SparkSpecBase {

  test("upsert: updates win, unmatched base passes, new keys insert") {
    val s = spark
    import s.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val updates = Seq((2L, "B"), (9L, "new")).toDF("k", "v")
    val out = Lakehouse.upsert(base, updates, "k")
      .as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "a", 2L -> "B", 3L -> "c", 9L -> "new"))
  }

  test("upsert is idempotent: applying the same batch twice is a no-op") {
    val s = spark
    import s.implicits._
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val updates = Seq((2L, "B")).toDF("k", "v")
    val once = Lakehouse.upsert(base, updates, "k")
    val twice = Lakehouse.upsert(once, updates, "k")
    assert(twice.as[(Long, String)].collect().toMap ===
      once.as[(Long, String)].collect().toMap)
  }

  test("compact merges a many-file table, preserving rows and values") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact")
      .resolve("t").toString
    val df = (1L to 10000L).map(i => (i, s"v$i")).toDF("k", "v")
    df.repartition(40).write.mode("overwrite").parquet(dir)
    def dataFiles = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(dataFiles >= 20, s"fixture should start fragmented: $dataFiles")
    val before = spark.read.parquet(dir).orderBy("k").collect()

    Lakehouse.compact(spark, dir, targetFiles = 2)

    assert(dataFiles <= 2, s"expected ≤2 files after compaction: $dataFiles")
    val after = spark.read.parquet(dir).orderBy("k").collect()
    assert(after.sameElements(before), "compaction must not change data")
  }

  test("scd2History collapses runs into [valid_from, valid_to) ranges") {
    val s = spark
    import s.implicits._
    // user 1: a,a,b,a → ranges a@[0,2) b@[2,3) a@[3,∞); user 2: x → current
    val df = Seq(
      (1L, "a", 0L, 100L), (1L, "a", 1L, 101L), (1L, "b", 2L, 102L),
      (1L, "a", 3L, 103L), (2L, "x", 5L, 104L))
      .toDF("user_id", "attr", "t", "id")
    val out = Lakehouse.scd2History(df, "user_id", "attr", col("t"), col("id"))
      .orderBy("user_id", "valid_from")
      .as[(Long, String, Long, Option[Long], Int)].collect().toSeq
    assert(out === Seq(
      (1L, "a", 0L, Some(2L), 0),
      (1L, "b", 2L, Some(3L), 0),
      (1L, "a", 3L, None, 1),
      (2L, "x", 5L, None, 1)))
  }

  test("scd2History invariants hold on randomized event sequences") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    // unique global t ⇒ total order within every user
    val rows = (0 until 600).map { i =>
      (rnd.nextInt(25).toLong, s"v${rnd.nextInt(4)}", i.toLong, i.toLong)
    }
    val df = rows.toDF("user_id", "attr", "t", "id")
    val out = Lakehouse.scd2History(df, "user_id", "attr", col("t"), col("id"))
      .as[(Long, String, Long, Option[Long], Int)].collect()
      .groupBy(_._1)

    val byUser = rows.groupBy(_._1)
    byUser.foreach { case (uid, evs) =>
      val hist = out(uid).sortBy(_._3) // by valid_from (unique per user)
      val sorted = evs.sortBy(_._3)
      val nChanges = 1 + sorted.map(_._2).sliding(2).count {
        case Seq(a, b) => a != b
        case _ => false
      }
      assert(hist.length === nChanges, s"user $uid row count")
      // contiguity: each valid_to is the next range's valid_from
      hist.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3), s"user $uid gap at ${a._3}")
          assert(a._2 !== b._2, s"user $uid adjacent ranges share attr")
        case _ =>
      }
      // exactly one open/current range, and it carries the latest value
      assert(hist.count(_._4.isEmpty) === 1)
      assert(hist.count(_._5 == 1) === 1)
      val current = hist.find(_._4.isEmpty).get
      assert(current._5 === 1)
      assert(current._2 === sorted.last._2, s"user $uid current attr")
      assert(hist.head._3 === sorted.head._3, s"user $uid first valid_from")
    }
  }

  test("scd2History records transitions into and out of NULL runs") {
    val s = spark
    import s.implicits._
    // attr sequence a, null, a — the NULL period must surface as its own
    // range (a null-UNSAFE =!= would drop the null row AND re-open "a")
    val df = Seq(
      (1L, Some("a"), 0L, 100L), (1L, None, 1L, 101L),
      (1L, Some("a"), 2L, 102L))
      .toDF("user_id", "attr", "t", "id")
    val out = Lakehouse.scd2History(df, "user_id", "attr", col("t"), col("id"))
      .orderBy("valid_from")
      .as[(Long, Option[String], Long, Option[Long], Int)].collect().toSeq
    assert(out === Seq(
      (1L, Some("a"), 0L, Some(1L), 0),
      (1L, None, 1L, Some(2L), 0),
      (1L, Some("a"), 2L, None, 1)))
  }

  test("scd2History keeps a key's opening range when its first attr is NULL") {
    val s = spark
    import s.implicits._
    // lag's empty frame yields NULL for the first row; when the opening
    // attr is also NULL, NULL <=> NULL is true — without the explicit
    // first-row keep the key's earliest range silently disappears
    val df = Seq(
      (1L, None, 0L, 100L), (1L, Some("a"), 1L, 101L),
      (2L, None, 5L, 102L)) // user 2: single all-NULL history
      .toDF("user_id", "attr", "t", "id")
    val out = Lakehouse.scd2History(df, "user_id", "attr", col("t"), col("id"))
      .orderBy("user_id", "valid_from")
      .as[(Long, Option[String], Long, Option[Long], Int)].collect().toSeq
    assert(out === Seq(
      (1L, None, 0L, Some(1L), 0),
      (1L, Some("a"), 1L, None, 1),
      (2L, None, 5L, None, 1)))
  }

  test("scd2History: ties on ts break by the tie column deterministically") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a", 0L, 2L), (1L, "b", 0L, 1L)) // same ts, id orders b first
      .toDF("user_id", "attr", "t", "id")
    val out = Lakehouse.scd2History(df, "user_id", "attr", col("t"), col("id"))
      .orderBy("valid_from", "attr")
      .as[(Long, String, Long, Option[Long], Int)].collect().toSeq
    assert(out === Seq(
      (1L, "a", 0L, None, 1), // a is the later row (id 2) → current
      (1L, "b", 0L, Some(0L), 0)))
  }

  test("q267: profile stats equal a JVM recompute per column") {
    val sf = "/root/testdata/sf0.001"
    val rows = spark.read.parquet(s"$sf/orders.parquet").collect()
    val got = SparkEntry.queries("q267_table_profile")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet === Set("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"))
    def colVals(i: Int) = rows.map(r => if (r.isNullAt(i)) null else r.get(i))
    val schema = rows.head.schema.fieldNames.zipWithIndex.toMap
    got.foreach { case (c, r) =>
      val vs = colVals(schema(c))
      assert(r.getLong(1) === rows.length.toLong, s"$c n_rows")
      assert(r.getLong(2) === vs.filter(_ != null).distinct.length.toLong,
        s"$c ndv")
      assert(r.getLong(3) === vs.count(_ == null).toLong, s"$c nulls")
    }
    // typed extremes: numeric key column and a string column, exactly
    val keys = rows.map(_.getLong(schema("o_orderkey")))
    assert(got("o_orderkey").getDouble(4) === keys.min.toDouble)
    assert(got("o_orderkey").getDouble(5) === keys.max.toDouble)
    val st = rows.map(_.getString(schema("o_orderstatus")))
    assert(got("o_orderstatus").getString(6) === st.min)
    assert(got("o_orderstatus").getString(7) === st.max)
    assert(got("o_orderstatus").isNullAt(4) && got("o_orderkey").isNullAt(6))
  }
}
