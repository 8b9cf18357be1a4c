package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Sessions

/** Adversarial-skew stress proof for SetSimilarityJoinBlocking's
  * CONTAINMENT arm: the HOT-MIN-TOKEN regime `ContainScaleProbe`'s
  * namespace tagging dodges by construction. Real corpora assign token
  * ids by frequency, so one ubiquitous token ("aa" here — value-order
  * minimal) is the minimal element of EVERY set: all probes land in
  * one bucket whose candidate count is |A|·|O| — the rewrite's hash
  * join degenerates to the naive cross product (k² in the corpus scale
  * k, since the hot token is GLOBAL across copies while the rare
  * vocabulary is per-copy).
  *
  * The mitigation under measure: `spark.graft.setsim.stopTokens=aa`
  * demotes the hot token to the END of the probe-key order, so the key
  * becomes the RAREST available element; rare vocabularies are
  * per-copy-disjoint, so buckets stay flat and the arm returns to k¹.
  * Soundness carries because the containment probe key may be ANY
  * deterministic element of distinct(sub) — the sup side explodes its
  * full distinct set. All three verdicts (hot rule, demoted rule, true
  * naive at small k) are asserted to produce IDENTICAL bags.
  *
  * Corpus (deterministic, hash-derived): per copy i of k, nO superset
  * rows {"aa", r₁, r₂, r₃} and nA probe rows {"aa", r} with rare
  * tokens "c<i>_t<hash % V>" — a probe qualifies iff its rare token
  * sits in the superset's three.
  *
  * Usage: sbt "runMain graft.tools.ContainSkewProbe [ks] [hotMaxK]
  * [nO] [nA] [V]". Prints one JSON line per k.
  */
object ContainSkewProbe {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val ks = args.headOption.getOrElse("1,2,4")
      .split(",").map(_.trim.toInt).toSeq
    val hotMaxK = args.lift(1).map(_.toInt).getOrElse(2)
    val nO = args.lift(2).map(_.toInt).getOrElse(10000)
    val nA = args.lift(3).map(_.toInt).getOrElse(1000)
    val v = args.lift(4).map(_.toInt).getOrElse(5000)
    val spark = Sessions.local("graft-contain-skew")

    // split()-born arrays carry containsNull=false — the arm's
    // eligibility gate; array() over pmod-derived strings is marked
    // nullable and the rule (correctly) stands down, which this
    // probe's first draft measured as "three identical naive arms"
    // until the fire assertions below were added
    def rare(cp: Int, seed: Column): Column =
      concat(lit(s"c${cp}_t"),
        lpad(pmod(hash(seed), lit(v)).cast("string"), 6, "0"))
    def sups(cp: Int): DataFrame =
      spark.range(nO.toLong).toDF("i").select(
        (col("i") + cp * 100000000L).as("id"),
        array_distinct(split(concat_ws(" ", lit("aa"),
          rare(cp, col("i") * 3 + 1), rare(cp, col("i") * 3 + 2),
          rare(cp, col("i") * 3 + 3)), " ")).as("parts"))
    def probes(cp: Int): DataFrame =
      spark.range(nA.toLong).toDF("i").select(
        (col("i") + cp * 100000000L).as("aid"),
        split(concat_ws(" ", lit("aa"), rare(cp, col("i") * 7 + 5)), " ")
          .as("aparts"))

    val rule = "graft.plans.SetSimilarityJoinBlocking"
    val stopKey = "spark.graft.setsim.stopTokens"

    for (k <- ks) {
      val o = (0 until k).map(sups).reduce(_ union _)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val a = (0 until k).map(probes).reduce(_ union _)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = o.count(); a.count()

      def inner(): DataFrame = a.join(o,
        size(array_except(col("aparts"), col("parts"))) === 0 &&
          col("aid") =!= col("id"))
        .select(col("aid"), col("id"))
      def bag() = inner().groupBy("aid", "id").count()
        .agg(count(lit(1)), sum(col("count")),
          sum(hash(col("aid"), col("id")) * col("count")))
        .collect().head

      // demoted probe key (the mitigation) — runs at every k. The
      // fire assertions keep the probe honest: a silently-ineligible
      // corpus makes all three arms measure the SAME naive plan and
      // the identical-bag requires pass vacuously.
      spark.conf.set(stopKey, "aa")
      val (coolBag, tCool) =
        try RuleToggle.withIncluded(spark, rule) {
          val p = inner().queryExecution.executedPlan.toString
          require(p.contains("graft_sst") && p.contains("graft_ssc"),
            s"demoted arm must fire with the order surrogate:\n${p.take(2000)}")
          timed(bag())
        }
        finally spark.conf.unset(stopKey)
      // hot-bucket rule (value-order min = "aa" everywhere) and the
      // true naive plan — both bucket/loop-quadratic, capped at
      // hotMaxK so the probe terminates
      val (tHot, tNaive) = if (k <= hotMaxK) {
        val (hotBag, t1) = RuleToggle.withIncluded(spark, rule) {
          val p = inner().queryExecution.executedPlan.toString
          require(p.contains("graft_sst") && !p.contains("graft_ssc"),
            s"hot arm must fire on the plain value order:\n${p.take(2000)}")
          timed(bag())
        }
        val (naiveBag, t2) =
          RuleToggle.withExcluded(spark, rule)(timed(bag()))
        require(hotBag == coolBag, s"k=$k: hot rule bag != demoted bag")
        require(naiveBag == coolBag, s"k=$k: naive bag != demoted bag")
        (t1, t2)
      } else (-1.0, -1.0)

      println(s"""{"k":$k,"sup_rows":$n,"pairs":${coolBag.getLong(1)},""" +
        s""""demoted_rule_sec":${f"$tCool%.2f"},""" +
        s""""hot_rule_sec":${f"$tHot%.2f"},""" +
        s""""naive_sec":${f"$tNaive%.2f"}}""")
      o.unpersist(); a.unpersist()
    }
    spark.stop()
  }
}
