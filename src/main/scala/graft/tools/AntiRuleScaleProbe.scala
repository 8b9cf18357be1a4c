package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Sessions

/** Scale stress proof for the round-8 LEFT-ANTI hamming rewrite — the
  * decontamination shape ("corpus docs near NO eval doc") at growing
  * corpus AND eval sizes. Eval is every 64th corpus signature, so the
  * naive anti's work is |corpus|·|eval| = n²/64 signature comparisons
  * (×4 per doubling — a BroadcastNestedLoopJoin streams every corpus
  * row past every eval row), while the rule-planned form explodes k+1
  * segments, hash-joins, and collapses per row id: O(n + collisions),
  * ×2 per doubling. Both arms are asserted to KEEP the identical row
  * set wherever the naive arm runs.
  *
  * Signatures are xxhash64-scrambled 64-bit longs — near-uniform,
  * so cross-row hamming-≤2 collisions are vanishingly rare and the
  * kept set is essentially corpus − eval (eval rows self-match at
  * distance 0 and are always dropped); segment buckets stay tiny and
  * the rule arm's collision term is negligible, which is exactly the
  * production SimHash regime.
  *
  * Usage: sbt "runMain graft.tools.AntiRuleScaleProbe [ns] [naiveMaxN]"
  * (SPARK_GRAFT_CPUS=16 for BASELINE-comparable numbers.)
  * Prints one JSON line per n.
  */
object AntiRuleScaleProbe {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val ns = args.headOption.getOrElse("65536,131072,262144,524288")
      .split(",").map(_.trim.toInt).toSeq
    val naiveMaxN = args.lift(1).map(_.toInt).getOrElse(262144)
    val spark = Sessions.local("graft-anti-scale")
    val excl = "spark.sql.optimizer.excludedRules"

    for (n <- ns) {
      val corpus = spark.range(n.toLong)
        .select(col("id"), xxhash64(col("id")).as("sig")) // uniform 64-bit
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      corpus.count()
      val eval = corpus.filter(col("id") % 64 === 0)
        .select(col("id").as("eid"), col("sig").as("esig"))

      def anti(): DataFrame = corpus.join(eval,
        bit_count(col("sig").bitwiseXOR(col("esig"))) <= 2, "left_anti")

      // rule arm (fires whenever no equi key exists — no threshold game)
      val rulePlan = anti().queryExecution.executedPlan.toString
      require(rulePlan.contains("graft_seg"),
        s"anti rewrite did not fire at n=$n")
      val (kept, tRule) = timed(anti().count())

      // naive arm: rule excluded → BroadcastNestedLoopJoin LeftAnti
      val (keptN, tNaive) = if (n <= naiveMaxN) {
        spark.conf.set(excl, "graft.plans.HammingJoinBlocking")
        try {
          require(!anti().queryExecution.executedPlan.toString
            .contains("graft_seg"), s"exclusion failed at n=$n")
          val r = timed(anti().count())
          // identical kept sets (bag compare both directions)
          spark.conf.unset(excl)
          val ruled = anti()
          spark.conf.set(excl, "graft.plans.HammingJoinBlocking")
          val naiveR = anti()
          val diff = ruled.exceptAll(naiveR).count() +
            naiveR.exceptAll(ruled).count()
          require(diff == 0, s"anti mismatch at n=$n")
          r
        } finally spark.conf.unset(excl)
      } else (-1L, -1.0)

      println(s"""{"n":$n,"eval":${n / 64},"kept":$kept,""" +
        s""""t_rule":${f"$tRule%.2f"},"kept_naive":$keptN,""" +
        s""""t_naive":${f"$tNaive%.2f"}}""")
      corpus.unpersist()
    }
    spark.stop()
  }
}
