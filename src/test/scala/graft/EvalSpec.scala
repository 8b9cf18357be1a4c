package graft

import graft.queries.EvalPack

/** Eval pack checks: a hand-computed tie-heavy AUC fixture, a JVM
  * midrank recompute of the full-corpus AUC, and cross-query /
  * conservation invariants for the sweep, calibration, and confusion
  * outputs.
  */
class EvalSpec extends SparkSpecBase {

  import spark.implicits._

  private val sf0001 = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf0001)

  test("AUC rank-sum: hand-computed fixture with ties") {
    // scores/labels: 1-, 2-, 2+, 3+  (cnt, pos per score)
    // midranks: score1 → 1; score2 → 2.5; score3 → 4
    // Σmid(pos) = 2.5 + 4 = 6.5 ; AUC = (6.5 − 2·3/2) / (2·2) = 0.875
    val grain = Seq((1L, 1L, 0L), (2L, 2L, 1L), (3L, 1L, 1L))
      .toDF("score", "cnt", "pos")
    val r = EvalPack.aucFromGrain(grain).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((2L, 2L, 3L)))
    assert(r.getDouble(3) === 0.875)
    assert(r.getDouble(4) === 2.0 * 0.875 - 1.0)
  }

  test("AUC degenerates to 0.5 when scores carry no signal") {
    // every score has the same pos/neg mix → AUC exactly 1/2
    val grain = Seq((10L, 4L, 2L), (20L, 2L, 1L), (30L, 6L, 3L))
      .toDF("score", "cnt", "pos")
    assert(EvalPack.aucFromGrain(grain).collect().head.getDouble(3) === 0.5)
  }

  test("q200 on testdata: JVM midrank recompute agrees") {
    val sl = EvalPack.scoredLabeled(
      spark.read.parquet(s"$sf0001/documents.parquet"))
      .select("score", "label").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byScore = sl.groupBy(_._1).toSeq.sortBy(_._1)
    var cum = 0L
    var s2 = 0L
    byScore.foreach { case (_, rows) =>
      val cnt = rows.length.toLong
      val pos = rows.map(_._2).sum
      s2 += pos * (2 * cum + cnt + 1)
      cum += cnt
    }
    val npos = sl.map(_._2).sum
    val nneg = sl.length - npos
    val want = (s2 - npos * (npos + 1)).toDouble / (2 * npos * nneg)
    val r = run("q200_classifier_auc").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((npos, nneg)))
    assert(r.getDouble(3) === want)
  }

  test("q201 sweep: confusion identities and monotone tp") {
    val rows = run("q201_pr_sweep").collect()
    val auc = run("q200_classifier_auc").collect().head
    val (npos, nneg) = (auc.getLong(0), auc.getLong(1))
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(3) === npos) // tp + fn
      assert(r.getLong(2) + r.getLong(4) === nneg) // fp + tn
    }
    // raising the threshold never predicts more positives
    val tps = rows.sortBy(_.getLong(0)).map(_.getLong(1)).toSeq
    assert(tps === tps.sorted.reverse)
  }

  test("q202 calibration: doc conservation and rates in range") {
    val rows = run("q202_calibration_bins").collect()
    val total = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(rows.map(_.getLong(1)).sum === total)
    rows.foreach { r =>
      val rate = r.getDouble(4)
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getLong(2) <= r.getLong(1))
      // the bin's mean score lies inside the bin's [lo, hi) bounds
      val bin = r.getInt(0)
      val mean = r.getDouble(3) * 1000.0
      assert(mean >= bin * 500.0 && mean < (bin + 1) * 500.0)
    }
  }

  test("q203 confusion: row shares sum to 1, docs conserve") {
    val rows = run("q203_langid_confusion").collect()
    val total = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(rows.map(_.getLong(2)).sum === total)
    rows.groupBy(_.getString(0)).foreach { case (_, cells) =>
      assert(math.abs(cells.map(_.getDouble(3)).sum - 1.0) < 1e-9)
    }
    val preds = rows.map(_.getString(1)).toSet
    assert(preds.subsetOf(Set("en", "es", "fr", "de", "und")))
  }
}
