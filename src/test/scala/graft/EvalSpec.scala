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

  test("q204 gains: 10 checkpoints, monotone capture, terminal row exact") {
    val rows = run("q204_cumulative_gains").collect()
    assert(rows.map(_.getInt(0)).toSeq === (1 to 10))
    val caps = rows.map(_.getDouble(3)).toSeq
    assert(caps === caps.sorted)
    // the k=10 checkpoint covers the whole corpus: capture and lift are
    // EXACTLY 1.0 (identical division of equal integers in both engines)
    assert(rows.last.getDouble(3) === 1.0)
    assert(rows.last.getDouble(4) === 1.0)
    // checkpoints bracket their decile: 10·cum_docs ≥ k·n
    val total = spark.read.parquet(s"$sf0001/documents.parquet").count()
    rows.foreach(r => assert(10 * r.getLong(1) >= r.getInt(0) * total))
  }

  test("q205 Spearman: JVM midrank recompute agrees exactly") {
    val pairs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(graft.queries.TrainingPipelinePack
        .classifierScore(org.apache.spark.sql.functions.col("text"))
        .as("score"), org.apache.spark.sql.functions.col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def rank2(vs: Seq[Long]): Map[Long, Long] = {
      var cum = 0L
      vs.groupBy(identity).toSeq.sortBy(_._1).map { case (v, g) =>
        val r = v -> (2 * cum + g.length + 1)
        cum += g.length
        r
      }.toMap
    }
    val rx = rank2(pairs.map(_._1).toSeq)
    val ry = rank2(pairs.map(_._2).toSeq)
    val n = BigInt(pairs.length)
    val xs = pairs.map(p => BigInt(rx(p._1)))
    val ys = pairs.map(p => BigInt(ry(p._2)))
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(x => x * x).sum
    val syy = ys.map(y => y * y).sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val want = (n * sxy - sx * sy).toDouble /
      math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble)
    val r = run("q205_spearman_len").collect().head
    assert(r.getLong(0) === pairs.length.toLong)
    assert(r.getDouble(1) === want)
  }

  test("q206 chi2: cell identities and JVM total recompute") {
    val rows = run("q206_chi2_source").collect()
    val total = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(rows.map(_.getLong(2)).sum === total)
    rows.foreach { r =>
      assert(r.getDouble(4) >= 0.0) // (o-e)²/e
      // e reconstructs from the cell grid itself
      val (src, lbl) = (r.getString(0), r.getLong(1))
      val rowTot = rows.filter(_.getString(0) == src).map(_.getLong(2)).sum
      val colTot = rows.filter(_.getLong(1) == lbl).map(_.getLong(2)).sum
      assert(r.getDouble(3) === rowTot.toDouble * colTot / total)
    }
    val chi2 = rows.map(_.getDouble(4)).sum
    assert(math.abs(rows.head.getDouble(5) - chi2) < 1e-5)
  }

  test("q207 target encoding: shrinkage toward the global prior") {
    val rows = run("q207_target_encoding").collect()
    val n = rows.map(_.getLong(1)).sum
    val pos = rows.map(_.getLong(2)).sum
    val prior = pos.toDouble / n
    rows.foreach { r =>
      val (raw, enc) = (r.getDouble(3), r.getDouble(4))
      val (lo, hi) = (math.min(raw, prior), math.max(raw, prior))
      assert(enc >= lo - 1e-12 && enc <= hi + 1e-12)
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

  test("q262: minimax isotonic fit equals the classic PAVA stack, quantized") {
    // q202 and q262 share the bin grain — recompute PAVA from q202's bins
    val bins = run("q202_calibration_bins").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // classic weighted pool-adjacent-violators over (n_docs, n_pos)
    val blocks = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    bins.foreach { case (_, w, p) =>
      blocks += ((w, p, 1))
      while (blocks.length >= 2 && {
        val a = blocks(blocks.length - 2); val b = blocks.last
        // rate(a) > rate(b) ⇔ p_a·w_b > p_b·w_a (exact cross-product)
        a._2 * b._1 > b._2 * a._1
      }) {
        val b = blocks.remove(blocks.length - 1)
        val a = blocks.remove(blocks.length - 1)
        blocks += ((a._1 + b._1, a._2 + b._2, a._3 + b._3))
      }
    }
    val expected = blocks.flatMap { case (w, p, nb) =>
      Seq.fill(nb)(p * 1000000L / w)
    }
    val got = run("q262_isotonic_calibration").collect()
      .sortBy(_.getInt(0)).map(_.getLong(4)).toSeq
    assert(got === expected.toSeq)
    // monotone by construction, and each fit is a valid micro-rate
    assert(got.sliding(2).forall(p => p.length < 2 || p.head <= p.last))
    assert(got.forall(v => v >= 0L && v <= 1000000L))
  }

  test("q263: out-of-fold encoding equals the JVM complement fold") {
    import org.apache.spark.sql.functions._
    val perDoc = graft.catalog.Tables.load(spark, sf0001, "documents")
      .select(col("source"),
        graft.queries.TrainingPipelinePack.bucket(col("doc_id"), "oof", 5)
          .as("fold"),
        when(graft.queries.CorpusOpsPack.reasonOf(
          graft.queries.TextOps.toks(col("text"))) === "pass", 1L)
          .otherwise(0L).as("label"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val cells = perDoc.groupBy(d => (d._1, d._2))
      .map { case (k, v) => (k._1, k._2, v.length.toLong, v.map(_._3).sum) }
    val byS = cells.groupBy(_._1).map { case (s, v) =>
      s -> (v.map(_._3).sum, v.map(_._4).sum) }
    val byF = cells.groupBy(_._2).map { case (f, v) =>
      f -> (v.map(_._3).sum, v.map(_._4).sum) }
    val n = cells.map(_._3).sum; val pos = cells.map(_._4).sum
    val expected = cells.map { case (s, f, nSf, posSf) =>
      val (nS, posS) = byS(s); val (nF, posF) = byF(f)
      val enc = (posS - posSf + 20L *
        ((pos - posF).toDouble / (n - nF))) / (nS - nSf + 20L).toDouble
      (s, f, nSf, posSf, enc)
    }.toSeq.sortBy(c => (c._1, c._2))
    val got = run("q263_oof_target_encoding").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got === expected)
    // leakage direction sanity: an all-pass cell's own labels are excluded,
    // so its encoding can sit strictly below 1 even when the cell is pure
    assert(got.forall(c => c._5 > 0.0 && c._5 < 1.0))
  }

  test("q278: stump algebra is exact; split beats the parent impurity") {
    val r = run("q278_decision_stump").collect()
    assert(r.length === 1)
    val row = r.head
    val (nL, posL, nR) = (row.getLong(1), row.getLong(2), row.getLong(3))
    // totals from q200 — the same grain lineage
    val aucRow = run("q200_classifier_auc").collect().head
    val nPos = aucRow.getLong(0)
    val n = nPos + aucRow.getLong(1)
    assert(nL + nR === n)
    def gini(p: Long, m: Long): Long =
      1000000L - (p * p + (m - p) * (m - p)) * 1000000L / (m * m)
    assert(row.getLong(4) === gini(posL, nL))
    assert(row.getLong(5) === gini(nPos - posL, nR))
    val wimp = (nL * row.getLong(4) + nR * row.getLong(5)) / n
    assert(row.getLong(6) === wimp)
    assert(row.getLong(7) === gini(nPos, n))
    assert(row.getLong(8) === row.getLong(7) - wimp)
    // weighted Gini never exceeds the parent (concavity), up to the ±2
    // micro truncation slack of the quantized contract
    assert(row.getLong(8) >= -2L)
    assert(nL > 0 && nR > 0)
  }
}
