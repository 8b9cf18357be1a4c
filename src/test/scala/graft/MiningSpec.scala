package graft

/** MiningPack checks: full JVM recomputes — a scratch PMI tabulation
  * against q258's vocabulary-grain pipeline, and a BigInt Cramer solve
  * against q259's decimal determinant algebra.
  */
class MiningSpec extends SparkSpecBase {

  private val sf0001 = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf0001)

  private def docToks(): Array[(Long, Array[String])] =
    spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).split(" ").filter(_.nonEmpty)))

  test("q258: PMI ratios equal the scratch tabulation, ordered, support-gated") {
    val bigrams = docToks().flatMap { case (_, t) =>
      t.zip(t.drop(1))
    }
    val c12 = bigrams.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val c1 = bigrams.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val c2 = bigrams.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val n = bigrams.length.toLong
    val expected = c12.toSeq.filter(_._2 >= 5).map { case ((w1, w2), c) =>
      (w1, w2, c, c1(w1), c2(w2), n, c * n * 1000000L / (c1(w1) * c2(w2)))
    }.sortBy { case (w1, w2, _, _, _, _, pmi) => (-pmi, w1, w2) }.take(50)
    val got = run("q258_pmi_collocations").collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got === expected)
    // sanity: the gate actually bites and the ratio orders the output
    assert(got.nonEmpty && got.forall(_._3 >= 5))
    assert(got.map(_._7).sliding(2).forall(p => p.head >= p.last))
  }

  test("q259: coefficients equal a BigInt Cramer solve; R2 in (0, 1]") {
    val feats = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("n_chars", "text").collect().map { r =>
        val t = r.getString(1).split(" ").filter(_.nonEmpty)
        (BigInt(r.getLong(0)), BigInt(t.distinct.length), BigInt(t.length))
      }
    val n = BigInt(feats.length)
    val s1 = feats.map(_._1).sum; val s2 = feats.map(_._2).sum
    val sy = feats.map(_._3).sum
    val s11 = feats.map(f => f._1 * f._1).sum
    val s12 = feats.map(f => f._1 * f._2).sum
    val s22 = feats.map(f => f._2 * f._2).sum
    val s1y = feats.map(f => f._1 * f._3).sum
    val s2y = feats.map(f => f._2 * f._3).sum
    val syy = feats.map(f => f._3 * f._3).sum
    def det3(a: BigInt, b: BigInt, c: BigInt, p: BigInt, q: BigInt,
             r: BigInt, u: BigInt, v: BigInt, w: BigInt): BigInt =
      a * (q * w - r * v) - b * (p * w - r * u) + c * (p * v - q * u)
    val det = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    val det0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)
    val det1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22)
    val det2 = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y)
    assert(det != BigInt(0))
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = run("q259_linear_probe").collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getLong(0) === feats.length.toLong)
    assert(row.getDouble(1) === r6(det0.toDouble / det.toDouble))
    assert(row.getDouble(2) === r6(det1.toDouble / det.toDouble))
    assert(row.getDouble(3) === r6(det2.toDouble / det.toDouble))
    val sse = (det * syy - det0 * sy - det1 * s1y - det2 * s2y).toDouble /
      det.toDouble
    val sst = (n * syy - sy * sy).toDouble / n.toDouble
    assert(row.getDouble(4) === r6(1.0 - sse / sst))
    assert(row.getDouble(4) > 0.0 && row.getDouble(4) <= 1.0)
    // OLS residual identity: SSE ≥ 0 ⇒ the solve actually minimized
    assert(sse >= 0.0 && sse <= sst)
  }

  test("q281: per-source probes equal independent BigInt Cramer solves") {
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val feats = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("source", "n_chars", "text").collect().map { r =>
        val t = r.getString(2).split(" ").filter(_.nonEmpty)
        (r.getString(0), BigInt(r.getLong(1)),
          BigInt(t.distinct.length), BigInt(t.length))
      }
    def det3(a: BigInt, b: BigInt, c: BigInt, p: BigInt, q: BigInt,
             r: BigInt, u: BigInt, v: BigInt, w: BigInt): BigInt =
      a * (q * w - r * v) - b * (p * w - r * u) + c * (p * v - q * u)
    val expected = feats.groupBy(_._1).toSeq.map { case (src, rows) =>
      val n = BigInt(rows.length)
      val s1 = rows.map(_._2).sum; val s2 = rows.map(_._3).sum
      val sy = rows.map(_._4).sum
      val s11 = rows.map(f => f._2 * f._2).sum
      val s12 = rows.map(f => f._2 * f._3).sum
      val s22 = rows.map(f => f._3 * f._3).sum
      val s1y = rows.map(f => f._2 * f._4).sum
      val s2y = rows.map(f => f._3 * f._4).sum
      val syy = rows.map(f => f._4 * f._4).sum
      val det = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
      val det0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)
      val det1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22)
      val det2 = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y)
      assert(det != BigInt(0), src)
      val sse = (det * syy - det0 * sy - det1 * s1y - det2 * s2y).toDouble /
        det.toDouble
      val sst = (n * syy - sy * sy).toDouble / n.toDouble
      (src, rows.length.toLong, r6(det0.toDouble / det.toDouble),
        r6(det1.toDouble / det.toDouble), r6(det2.toDouble / det.toDouble),
        r6(1.0 - sse / sst))
    }.sortBy(_._1)
    val got = run("q281_grouped_probes").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got === expected)
  }

  test("q282: Heaps checkpoints equal the sequential first-occurrence scan") {
    val docs = docToks().sortBy(_._1)
    val n = docs.length
    def bkt(id: Long): Long = math.min(id * 20 / n, 19L)
    val seen = scala.collection.mutable.Set.empty[String]
    case class Acc(var docs: Long = 0, var sh: Long = 0, var novel: Long = 0)
    val per = scala.collection.mutable.Map.empty[Long, Acc]
    docs.foreach { case (id, t) =>
      val a = per.getOrElseUpdate(bkt(id), Acc())
      a.docs += 1
      t.sliding(3).filter(_.length == 3).foreach { w =>
        val s3 = w.mkString(" ")
        a.sh += 1
        if (seen.add(s3)) a.novel += 1
      }
    }
    var (dc, sc, vc) = (0L, 0L, 0L)
    val expected = per.toSeq.sortBy(_._1).map { case (b, a) =>
      dc += a.docs; sc += a.sh; vc += a.novel
      (b, dc, sc, vc, a.novel, vc * 1000000L / sc)
    }
    val got = run("q282_vocab_growth").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === expected)
    // the curve actually grows across checkpoints (shingles don't saturate)
    assert(got.last._4 > got.head._4)
    // TTR declines as the corpus grows (Heaps sublinearity)
    assert(got.head._6 >= got.last._6)
  }

  test("q260: SRP-LSH recovers the planted high-cosine twins, nothing else") {
    val got = run("q260_srp_lsh_dup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val planted = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .selectExpr("vec_id").collect().map(_.getLong(0))
      .filter(_ % 25 == 0).toSet
    // every emitted pair is (original, its twin) at near-unit cosine
    got.foreach { case (a, b, h, c) =>
      assert(planted.contains(a) && b == a + 1000000L,
        s"non-planted pair ($a, $b) survived the tau=0.95 verify")
      assert(h >= 0 && h <= 2)
      assert(c > 0.99 && c <= 1.0)
    }
    // the hamming-2 ball over 16 SRP bits must catch nearly all twins:
    // a miss needs >= 3 of 16 plane dots within the tiny quantization
    // perturbation of zero
    assert(got.length >= math.max(1, (planted.size * 8) / 10),
      s"recall too low: ${got.length}/${planted.size}")
  }

  test("q261: bucketed as-of join equals the naive per-purchase scan") {
    val tol = 604800000000L
    val ev = graft.catalog.Tables.load(spark, sf0001, "events")
      .selectExpr("event_id", "user_id", "event_type", "ts div 1000 AS us")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val views = ev.filter(_._3 == "view")
    val expected = ev.filter(_._3 == "purchase").map { p =>
      val cand = views.filter(v => v._2 == p._2 &&
        v._4 <= p._4 && v._4 >= p._4 - tol)
      val best = if (cand.isEmpty) None
        else Some(cand.maxBy(v => (v._4, v._1)))
      (p._1, p._2, p._4, best.map(_._1), best.map(_._4),
        best.map(p._4 - _._4))
    }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("q261_asof_join")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSeq
    assert(got === expected)
    // the tolerance actually bites: some purchase has a view outside it
    assert(got.exists(_._4.isEmpty) || got.forall(_._6.forall(_ <= tol)))
  }

  test("q264: three attribution models equal the naive JVM credit fold") {
    val tol = 604800000000L
    val ev = graft.catalog.Tables.load(spark, sf0001, "events")
      .selectExpr("event_id", "user_id", "event_type", "ts div 1000 AS us",
        "CAST(round(value * 100) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    val touches = ev.filter(e => e._3 == "view" || e._3 == "click")
    case class Acc(var fc: Long = 0, var nf: Long = 0, var lc: Long = 0,
      var nl: Long = 0, var lin: Long = 0)
    val acc = scala.collection.mutable.Map[String, Acc]()
    ev.filter(_._3 == "purchase").foreach { p =>
      val cand = touches.filter(t => t._2 == p._2 &&
        t._4 <= p._4 && t._4 >= p._4 - tol)
      if (cand.nonEmpty) {
        val first = cand.minBy(t => (t._4, t._1))
        val last = cand.maxBy(t => (t._4, t._1))
        val f = acc.getOrElseUpdate(first._3, Acc())
        f.fc += p._5; f.nf += 1
        val l = acc.getOrElseUpdate(last._3, Acc())
        l.lc += p._5; l.nl += 1
        cand.groupBy(_._3).foreach { case (touch, ts) =>
          acc.getOrElseUpdate(touch, Acc()).lin +=
            p._5 * 1000000L * ts.length / cand.length
        }
      }
    }
    val got = run("q264_multitouch_attribution").collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet === acc.keySet)
    acc.foreach { case (touch, a) =>
      assert(got(touch) === ((a.fc, a.nf, a.lc, a.nl, a.lin)), touch)
    }
    // conservation: first- and last-touch credit totals both equal the
    // attributable purchase revenue
    assert(got.values.map(_._1).sum === got.values.map(_._3).sum)
    assert(got.values.map(_._2).sum === got.values.map(_._4).sum)
  }

  test("q265: conformal interval equals the BigInt order-statistic recompute") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): Long = {
      val hex = md.digest(s"conformal|$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 10
    }
    val feats = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("doc_id", "n_chars", "text").collect().map { r =>
        val t = r.getString(2).split(" ").filter(_.nonEmpty)
        (r.getLong(0), BigInt(r.getLong(1)), BigInt(t.distinct.length),
          BigInt(t.length), bucket(r.getLong(0)))
      }
    val train = feats.filter(_._5 < 7)
    val n = BigInt(train.length)
    val s1 = train.map(_._2).sum; val s2 = train.map(_._3).sum
    val sy = train.map(_._4).sum
    val s11 = train.map(f => f._2 * f._2).sum
    val s12 = train.map(f => f._2 * f._3).sum
    val s22 = train.map(f => f._3 * f._3).sum
    val s1y = train.map(f => f._2 * f._4).sum
    val s2y = train.map(f => f._3 * f._4).sum
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val det0 = sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
      s2 * (s1y * s12 - s11 * s2y)
    val det1 = n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)
    val det2 = n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
      sy * (s1 * s12 - s11 * s2)
    def rMilli(f: (Long, BigInt, BigInt, BigInt, Long)): Long =
      ((det * f._4 - (det0 + det1 * f._2 + det2 * f._3)).abs * 1000 /
        det.abs).toLong
    val cal = feats.filter(f => f._5 >= 7 && f._5 < 9)
      .map(f => (rMilli(f), f._1)).sorted
    val k = math.min((9L * (cal.length + 1) + 9) / 10, cal.length.toLong)
    val qhat = cal(k.toInt - 1)._1
    val test = feats.filter(_._5 >= 9).map(rMilli)
    val coverage = test.count(_ <= qhat).toDouble / test.length
    val row = run("q265_conformal_interval").collect()
    assert(row.length === 1)
    val r = row.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getDouble(5)) ===
      ((train.length.toLong, cal.length.toLong, test.length.toLong,
        k, qhat, coverage)))
    // the conformal guarantee direction: coverage near or above 0.9 on a
    // finite test fold (loose band — small-sample noise)
    assert(coverage > 0.75 && coverage <= 1.0)
  }

  test("q266: RBO equals the JVM two-ranking fold with exact rational weights") {
    val docs = docToks()
    val nDocs = docs.length
    val tf = docs.flatMap { case (id, t) =>
      t.groupBy(identity).map { case (w, o) => (id, w, o.length.toLong) }
    }
    val df = tf.groupBy(_._2).map { case (w, v) => w -> v.length }
    def rank(score: Map[(Long, Long), Double]): Map[Long, Seq[Long]] =
      score.groupBy(_._1._1).map { case (q, m) =>
        q -> m.toSeq.map { case ((_, doc), sc) => (doc, sc) }
          .sortBy { case (doc, sc) => (-sc, doc) }.take(5).map(_._1)
      }
    val byDoc = tf.groupBy(_._1)
    def overlapScores(useIdf: Boolean): Map[(Long, Long), Double] = {
      val w: Map[(Long, String), Double] = tf.map { case (id, word, cnt) =>
        val weight = if (useIdf)
          cnt * math.log(nDocs.toDouble / df(word)) else cnt.toDouble
        (id, word) -> weight
      }.toMap
      val byWord = tf.groupBy(_._2)
      val prods: Seq[((Long, Long), Double)] = for {
        q <- (0L until 5L).toSeq
        qe <- byDoc(q).toSeq
        de <- byWord(qe._2).toSeq if de._1 != q
      } yield ((q, de._1), w((q, qe._2)) * w((de._1, qe._2)))
      prods.groupBy(_._1).map { case (k, v) =>
        val s = v.map(_._2).sum
        k -> (if (useIdf)
          BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        else s)
      }
    }
    val r1 = rank(overlapScores(useIdf = true))
    val r2 = rank(overlapScores(useIdf = false))
    val p9 = Array(1L, 9L, 81L, 729L, 6561L)
    val p10 = Array(1L, 10L, 100L, 1000L, 10000L)
    val expected = r1.keys.toSeq.sorted.map { q =>
      val terms = (1 to 5).map { dd =>
        val ov = (r1(q).take(dd).toSet intersect r2(q).take(dd).toSet).size
        (ov.toLong, 1000000L * p9(dd - 1) * ov / (p10(dd - 1) * dd),
          1000000L * p9(dd - 1) * dd / (p10(dd - 1) * dd))
      }
      val rbo = terms.map(_._2).sum; val perfect = terms.map(_._3).sum
      (q, rbo, perfect, terms.last._1, rbo.toDouble / perfect)
    }
    val got = run("q266_rbo_rank_overlap").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got === expected)
    assert(got.forall(r => r._2 <= r._3))
  }

  test("q269: windowed code-switch stats equal the JVM lexicon replay") {
    val lex = Seq(
      "en" -> Set("the", "a", "of", "and", "to", "in", "is"),
      "es" -> Set("el", "la", "de", "que", "y", "los", "es"),
      "fr" -> Set("le", "la", "de", "et", "les", "des", "est"),
      "de" -> Set("der", "die", "und", "das", "ist", "von", "ein"))
    val expected = docToks().map { case (id, t) =>
      val preds = t.grouped(20).map { w =>
        val dw = w.distinct.toSet
        val hits = lex.map { case (l, ws) => l -> (dw intersect ws).size }
        val best = hits.map(_._2).max
        if (best == 0) "und"
        else hits.find(_._2 == best).get._1 // first in lexicon order wins
      }.toSeq
      val switches = preds.zip(preds.drop(1)).count(p => p._1 != p._2)
      (id, preds.length, preds.distinct.length, switches,
        if (switches > 0) 1 else 0)
    }.sortBy(_._1).toSeq
    val got = run("q269_code_switch").collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4))).toSeq
    assert(got === expected)
  }

  test("q272: V-shape runs equal the JVM pattern scan") {
    val daily = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("o_orderpriority", "CAST(o_orderdate AS DATE) AS d")
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate))
      .groupBy(identity).map { case ((p, d), v) => (p, d, v.size.toLong) }
      .toSeq
    val expected = daily.groupBy(_._1).map { case (p, rows) =>
      val series = rows.sortBy(_._2.toEpochDay).map(_._3)
      val sgns = series.zip(series.drop(1)).map { case (a, b) =>
        if (b > a) 1 else if (b < a) -1 else 0
      }
      // collapse to runs, then scan for DOWN+ UP+ adjacencies
      val runs = sgns.foldLeft(List.empty[(Int, Long)]) { (acc, s) =>
        acc match {
          case (hs, hl) :: t if hs == s => (hs, hl + 1) :: t
          case _ => (s, 1L) :: acc
        }
      }.reverse
      val vs = runs.zip(runs.drop(1)).filter(p => p._1._1 == -1 && p._2._1 == 1)
      (p, runs.count(_._1 == -1).toLong,
        runs.filter(_._1 == -1).map(_._2).sorted.lastOption,
        vs.length.toLong, vs.map(_._1._2).sorted.lastOption)
    }.toSeq.sortBy(_._1)
    val got = run("q272_vshape_patterns").collect().map(r =>
      (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
    assert(got === expected)
    // every V is a down-run: V count never exceeds down-run count
    assert(got.forall(r => r._4 <= r._2))
  }

  test("q274: Benford digits equal the JVM tabulation; shares conserve") {
    val cents = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("CAST(round(o_totalprice * 100) AS BIGINT)")
      .collect().map(_.getLong(0)).filter(_ > 0)
    val counts = cents.map(_.toString.head.asDigit)
      .groupBy(identity).map { case (d, v) => d -> v.length.toLong }
    val exp = Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L,
      57992L, 51153L, 45757L)
    val got = SparkEntry.queries("q274_benford_audit")(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.map(g => g._1 -> g._2).toMap === counts)
    got.foreach { case (d, n, sm, em, dev, sh) =>
      assert(sm === n * 1000000L / cents.length)
      assert(em === exp(d - 1))
      assert(dev === math.abs(sm - em))
      assert(sh === n.toDouble / cents.length)
    }
    assert(got.map(_._2).sum === cents.length.toLong)
  }

  test("q275: per-nation Gini equals the JVM Lorenz identity") {
    val spend = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("o_custkey", "CAST(round(o_totalprice * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
      .selectExpr("c_custkey", "CAST(c_nationkey AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = cust.groupBy(_._2).map { case (nation, cs) =>
      val xs = cs.map(c => (spend.getOrElse(c._1, 0L), c._1))
        .sortBy(identity).map(_._1)
      val n = xs.length.toLong
      val tot = xs.sum
      val six = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      (nation, n, tot,
        2.0 * six / (n * tot) - (n + 1).toDouble / n)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q275_gini_concentration")(spark, sf0001)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === expected)
    // Gini lives in [0, 1) up to the small-n finite-sample correction
    assert(got.forall(g => g._4 >= -0.05 && g._4 < 1.0))
  }

  test("q277: 60-bit SimHash signatures and pairs equal the JVM recompute") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def sig(tokens: Array[String]): Long = {
      val votes = new Array[Int](60)
      tokens.foreach { t =>
        val hex = md.digest(t.getBytes("UTF-8")).map(b => f"$b%02x").mkString
        (0 until 60).foreach { j =>
          val nib = Integer.parseInt(hex.substring(j / 4, j / 4 + 1), 16)
          votes(j) += ((nib >> (j % 4)) & 1) * 2 - 1
        }
      }
      (0 until 60).map(j => if (votes(j) > 0) 1L << j else 0L).sum
    }
    // q277 signs over DISTINCT tokens (DedupPack.docToks applies
    // array_distinct — the shingle-set grain every dedup query shares)
    val sigs = docToks().map { case (id, t) => (id, sig(t.distinct)) }
    val expected = (for {
      a <- sigs; b <- sigs
      if a._1 < b._1 && java.lang.Long.bitCount(a._2 ^ b._2) <= 3
    } yield (a._1, b._1,
      java.lang.Long.bitCount(a._2 ^ b._2))).sortBy(p => (p._1, p._2)).toSeq
    val got = run("q277_simhash64_rule").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got === expected)
  }

  test("q273: QTE deciles equal the JVM per-arm rank selection") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def arm(id: Long): String = {
      val hex = md.digest(s"ab|$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(8)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) "A" else "B"
    }
    val spend = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("o_custkey", "CAST(round(o_totalprice * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val perArm = spark.read.parquet(s"$sf0001/customer.parquet")
      .selectExpr("c_custkey").collect().map(_.getLong(0))
      .map(ck => (arm(ck), spend.getOrElse(ck, 0L), ck))
      .groupBy(_._1)
    def deciles(a: String): Map[Int, Long] = {
      val xs = perArm(a).sortBy(c => (c._2, c._3)).map(_._2)
      (1 to 10).map(d =>
        d -> xs(math.ceil(d * xs.length / 10.0).toInt - 1)).toMap
    }
    val (da, db) = (deciles("A"), deciles("B"))
    val got = SparkEntry.queries("q273_qte_deciles")(spark, sf0001)
      .collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === (1 to 10).map(d =>
      (d, da(d), db(d), da(d) - db(d))))
  }
}
