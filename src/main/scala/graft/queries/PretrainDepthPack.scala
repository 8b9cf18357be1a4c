package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.catalog.Tables
import graft.functions.Vectors
import graft.queries.TextOps.toks

/** Depth extensions for pretraining-data pipelines (BASELINE.json
  * north-star): embedding compression (int8 scalar quantization — the
  * storage/bandwidth half of IVF+PQ-style ANN), quantized-dot-product
  * search (integer SIMD-shaped scoring), statistical LM quality filtering
  * (the bigram perplexity-proxy filter production corpora are screened
  * with), and link-graph quality weighting (PageRank — the web-crawl
  * document-weighting signal).
  *
  * Parity doctrine notes (see [[QueryPack]]):
  *   - quantization codes round half-up via `floor(x + 0.5)` — Spark and
  *     DuckDB `round()` disagree exactly at .5 (HALF_UP decimal-string vs
  *     binary), `floor` is IEEE-identical in both.
  *   - quantized dot products are BIGINT arithmetic — exact in both
  *     engines, no float tolerance needed anywhere in the ranking.
  *   - LM scores accumulate as exact integer micro-prob units (the q86
  *     integer-cents doctrine applied to probabilities).
  *   - PageRank sums double contributions across neighbors (order
  *     nondeterministic) → final ranks rounded to 6, values O(1).
  */
object PretrainDepthPack extends QueryPack {

  private val nQueries = 20
  private val k = 5
  private val prIters = 3

  // --- int8 scalar quantization -----------------------------------------

  /** Per-vector symmetric int8 quantization: scale = max|x|/127,
    * code_i = floor(x_i/scale + 0.5). The max-abs element maps exactly to
    * ±127, so no code saturates beyond the int8 range by construction.
    */
  private def quantized(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("scale",
        array_max(transform(col("v"), x => abs(x))) / 127.0)
      .withColumn("qv",
        transform(col("v"), x => floor(x / col("scale") + 0.5).cast("int")))

  /** q152 — quantization quality audit: per-vector reconstruction RMSE of
    * the int8 codes and the count of saturated (|code| = 127) dimensions.
    * Pure per-row expression work — no shuffle at all; at 100 TB this is
    * one codegen'd map over the corpus, the cheapest possible shape.
    */
  private def q152(s: SparkSession, dir: String): DataFrame =
    quantized(s, dir)
      .withColumn("dd",
        zip_with(col("v"), col("qv"), (x, q) => x - q * col("scale")))
      .select(col("vec_id"), col("scale"),
        sqrt(Vectors.dot(col("dd"), col("dd")) / size(col("v"))).as("rmse"),
        size(filter(col("qv"), q => abs(q) === 127)).as("n_sat"))
      .orderBy("vec_id")

  /** q153 — ANN top-k over quantized codes: score = int8·int8 dot product
    * (exact BIGINT) rescaled by the two per-vector scales. The shape that
    * makes 100 TB ANN affordable: the corpus streams as 64-byte codes
    * (16× smaller than float64), the query side broadcasts, and the inner
    * loop is integer multiply-add. Ranking ties broken by vec_id.
    */
  private def q153(s: SparkSession, dir: String): DataFrame = {
    val c = quantized(s, dir)
    val q = c.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("qv").as("qqv"),
        col("scale").as("qscale"))
    val scored = c.join(broadcast(q), col("q_id") =!= col("vec_id"))
      .withColumn("idot",
        aggregate(zip_with(col("qqv"), col("qv"),
          (x, y) => x.cast("long") * y), lit(0L), (acc, v) => acc + v))
      .withColumn("score",
        col("idot").cast("double") * col("qscale") * col("scale"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("score"), 6).as("score6"))
      .orderBy("q_id", "rank")
  }

  // --- bigram LM quality filter ------------------------------------------

  /** Corpus-trained bigram-LM scoring (the perplexity-filter shape),
    * shared by q154 and the perplexity-bucketed sampler (q171): train
    * add-one-smoothed bigram probabilities P(w|u) = (c(u,w)+1)/(c(u)+V)
    * on the whole corpus, then score every document by its mean bigram
    * probability — one frame of (doc_id, n_bigrams, units_sum,
    * lm_score). Two corpus aggregations build the model, one join scores
    * the docs — model and scoring both shuffle on the bigram key, so the
    * pipeline is a constant number of passes no matter the corpus size
    * (vs per-doc LM calls).
    *
    * Probabilities enter the per-doc sum as exact integer micro-units
    * (floor(p·1e6 + 0.5)) so accumulation order can't smear the compare.
    * Docs with <2 tokens surface with n_bigrams = 0 (q96 empty-doc
    * doctrine: never let a degenerate doc vanish from the output).
    */
  private def lmScored(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents").select("doc_id", "text")
    val t = toks(col("text"))
    val bigrams = zip_with(
      slice(t, lit(1), greatest(size(t) - 1, lit(0))),
      slice(t, lit(2), greatest(size(t) - 1, lit(0))),
      (a, b) => struct(a.as("u"), b.as("w")))
    val db = d.select(col("doc_id"), explode(bigrams).as("b"))
      .select(col("doc_id"), col("b.u").as("u"), col("b.w").as("w"))
    val cBig = db.groupBy("u", "w").agg(count(lit(1)).as("c_uw"))
    val cUni = cBig.groupBy("u").agg(sum("c_uw").as("c_u"))
    val vocab = d.select(explode(t).as("tok"))
      .agg(countDistinct("tok").as("vsz"))
    val scored = db
      .join(cBig, Seq("u", "w")).join(cUni, Seq("u"))
      .crossJoin(broadcast(vocab))
      .withColumn("p",
        (col("c_uw") + 1).cast("double") /
          (col("c_u") + col("vsz")).cast("double"))
      .withColumn("units",
        floor(col("p") * 1000000.0 + 0.5).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("units").as("units_sum"))
    d.select("doc_id").join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("units_sum"), lit(0L)).as("units_sum"),
        (coalesce(col("units_sum"), lit(0L)).cast("double") /
          greatest(coalesce(col("n_bigrams"), lit(0L)), lit(1L)))
          .as("lm_score"))
  }

  private def q154(s: SparkSession, dir: String): DataFrame =
    lmScored(s, dir).orderBy("doc_id")

  /** q171 — perplexity-bucketed sampling (the CCNet head/middle/tail
    * split): rank documents by the corpus-LM score (q154's exact
    * integer-unit machinery), cut into three equal buckets — best-scored
    * = head — and keep each bucket at its configured rate (head 100%,
    * middle 50%, tail 10%) via the deterministic md5 bucket. Output is
    * the per-bucket retention ledger. The cut is the exact distributed
    * ntile ([[graft.functions.DistRank]] — range shuffle + per-slice
    * rank + P-row offsets, no single-partition window); at 100 TB an
    * approx_percentile score-boundary cut (q114's note) drops the range
    * shuffle too, and the keep decision stays per-row either way.
    */
  private def q171(s: SparkSession, dir: String): DataFrame = {
    val rate = when(col("ppl_bucket") === "head", 1000)
      .when(col("ppl_bucket") === "middle", 500)
      .otherwise(100)
    graft.functions.DistRank.withNtile(lmScored(s, dir),
      "nt", 3, col("lm_score").desc, col("doc_id"))
      .withColumn("ppl_bucket",
        when(col("nt") === 1, "head")
          .when(col("nt") === 2, "middle")
          .otherwise("tail"))
      .withColumn("kept",
        (TrainingPipelinePack.bucket(col("doc_id"), "ppl", 1000) < rate)
          .cast("int"))
      .groupBy("ppl_bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum("kept").cast("long").as("n_kept"),
        sum("n_bigrams").cast("long").as("bigrams_total"),
        sum(col("kept") * col("n_bigrams")).cast("long")
          .as("bigrams_kept"))
      .orderBy("ppl_bucket")
  }

  // --- PageRank over the co-purchase graph --------------------------------

  /** q155 — PageRank (damping 0.85, 3 iterations, ranks normalized to
    * mean≈1) over the part co-purchase graph: parts are linked when they
    * appear in the same order. Edge derivation follows q141's map-side
    * pair expansion (per-order collect_set → in-row pair enumeration) —
    * ONE scan of lineitem and no self-join. Each iteration is one
    * shuffle: contributions r(u)/deg(u) flow along edges and reduce on
    * the destination. The symmetric closure guarantees every node has
    * out-degree ≥ 1 — no dangling-mass correction needed.
    *
    * The graph persists across the 3 iterations in ADJACENCY-ARRAY form
    * (node, neighbor array, degree — n_parts rows, not 2·|E| edge rows):
    * each round broadcasts the node-grain rank vector onto the cached
    * adjacency, emits contributions by exploding the neighbor array
    * map-side, and reduces on the destination — one small shuffle per
    * round, and the per-round probe touches 20 k cached rows instead of
    * 2.4 M (measured ~5 s → ~2.5 s at sf0.1 vs the edge-grain join).
    * Rank vectors are node-grain by construction, hence always
    * broadcastable; the adjacency rows cap at the saturating part
    * vocabulary. For power-law graphs whose hub rows outgrow a single
    * array, the fallback is the flat edge-grain join this replaced.
    * The oracle unrolls the identical rounds as CTEs r1..r3.
    */
  private def q155(s: SparkSession, dir: String): DataFrame = {
    // oriented distinct edge set from the shared co-purchase kernel
    // (graft.functions.CoPurchase: one lineitem scan, map-side expansion)
    val pairs =
      graft.functions.CoPurchase.distinctPairs(Tables.load(s, dir, "lineitem"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edges = pairs.union(
        pairs.select(col("dst").as("src"), col("src").as("dst")))
    val adj = edges.groupBy("src")
      .agg(collect_list(col("dst")).as("nbrs"))
      .select(col("src").as("u"), col("nbrs"), size(col("nbrs")).as("d"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var ranks = adj.select(col("u").as("node"), lit(1.0).as("r"))
    for (_ <- 1 to prIters) {
      ranks = adj.join(broadcast(ranks), col("u") === col("node"))
        .select(explode(col("nbrs")).as("nbr"), (col("r") / col("d")).as("c"))
        .groupBy(col("nbr").as("node"))
        .agg((lit(0.15) + lit(0.85) * sum("c")).as("r"))
    }
    ranks.select(col("node"), round(col("r"), 6).as("pr6"))
      .orderBy("node")
  }

  // --- q208: integer-exact power iteration ---------------------------------

  /** q208 — leading principal direction of the (uncentered) quantized
    * embedding matrix by TWO power-iteration steps of QᵀQ, computed
    * ENTIRELY in integer arithmetic: v₀ = 1⃗, u = Q·v (per-row BIGINT
    * dot), w = Qᵀ·u (per-dimension BIGINT reduce), with a data-adaptive
    * binary downshift between iterations (shift = bitlength(max|w|) − 11,
    * via `length(bin(x))` — integer log2 with no float anywhere) keeping
    * every magnitude far from overflow at any corpus size. Emits the
    * per-dimension integer direction plus the Rayleigh quotient and the
    * v₁→v₂ direction cosine (convergence check) — the first-PC energy
    * audit (centering drift, dominant-axis variance share) a vector-store
    * curator runs before whitening. Scale shape: the corpus is touched
    * twice through one cached code projection (row-grain map work only);
    * everything after lives at DIMENSION grain (64 rows). The scalar
    * moments multiply in decimal(38,0)/HUGEINT (the q205 doctrine) —
    * exact at any n; doubles appear only in the final two ratios.
    * Truncating integer division (`div` / DuckDB `//`) is engine-
    * identical including negatives, so the downshift needs no
    * sign-splitting.
    */
  private def q208(s: SparkSession, dir: String): DataFrame = {
    val codes = quantized(s, dir).select(col("vec_id"), col("qv")).persist()
    def qTu(rows: DataFrame, u: String): DataFrame = rows
      .select(col(u), posexplode(col("qv")).as(Seq("p0", "q")))
      .groupBy((col("p0") + 1).as("pos"))
      .agg(sum(col("q").cast("long") * col(u)).as("w"))
    val w1 = qTu(codes.withColumn("u1",
      aggregate(col("qv"), lit(0L), (acc, x) => acc + x)), "u1")
      .withColumnRenamed("w", "w1")
      .persist()
    val p = w1.agg(greatest(length(bin(max(abs(col("w1"))))) - 11, lit(0))
      .as("s"))
      .select(expr("shiftleft(CAST(1 AS BIGINT), s)").as("p"))
    val v1 = w1.crossJoin(broadcast(p))
      .select(col("pos"), expr("w1 div p").as("v1"))
      .persist()
    val v1arr = v1
      .agg(sort_array(collect_list(struct(col("pos"), col("v1")))).as("sv"))
      .select(transform(col("sv"), e => e.getField("v1")).as("va"))
    val w2 = qTu(codes.crossJoin(broadcast(v1arr))
      .withColumn("u2", aggregate(
        zip_with(col("qv"), col("va"), (x, y) => x.cast("long") * y),
        lit(0L), (acc, x) => acc + x)), "u2")
      .withColumnRenamed("w", "w2")
    def dec(c: Column) = c.cast("decimal(38,0)")
    val joined = v1.join(w2, Seq("pos")).persist()
    val moments = joined.agg(
      sum(dec(col("v1")) * dec(col("w2"))).as("svw"),
      sum(dec(col("v1")) * dec(col("v1"))).as("svv"),
      sum(dec(col("w2")) * dec(col("w2"))).as("sww"))
    joined.crossJoin(broadcast(moments))
      .select(col("pos"), col("v1"), col("w2").as("v2"),
        (col("svw").cast("double") / col("svv").cast("double"))
          .as("rayleigh"),
        (col("svw").cast("double") /
          (sqrt(col("svv").cast("double")) * sqrt(col("sww").cast("double"))))
          .as("convergence_cos"))
      .orderBy("pos")
  }

  override val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q152_quant_error" -> q152 _,
    "q153_quantized_ann" -> q153 _,
    "q154_bigram_lm_quality" -> q154 _,
    "q155_pagerank" -> q155 _,
    "q171_ppl_buckets" -> q171 _,
    "q208_power_iteration" -> q208 _)

  // Shared quantization prefix — generated once so the Spark construction
  // and its oracle twin cannot drift.
  private val duckQuant =
    """e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |s AS (SELECT vec_id, v,
      |  list_max(list_transform(v, x -> abs(x)))
      |   / CAST(127.0 AS DOUBLE) AS scale FROM e),
      |qz AS (SELECT vec_id, v, scale,
      |  list_transform(v,
      |   x -> CAST(floor(x / scale + CAST(0.5 AS DOUBLE)) AS INT)) AS qv
      | FROM s)""".stripMargin

  /** The q154 LM-score CTE chain ending in `lm(doc_id, n_bigrams,
    * units_sum, lm_score)` — shared by q154 and q171 so the scoring
    * definitions cannot drift. */
  private val duckLmPrefix =
    """t AS (
      | SELECT doc_id,
      |  list_filter(string_split(text,' '), x -> x <> '') AS tk
      | FROM documents),
      |bb AS (
      | SELECT doc_id,
      |  unnest(list_transform(range(1, len(tk)), i -> tk[i])) AS u,
      |  unnest(list_transform(range(1, len(tk)), i -> tk[i+1])) AS w
      | FROM t),
      |cb AS (SELECT u, w, count(*) AS c_uw FROM bb GROUP BY 1, 2),
      |cu AS (SELECT u, CAST(sum(c_uw) AS BIGINT) AS c_u
      |       FROM cb GROUP BY 1),
      |vv AS (SELECT count(DISTINCT tok) AS vsz
      |       FROM (SELECT unnest(tk) AS tok FROM t)),
      |sc AS (
      | SELECT bb.doc_id, count(*) AS n_bigrams,
      |  CAST(sum(CAST(floor(
      |    CAST(c_uw + 1 AS DOUBLE) / CAST(c_u + vsz AS DOUBLE)
      |    * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
      |   AS BIGINT)) AS BIGINT) AS units_sum
      | FROM bb JOIN cb USING (u, w) JOIN cu USING (u) CROSS JOIN vv
      | GROUP BY 1),
      |lm AS (
      | SELECT d.doc_id,
      |  CAST(COALESCE(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
      |  COALESCE(sc.units_sum, 0) AS units_sum,
      |  CAST(COALESCE(sc.units_sum, 0) AS DOUBLE)
      |   / greatest(COALESCE(sc.n_bigrams, 0), 1) AS lm_score
      | FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id)""".stripMargin

  private def duckPrRound(r: Int): String =
    s"""r$r AS (
       | SELECT e.dst AS node,
       |  CAST(0.15 AS DOUBLE) + CAST(0.85 AS DOUBLE) *
       |   sum(p.r / deg.d) AS r
       | FROM edges e
       | JOIN r${r - 1} p ON e.src = p.node
       | JOIN deg ON deg.src = e.src
       | GROUP BY e.dst)"""

  override val oracle: Seq[(String, String)] = Seq(
    "q152_quant_error" ->
      s"""WITH $duckQuant,
         |d AS (SELECT vec_id, scale, qv,
         |  list_transform(generate_series(1, len(v)),
         |                 i -> v[i] - qv[i] * scale) AS dd,
         |  len(v) AS n FROM qz)
         |SELECT vec_id, scale,
         | sqrt(list_dot_product(dd, dd) / n) AS rmse,
         | CAST(len(list_filter(qv, x -> abs(x) = 127)) AS INT) AS n_sat
         |FROM d ORDER BY vec_id""".stripMargin,
    "q153_quantized_ann" ->
      s"""WITH $duckQuant,
         |q AS (SELECT vec_id AS q_id, qv AS qqv, scale AS qscale
         |      FROM qz WHERE vec_id < $nQueries),
         |scored AS (
         | SELECT q.q_id, c.vec_id,
         |  CAST(list_sum(list_transform(generate_series(1, len(q.qqv)),
         |       i -> CAST(q.qqv[i] AS BIGINT) * c.qv[i])) AS BIGINT) AS idot,
         |  q.qscale, c.scale
         | FROM q JOIN qz c ON q.q_id <> c.vec_id),
         |ranked AS (
         | SELECT q_id, vec_id,
         |  CAST(idot AS DOUBLE) * qscale * scale AS score,
         |  row_number() OVER (PARTITION BY q_id
         |   ORDER BY CAST(idot AS DOUBLE) * qscale * scale DESC, vec_id)
         |   AS rank
         | FROM scored)
         |SELECT q_id, CAST(rank AS INT) AS rank, vec_id AS neighbor_id,
         | round(score, 6) AS score6
         |FROM ranked WHERE rank <= $k ORDER BY q_id, rank""".stripMargin,
    "q154_bigram_lm_quality" ->
      s"""WITH $duckLmPrefix
         |SELECT doc_id, n_bigrams, units_sum, lm_score FROM lm
         |ORDER BY doc_id""".stripMargin,
    "q171_ppl_buckets" ->
      s"""WITH $duckLmPrefix,
         |nt AS (
         | SELECT doc_id, n_bigrams,
         |  ntile(3) OVER (ORDER BY lm_score DESC, doc_id) AS nt
         | FROM lm),
         |bkt AS (
         | SELECT n_bigrams,
         |  CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
         |          ELSE 'tail' END AS ppl_bucket,
         |  CASE WHEN ${TrainingPipelinePack.duckBucket("doc_id", "ppl", 1000)}
         |        < CASE nt WHEN 1 THEN 1000 WHEN 2 THEN 500 ELSE 100 END
         |       THEN 1 ELSE 0 END AS kept
         | FROM nt)
         |SELECT ppl_bucket, CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(sum(kept) AS BIGINT) AS n_kept,
         | CAST(sum(n_bigrams) AS BIGINT) AS bigrams_total,
         | CAST(sum(kept * n_bigrams) AS BIGINT) AS bigrams_kept
         |FROM bkt GROUP BY 1 ORDER BY 1""".stripMargin,
    "q155_pagerank" ->
      s"""WITH items AS (
         | SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |pairs AS (
         | SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
         | FROM items a JOIN items b
         |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         |edges AS (
         | SELECT src, dst FROM pairs
         | UNION ALL SELECT dst, src FROM pairs),
         |deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
         |r0 AS (SELECT src AS node, CAST(1.0 AS DOUBLE) AS r FROM deg),
         |${(1 to prIters).map(duckPrRound).mkString(",\n")}
         |SELECT node, round(r, 6) AS pr6 FROM r$prIters
         |ORDER BY node""".stripMargin,
    "q208_power_iteration" ->
      s"""WITH $duckQuant,
         |c AS (SELECT vec_id, qv FROM qz),
         |r1 AS (SELECT qv,
         |  CAST(list_sum(list_transform(qv, x -> CAST(x AS BIGINT)))
         |    AS BIGINT) AS u1 FROM c),
         |x1 AS (SELECT u1, unnest(qv) AS q,
         |        unnest(generate_series(1, len(qv))) AS pos FROM r1),
         |d1w AS (SELECT pos, CAST(sum(CAST(q AS BIGINT) * u1) AS BIGINT)
         |         AS w1 FROM x1 GROUP BY pos),
         |sh AS (SELECT greatest(length(bin(max(abs(w1)))) - 11, 0) AS s
         |       FROM d1w),
         |pp AS (SELECT CAST(1 AS BIGINT) << s AS p FROM sh),
         |d1 AS (SELECT pos, w1 // p AS v1 FROM d1w, pp),
         |va AS (SELECT list_transform(list_sort(list({'pos': pos,
         |        'v': v1})), e -> e.v) AS va FROM d1),
         |r2 AS (SELECT qv,
         |  CAST(list_sum(list_transform(range(1, len(qv) + 1),
         |    i -> CAST(qv[i] AS BIGINT) * va[i])) AS BIGINT) AS u2
         | FROM c, va),
         |x2 AS (SELECT u2, unnest(qv) AS q,
         |        unnest(generate_series(1, len(qv))) AS pos FROM r2),
         |d2 AS (SELECT pos, CAST(sum(CAST(q AS BIGINT) * u2) AS BIGINT)
         |        AS w2 FROM x2 GROUP BY pos),
         |j AS (SELECT pos, v1, w2 FROM d1 JOIN d2 USING (pos)),
         |m AS (SELECT sum(CAST(v1 AS HUGEINT) * w2) AS svw,
         |       sum(CAST(v1 AS HUGEINT) * v1) AS svv,
         |       sum(CAST(w2 AS HUGEINT) * w2) AS sww FROM j)
         |SELECT pos, v1, w2 AS v2,
         | CAST(svw AS DOUBLE) / CAST(svv AS DOUBLE) AS rayleigh,
         | CAST(svw AS DOUBLE)
         |  / (sqrt(CAST(svv AS DOUBLE)) * sqrt(CAST(sww AS DOUBLE)))
         |    AS convergence_cos
         |FROM j, m ORDER BY pos""".stripMargin)
}
