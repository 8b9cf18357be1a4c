package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented capability (one entry per
  * SURVEY.md §2 operator row or §7 extension); `oracleSql` carries the
  * DuckDB twin for each SQL-expressible entry. Column names and ordering
  * are aligned pack-side (see [[graft.queries.QueryPack]] determinism
  * contract).
  */
object SparkEntry {
  private val packs: Seq[QueryPack] =
    Seq(RelationalCore, JoinsAggs, WindowsPack,
      TextPack, DedupPack, SimilarityPack, JsonPack, MedallionPack,
      MultimodalStreamPack, ApproxPack, LakehousePack,
      TrainingPipelinePack, TpchShapesPack, DataQualityPack, ReportingPack,
      PretrainDepthPack, CorpusOpsPack, GraphPack, ExperimentsPack,
      EvalPack, SketchPack, ClassicOpsPack, RobustOpsPack, SelectionPack,
      ScaleOpsPack, OlistSurfacePack, ResolutionPack, RangeOpsPack,
      MiningPack)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's headline analytics shape: revenue-by-category top-10
    * (reference README.md:393-402) as broadcast join + partial agg + top-k.
    */
  def entry(spark: SparkSession): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    queries("q21_revenue_topk_brand")(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (driver
    * records a weaker rows-only check for those).
    */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracle).toMap
}
