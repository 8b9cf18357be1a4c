package graft.tools

import org.apache.spark.sql.functions._
import graft.Sessions

/** Computes the corpus's top-N most frequent tokens and prints the
  * `spark.graft.setsim.stopTokens` conf value that enables
  * frequency-aware prefix ordering in
  * [[graft.plans.SetSimilarityJoinBlocking]] (PPJoin's refinement with
  * the statistics supplied out-of-band — the engine never runs a
  * stats job inside the optimizer; the user owns the stats decision,
  * exactly like a broadcast hint).
  *
  * Usage: sbt "runMain graft.tools.TokenStats [sfDir] [topN]"
  * → prints one line `spark.graft.setsim.stopTokens=tok1,tok2,…`
  * (tokens containing commas are skipped — the conf is a
  * comma-separated list).
  */
object TokenStats {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val topN = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = Sessions.local("graft-token-stats")
    val toks = graft.catalog.Tables.load(spark, dir, "documents")
      .select(explode(array_distinct(
        graft.queries.TextOps.toks(col("text")))).as("tok"))
      .groupBy("tok").count()
      .orderBy(col("count").desc, col("tok"))
      .limit(topN * 2)
      .collect()
      .map(_.getString(0))
      .filterNot(_.contains(","))
      .take(topN)
    println("spark.graft.setsim.stopTokens=" + toks.mkString(","))
    spark.stop()
  }
}
