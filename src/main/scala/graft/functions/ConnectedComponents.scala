package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Min-label connected components over an undirected edge list — the
  * cluster-building stage of near-dup deduplication (pairs → components →
  * one keeper per component).
  *
  * Algorithm: label propagation. Every node starts labeled with itself;
  * each round every node takes the min of its own and its neighbors'
  * labels; converges in O(component diameter) rounds. Near-dup components
  * are overwhelmingly small (pairs/triangles), so a handful of rounds
  * suffices; `maxIter` bounds the worst case and the loop exits early on
  * fixpoint.
  *
  * Scale notes: each round is one shuffle (groupBy node) over the edge
  * list — the standard large-graph CC shape short of a full
  * Pregel/GraphX dependency. The driver-side loop holds no data, only the
  * convergence check (a count of changed labels). Labels
  * `localCheckpoint` each round: persist alone caches *data* but every
  * round's plan still embeds the previous round's tree twice (union +
  * convergence join), doubling the logical plan per iteration — a
  * diameter-11 graph OOMed on plan stringification before computing
  * anything. Checkpointing truncates the lineage to a scan of the cached
  * partitions. (On a real cluster prefer reliable `checkpoint()` to a
  * checkpoint dir — localCheckpoint trades fault-tolerance for speed.)
  */
object ConnectedComponents {

  /** @param edges two-column DataFrame (a, b) of undirected edges; node
    *              ids must be orderable (labels are min-reduced ids).
    * @return (node, component) — component = min node id reachable.
    */
  def run(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val e0 = edges.toDF("a", "b")
    // swap positionally from e0 — a toDF re-rename followed by select on
    // the new names is an identity, which silently left this graph
    // DIRECTED (caught by the cycle-topology spec; the q66 clique
    // components masked it because their min node reaches all members in
    // one directed hop).
    val sym = e0
      .union(e0.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint()
    val nodes = sym.select(col("a").as("node")).distinct()
    var labels = nodes.withColumn("component", col("node")).localCheckpoint()
    val labelType = labels.schema("component").dataType
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      // neighbor labels: for edge (a,b), b receives a's current label.
      // The node's own row additionally carries its previous label in
      // `own`, so convergence is a filter over the checkpointed result —
      // not a second shuffle join per round.
      val neighborLabels = sym
        .join(labels, sym("a") === labels("node"))
        .select(col("b").as("node"), col("component"),
          lit(null).cast(labelType).as("own"))
      val next = labels
        .select(col("node"), col("component"), col("component").as("own"))
        .union(neighborLabels)
        .groupBy("node")
        .agg(min("component").as("component"),
          // exactly one non-null `own` per node (its previous label)
          max("own").as("old"))
        .localCheckpoint() // eager: materializes AND truncates lineage
      changed = next.filter(col("component") =!= col("old")).count()
      labels = next.select("node", "component")
      iter += 1
    }
    labels
  }
}
