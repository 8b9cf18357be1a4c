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
  * convergence check (a count of changed labels); labels checkpoint via
  * persist so lineage doesn't grow with iterations.
  */
object ConnectedComponents {

  /** @param edges two-column DataFrame (a, b) of undirected edges; node
    *              ids must be orderable (labels are min-reduced ids).
    * @return (node, component) — component = min node id reachable.
    */
  def run(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val sym = edges.toDF("a", "b")
      .union(edges.toDF("b", "a").select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .persist()
    val nodes = sym.select(col("a").as("node")).distinct()
    var labels = nodes.withColumn("component", col("node")).persist()
    labels.count()
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      // neighbor labels: for edge (a,b), b receives a's current label
      val neighborLabels = sym
        .join(labels, sym("a") === labels("node"))
        .select(col("b").as("node"), col("component"))
      val next = labels.select(col("node"), col("component"))
        .union(neighborLabels)
        .groupBy("node")
        .agg(min("component").as("component"))
        .persist()
      // the changed-count below is the materializing action for `next`
      changed = next.alias("n")
        .join(labels.alias("o"), col("n.node") === col("o.node"))
        .filter(col("n.component") =!= col("o.component"))
        .count()
      labels.unpersist()
      labels = next
      iter += 1
    }
    sym.unpersist()
    labels
  }
}
