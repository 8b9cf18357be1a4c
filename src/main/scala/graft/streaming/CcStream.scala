package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of q66's dedup clustering — INCREMENTAL connected
  * components over the verified near-dup pair stream, closing the dedup
  * loop end-to-end: [[DedupStream]] mines pairs as documents arrive, this
  * module folds each pair into a union-find forest held in
  * `flatMapGroupsWithState` state and emits label UPDATES (only nodes
  * whose component changed this batch, stamped with a batch sequence
  * number so consumers reconstruct the latest table with one max-seq per
  * node).
  *
  * Invariant (what makes labels equal the batch q66 form): every
  * union attaches the LARGER root under the smaller, so a set's root is
  * always its minimum member — exactly
  * [[graft.functions.ConnectedComponents]]' min-label semantics, and
  * therefore q66's `component`/keeper contract, at every batch boundary,
  * for any micro-batch split of the edge stream (union-find's final
  * partition is edge-order independent). Re-delivered edges are no-op
  * unions, so at-least-once replay cannot corrupt labels.
  *
  * Scale notes: connectivity is a GLOBAL property — merges can bridge any
  * two keys — so the state is keyed on a single registry key rather than
  * pretending a per-shard key exists (a sharded variant needs an extra
  * boundary-edge round per batch, the streaming analogue of a CC
  * iteration). What bounds it: the state holds only nodes that appear in
  * VERIFIED near-dup pairs — dup-cluster membership, orders of magnitude
  * below corpus grain (the q62/q66 pipeline's contract) — and stores two
  * longs per such node. Production additions for unbounded streams:
  * component-range sharding with a per-batch bridge round, and TTL
  * eviction of settled components (emitted ∧ untouched for the window).
  */
object CcStream {

  final case class Edge(a: Long, b: Long)

  /** A label change: `node` moved to `component` in batch `seq`. */
  final case class LabelUpdate(seq: Long, node: Long, component: Long)

  /** parent: union-find forest (flattened to roots at rest);
    * emitted: last label emitted per node; seq: batches processed. */
  final case class CcState(parent: Map[Long, Long],
      emitted: Map[Long, Long], seq: Long)

  def labelsWithState(edges: Dataset[Edge]): Dataset[LabelUpdate] = {
    val spark = edges.sparkSession
    import spark.implicits._
    edges
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[CcState, LabelUpdate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Int, it: Iterator[Edge], state: GroupState[CcState]) =>
          val st = state.getOption.getOrElse(CcState(Map.empty, Map.empty, 0L))
          val parent =
            scala.collection.mutable.Map.empty[Long, Long] ++ st.parent
          def find(x: Long): Long = {
            var r = x
            while (parent(r) != r) r = parent(r)
            var c = x // path compression
            while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
            r
          }
          it.foreach { e =>
            if (!parent.contains(e.a)) parent(e.a) = e.a
            if (!parent.contains(e.b)) parent(e.b) = e.b
            val ra = find(e.a)
            val rb = find(e.b)
            if (ra != rb) { // smaller root wins: root ≡ set minimum
              if (ra < rb) parent(rb) = ra else parent(ra) = rb
            }
          }
          val seq = st.seq + 1
          val out = parent.keys.toSeq.sorted.flatMap { n =>
            val c = find(n)
            if (st.emitted.get(n).contains(c)) None
            else Some(LabelUpdate(seq, n, c))
          }
          state.update(CcState(
            parent.keys.map(k => k -> find(k)).toMap,
            st.emitted ++ out.map(u => u.node -> u.component),
            seq))
          out.iterator
      }
  }
}
