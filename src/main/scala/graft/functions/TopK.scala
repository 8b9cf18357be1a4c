package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, functions => F}

/** Typed top-k aggregator — the custom-aggregation path SURVEY.md §7(d)
  * reserves for similarity search: per group keep the k highest-scored
  * ids in a bounded buffer instead of window-sorting the whole group.
  *
  * Scale rationale: `row_number() OVER (PARTITION BY g ORDER BY score)`
  * sorts every group's full candidate set (Spark 3.5's WindowGroupLimit
  * prunes per-partition, but still materializes and sorts); this
  * aggregator's state is O(k) per group at every partial/merge stage —
  * map-side combine emits at most k rows per group per partition, so the
  * shuffle carries O(k·groups), not O(candidates).
  *
  * Determinism: total order (score desc, id asc) — merge-order
  * independent, so results are stable across partitionings and match the
  * oracle's `row_number` tiebreak exactly.
  */
object TopK {

  final case class Scored(id: Long, score: Double)

  class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    private def prune(s: Seq[Scored]): Seq[Scored] =
      s.sortBy(x => (-x.score, x.id)).take(k)
    override def zero: Seq[Scored] = Nil
    override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
      if (b.size < k) prune(b :+ a)
      else {
        val worst = b.last // b is kept pruned ⇒ sorted, last is the cutoff
        if (a.score > worst.score ||
          (a.score == worst.score && a.id < worst.id)) prune(b :+ a)
        else b
      }
    override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] =
      prune(x ++ y)
    override def finish(r: Seq[Scored]): Seq[Scored] = r
    override def bufferEncoder: Encoder[Seq[Scored]] =
      ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      ExpressionEncoder[Seq[Scored]]()
  }

  /** Column form: `topK(5)(col("id"), col("score"))` → array<struct<id,score>>
    * ordered best-first.
    */
  def topK(k: Int): (Column, Column) => Column = {
    val agg = F.udaf(new TopKAgg(k), ExpressionEncoder[Scored]())
    (id, score) => agg(id, score)
  }
}
