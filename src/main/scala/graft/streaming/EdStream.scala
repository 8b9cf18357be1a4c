package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.plans.EditDistanceJoinBlocking]] — exact
  * `levenshtein(x, y) ≤ k` pairs mined incrementally through PassJoin
  * SEGMENT buckets, the fourth (and last) blocking join rule to gain a
  * streaming twin ([[DedupStream]], [[SrpStream]], [[SetSimStream]]):
  *
  *   - each document contributes TWO row families to one shared
  *     keyspace `(segment index, target length, content)`: its k+1
  *     even SEGMENTS (key target length = its own length) and its
  *     multi-match-aware probe COMBO substrings (key target length =
  *     own length + d) — the batch rule's explode sides, re-expressed
  *     as bucket rows ([[rows]]; the (d, i, j) window enumeration and
  *     even-partition arithmetic mirror the rule verbatim);
  *   - state per key is that bucket of the store;
  *   - a pair (x < y) is emitted when the LATER of two specific rows
  *     arrives and finds the other in-bucket: y's PROBE row vs x's
  *     SEGMENT row (role fixed by id order — probe belongs to the
  *     larger id), gated by the exact DP verify AND the canonical
  *     FIRST-MATCHING-COMBO check (this row's combo code equals the
  *     first code in enumeration order whose substring matches x's
  *     segment — the batch rule's `firstCode` residual as a state-side
  *     recomputation from the two full strings). The PassJoin lemma
  *     guarantees the canonical combo exists for a qualifying pair and
  *     both rows hash to its bucket — exactly-once, no dedup pass.
  *
  * Parity contract: over ANY micro-batch split, the emitted pair
  * multiset equals the batch rule's result on the same corpus
  * (1 ≤ k ≤ 3). Duplicate deliveries of a (key, doc, role, code) row
  * are ignored — replay cannot double-pair.
  *
  * Scale notes: state shards at segment-content grain (the rule's own
  * candidate granularity); bucket population is the corpus's
  * segment-collision density. Production adds TTL/watermark eviction;
  * semantics here are the append-only store.
  */
object EdStream {

  final case class EdRow(key: String, docId: Long, s: String,
      probe: Boolean, code: Int)

  final case class EdPair(docId: Long, docId2: Long, dist: Int)

  /** (d, i, j, code) in enumeration order — the rule's combo set. */
  private def combos(k: Int): Seq[(Int, Int, Int, Int)] = {
    val b = Seq.newBuilder[(Int, Int, Int, Int)]
    var code = 0
    for (d <- -k to k; i <- 0 to k) {
      val delta = -d
      val lo = math.max(-i, delta - (k - i))
      val hi = math.min(i, delta + (k - i))
      for (j <- lo to hi) { b += ((d, i, j, code)); code += 1 }
    }
    b.result()
  }

  /** Even-partition arithmetic (longer segments LAST) — the rule's. */
  private def segLen(n: Int, i: Int, nSeg: Int): Int =
    n / nSeg + (if (i >= nSeg - n % nSeg) 1 else 0)

  private def segStart(n: Int, i: Int, nSeg: Int): Int =
    i * (n / nSeg) + math.max(0, i - (nSeg - n % nSeg))

  /** Combo substring of probe `s` targeting length `n`, None when the
    * shifted window falls outside `s` (the rule's comboValid). */
  private def comboSub(s: String, n: Int, i: Int, j: Int,
      nSeg: Int): Option[String] = {
    if (n < 0) return None
    val start = segStart(n, i, nSeg) + j
    val len = segLen(n, i, nSeg)
    if (start < 0 || start + len > s.length) None
    else Some(s.substring(start, start + len))
  }

  /** Classic DP edit distance (the exact verify). */
  def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }

  /** The first combo code (enumeration order) of probe `p` whose
    * substring matches target `t`'s segment — the rule's `firstCode`
    * recomputed from the full strings; −1 if none. */
  private def firstCode(p: String, t: String, k: Int): Int = {
    val nSeg = k + 1
    combos(k).collectFirst {
      case (d, i, j, code)
          if p.length + d == t.length &&
            comboSub(p, p.length + d, i, j, nSeg)
              .contains(t.substring(segStart(t.length, i, nSeg),
                segStart(t.length, i, nSeg) +
                  segLen(t.length, i, nSeg))) => code
    }.getOrElse(-1)
  }

  /** The exploded bucket rows of one document: its k+1 segments plus
    * its valid probe combos, on the shared
    * `(idx, target length, content)` keyspace. */
  def rows(docId: Long, s: String, k: Int): Seq[EdRow] = {
    val nSeg = k + 1
    val segs = (0 until nSeg).map { i =>
      val st = segStart(s.length, i, nSeg)
      val sub = s.substring(st, st + segLen(s.length, i, nSeg))
      EdRow(s"$i|${s.length}|$sub", docId, s, probe = false, code = -1)
    }
    val probes = combos(k).flatMap { case (d, i, j, code) =>
      comboSub(s, s.length + d, i, j, nSeg).map { sub =>
        EdRow(s"$i|${s.length + d}|$sub", docId, s, probe = true, code)
      }
    }
    segs ++ probes
  }

  def pairsWithState(rowsDs: Dataset[EdRow], k: Int): Dataset[EdPair] = {
    require(k >= 1 && k <= 3, s"k must be in [1, 3], got $k")
    val spark = rowsDs.sparkSession
    import spark.implicits._
    rowsDs
      .groupByKey(_.key)
      .flatMapGroupsWithState[List[(Long, Boolean, Int, String)], EdPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, it: Iterator[EdRow],
            state: GroupState[List[(Long, Boolean, Int, String)]]) =>
          var bucket = state.getOption.getOrElse(Nil)
          val out = List.newBuilder[EdPair]
          it.toSeq.sortBy(r => (r.docId, r.probe, r.code)).foreach { r =>
            if (!bucket.exists(e => e._1 == r.docId && e._2 == r.probe &&
              e._3 == r.code)) { // replay-idempotent
              bucket.foreach { case (id2, probe2, code2, s2) =>
                // role convention: probe row belongs to the LARGER id
                val (pid, pStr, pCode, sid, sStr) =
                  if (r.probe && !probe2 && r.docId > id2)
                    (r.docId, r.s, r.code, id2, s2)
                  else if (!r.probe && probe2 && id2 > r.docId)
                    (id2, s2, code2, r.docId, r.s)
                  else (-1L, "", -1, -1L, "")
                if (pid >= 0 && pCode == firstCode(pStr, sStr, k)) {
                  val d = lev(pStr, sStr)
                  if (d <= k) out += EdPair(sid, pid, d)
                }
              }
              bucket = (r.docId, r.probe, r.code, r.s) :: bucket
            }
          }
          state.update(bucket)
          out.result().iterator
      }
  }
}
