package graft

import org.scalatest.funsuite.AnyFunSuite

/** Lockstep guard for the money-sum doctrine: the Spark side routes
  * every growing-grain money sum through `QueryPack.moneySum2`/`money2`
  * (one definition), but the DuckDB twins are INLINE strings — this
  * spec pins each of them to the exact output of
  * [[graft.queries.QueryPack.duckMoneySum2]], so a doctrine change
  * cannot silently leave one hand-copied oracle behind, and the
  * tie-prone `round(... / 10000.0, 2)` finishing spelling cannot
  * reappear (a half-cent total rounds HALF_UP on Spark's exact decimal
  * but down on DuckDB's scaled binary double — the q298 class).
  * Pure string test: no Spark session.
  */
class MoneyDoctrineSpec extends AnyFunSuite {

  test("oracle money sums match the duckMoneySum2 generator exactly") {
    val oracles = SparkEntry.oracleSql
    val retired = "AS BIGINT)) / 10000.0, 2)"
    for ((n, sql) <- oracles)
      assert(!sql.contains(retired),
        s"$n still carries the tie-prone round finishing spelling")
    val lead = "((CASE WHEN sum(CAST(round(("
    var found = 0
    for ((n, sql) <- oracles) {
      var i = sql.indexOf(lead)
      while (i >= 0) {
        val k = i + lead.length
        var depth = 1
        var m = k
        while (depth > 0) {
          if (sql(m) == '(') depth += 1
          else if (sql(m) == ')') depth -= 1
          m += 1
        }
        val expr = sql.substring(k, m - 1)
        val gen = graft.queries.JoinsAggs.duckMoneySum2(expr)
        assert(sql.regionMatches(i, gen, 0, gen.length),
          s"$n: money-sum spelling diverged from duckMoneySum2($expr)")
        found += 1
        i = sql.indexOf(lead, i + 1)
      }
    }
    assert(found >= 26, s"expected >=26 doctrine sites, found $found")
  }
}
