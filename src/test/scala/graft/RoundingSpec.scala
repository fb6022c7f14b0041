package graft

import org.scalatest.funsuite.AnyFunSuite

class RoundingSpec extends AnyFunSuite {
  test("rewriteRound handles nested parens and multiple occurrences") {
    assert(SparkEntry.rewriteRound("SELECT round(x, 2) FROM t")
      == "SELECT floor((x) * 100 + 0.5) / 100 FROM t")
    assert(SparkEntry.rewriteRound("round(sum(a * (1 - b)), 4)")
      == "floor((sum(a * (1 - b))) * 10000 + 0.5) / 10000")
    assert(SparkEntry.rewriteRound("round(a, 2) + round(b, 4)")
      == "floor((a) * 100 + 0.5) / 100 + floor((b) * 10000 + 0.5) / 10000")
    assert(SparkEntry.rewriteRound("no rounds here") == "no rounds here")
  }

  test("every oracle query has a matching Spark query and vice versa") {
    // since r9 the sketch queries emit exact-value + bound-flag
    // outputs, so EVERY query is oracle-backed — no rows-only set left
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle without query: ${o.diff(q)}")
    assert(q.subsetOf(o), s"query without oracle: ${q -- o}")
  }
}
