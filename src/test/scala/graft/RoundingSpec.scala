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
    // approx sketches have engine-specific values, and k-means||
    // centroids are iterative → deliberately oracle-less (driver
    // applies its weaker rows-only check; ApproxSpec / KMeansSpec
    // carry the real assertions)
    val rowsOnly = Set("q_approx_distinct", "q_approx_percentile", "q_hll_rollup")
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle without query: ${o.diff(q)}")
    assert((q -- rowsOnly).subsetOf(o), s"query without oracle: ${q -- rowsOnly -- o}")
  }
}
