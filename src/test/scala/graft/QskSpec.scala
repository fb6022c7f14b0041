package graft

import org.apache.spark.sql.functions._
import graft.functions.Qsk

/** Mergeable quantile sketch (the StarRocks PERCENTILE column role):
  * rank-error bound, exact weight conservation, mergeability (union of
  * per-day sketches ≈ one direct sketch), and partition-order
  * robustness — the real correctness contract behind
  * q_percentile_rollup's gate flags.
  */
class QskSpec extends SparkSpec {
  import spark.implicits._

  private def rankOf(vals: Array[Double], v: Double): Long = vals.count(_ <= v)

  test("local sketch: rank error within the ~levels·n/2k bound; weight conserved") {
    val rnd = new scala.util.Random(7)
    val n = 50000
    val vals = Array.fill(n)(rnd.nextGaussian() * 100 + 17)
    var s = Qsk.empty()
    vals.foreach(v => s = Qsk.update(s, v))
    assert(s.count == n && Qsk.weight(s) == n, "weight must equal count exactly")
    val sorted = vals.sorted
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = Qsk.quantile(s, q)
      val r = rankOf(sorted, est)
      assert(math.abs(r - q * n) <= 0.02 * n + 1,
        s"q=$q: rank $r vs target ${q * n} (err ${math.abs(r - q * n) / n})")
    }
    // buffer stays sketch-sized: ~k per level, levels ~ log2(n/k)
    val stored = s.levels.values.map(_(0).toInt).sum
    assert(stored < 12 * Qsk.DefaultK, s"sketch holds $stored values")
  }

  test("merge: union of shards == same bound as direct; weight adds exactly") {
    val rnd = new scala.util.Random(11)
    val n = 40000
    val vals = Array.fill(n)(math.exp(rnd.nextGaussian())) // skewed
    val shards = vals.grouped(1000).map { chunk =>
      var s = Qsk.empty(); chunk.foreach(v => s = Qsk.update(s, v)); s
    }.toSeq
    val merged = shards.reduce(Qsk.merge)
    assert(merged.count == n && Qsk.weight(merged) == n)
    val sorted = vals.sorted
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val r = rankOf(sorted, Qsk.quantile(merged, q))
      assert(math.abs(r - q * n) <= 0.03 * n + 1,
        s"merged q=$q: rank $r vs ${q * n}")
    }
  }

  test("aggregators: rollup over days within bound under shuffled partitionings") {
    val events = Tables.events(spark, sfDir)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
    val exact = events.select(col("event_type"), col("value"))
      .as[(String, Double)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    for (parts <- Seq(3, 17)) {
      val daily = events.repartition(parts)
        .groupBy(col("event_type"), col("day"))
        .agg(Qsk.qskOf(col("value")).as("sk"))
      val rolled = daily.groupBy(col("event_type"))
        .agg(Qsk.qskMergeQuantile(col("sk"), 0.5).as("p50"),
          Qsk.qskMergeQuantile(col("sk"), 0.9).as("p90"))
        .as[(String, Double, Double)].collect()
      assert(rolled.map(_._1).toSet == exact.keySet)
      rolled.foreach { case (t, p50, p90) =>
        val vals = exact(t); val n = vals.length
        assert(math.abs(rankOf(vals.toArray, p50) - 0.5 * n) <= 0.03 * n + 1,
          s"$t p50 at $parts parts")
        assert(math.abs(rankOf(vals.toArray, p90) - 0.9 * n) <= 0.03 * n + 1,
          s"$t p90 at $parts parts")
      }
    }
  }

  test("StarRocks-named SQL surface: percentile_sketch/union/union_p50 resolve in spark.sql") {
    Tables.events(spark, sfDir)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
      .createOrReplaceTempView("qsk_events")
    // the PERCENTILE column workflow verbatim: store daily sketches,
    // union + extract at query time
    val viaSql = spark.sql(
      """SELECT event_type, percentile_union_p50(sk) AS p50 FROM
        |  (SELECT event_type, day, percentile_sketch(value) AS sk
        |   FROM qsk_events GROUP BY event_type, day)
        |GROUP BY event_type""".stripMargin)
      .as[(String, Double)].collect().toMap
    // two-step union-then-extract returns a sketch column that feeds
    // a second union (re-aggregation composes)
    val twoStep = spark.sql(
      """SELECT percentile_union_p50(sk2) AS p FROM
        |  (SELECT event_type, percentile_union(sk) AS sk2 FROM
        |    (SELECT event_type, day, percentile_sketch(value) AS sk
        |     FROM qsk_events GROUP BY event_type, day)
        |   GROUP BY event_type)""".stripMargin)
      .as[Double].head()
    assert(!twoStep.isNaN)
    val exact = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"))
      .as[(String, Double)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    viaSql.foreach { case (t, p50) =>
      val vals = exact(t); val n = vals.length
      assert(math.abs(rankOf(vals.toArray, p50) - 0.5 * n) <= 0.03 * n + 1,
        s"SQL-path p50 for $t out of bound")
    }
  }

  test("percentile_approx_raw: scalar extraction from stored sketches at arbitrary q") {
    Tables.events(spark, sfDir)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
      .createOrReplaceTempView("qsk_events2")
    // the full StarRocks PERCENTILE read path: stored sketches →
    // percentile_union → scalar percentile_approx_raw at ANY q
    val got = spark.sql(
      """SELECT event_type,
        |  percentile_approx_raw(usk, 0.25) AS p25,
        |  percentile_approx_raw(usk, 0.5)  AS p50,
        |  percentile_approx_raw(usk, 0.75) AS p75
        |FROM (SELECT event_type, percentile_union(sk) AS usk FROM
        |  (SELECT event_type, day, percentile_sketch(value) AS sk
        |   FROM qsk_events2 GROUP BY event_type, day)
        |  GROUP BY event_type)""".stripMargin)
      .as[(String, Double, Double, Double)].collect()
    val exact = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"))
      .as[(String, Double)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    assert(got.nonEmpty)
    got.foreach { case (t, p25, p50, p75) =>
      assert(p25 <= p50 && p50 <= p75, s"$t: non-monotone quantiles")
      val vals = exact(t); val n = vals.length
      for ((q, v) <- Seq(0.25 -> p25, 0.5 -> p50, 0.75 -> p75))
        assert(math.abs(rankOf(vals.toArray, v) - q * n) <= 0.03 * n + 1,
          s"$t q=$q out of bound")
    }
    // literal-config errors are named
    val e = intercept[Exception](spark.sql(
      "SELECT percentile_approx_raw(map(), value) FROM qsk_events2").collect())
    assert(e.getMessage.contains("literal"))
  }

  test("merging sketches of different k keeps the larger capacity and the bound") {
    val rnd = new scala.util.Random(3)
    val vals = Array.fill(20000)(rnd.nextDouble() * 1000)
    var small = Qsk.empty(k = 64)
    var big = Qsk.empty(k = 512)
    vals.take(10000).foreach(v => small = Qsk.update(small, v))
    vals.drop(10000).foreach(v => big = Qsk.update(big, v))
    val m = Qsk.merge(small, big)
    assert(m.k == 512 && m.count == 20000 && Qsk.weight(m) == 20000)
    val sorted = vals.sorted
    val r = sorted.count(_ <= Qsk.quantile(m, 0.5))
    // the k=64 half contributes its coarser error; 5% covers it
    assert(math.abs(r - 10000) <= 0.05 * 20000 + 1, s"mixed-k median rank $r")
  }

  test("edges: empty sketch, single value, q=0/1, duplicate-heavy input") {
    assert(Qsk.quantile(Qsk.empty(), 0.5).isNaN)
    var one = Qsk.empty(); one = Qsk.update(one, 42.0)
    assert(Qsk.quantile(one, 0.0) == 42.0 && Qsk.quantile(one, 1.0) == 42.0)
    // massive duplication: quantile must return a data value and the
    // median of 90% duplicates is the duplicate
    var dup = Qsk.empty()
    (1 to 9000).foreach(_ => dup = Qsk.update(dup, 5.0))
    (1 to 1000).foreach(i => dup = Qsk.update(dup, 1000.0 + i))
    assert(Qsk.quantile(dup, 0.5) == 5.0)
    assert(Qsk.weight(dup) == 10000)
  }
}
