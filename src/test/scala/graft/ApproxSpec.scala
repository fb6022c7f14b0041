package graft

import org.apache.spark.sql.functions._

/** Error-bound assertions for the sketch queries. Since r9 the gate
  * queries themselves emit (exact value, bound flag) so the DuckDB
  * oracle checks the bound per round; this spec keeps pinning the RAW
  * estimates (recomputed inline — the gate output no longer carries
  * them) plus the gate flags, so a bound regression fails both here
  * and at the driver's gate.
  */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("q_approx_distinct: HLL estimate within 3x the configured rsd of exact; gate flags true") {
    val approx = Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("a"))
      .as[(String, Long)].collect().toMap
    val exact = Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    approx.foreach { case (k, a) =>
      val e = exact(k).toDouble
      assert(math.abs(a - e) / e <= 3 * 0.02,
        s"HLL estimate for $k off by ${math.abs(a - e) / e}: approx=$a exact=$e")
    }
    val gate = SparkEntry.queries("q_approx_distinct")(spark, sfDir)
      .as[(String, Long, Boolean)].collect()
    assert(gate.nonEmpty && gate.forall(_._3), s"gate est_ok flags: ${gate.mkString(",")}")
    gate.foreach { case (k, n, _) => assert(n == exact(k)) }
  }

  test("q_hll_rollup: unioned daily sketches estimate within 5% of exact; gate flags true") {
    val unioned = Tables.events(spark, sfDir)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
      .groupBy(col("event_type"), col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e"))
      .as[(String, Double)].collect().toMap
    val exact = Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"))
      .as[(String, Long)].collect().toMap
    assert(unioned.keySet == exact.keySet && unioned.nonEmpty)
    unioned.foreach { case (k, approx) =>
      val u = exact(k).toDouble
      // lgConfigK=12 default → rse ≈ 1.04/√2¹² ≈ 1.6%; 5% is 3σ+
      assert(math.abs(approx - u) / u <= 0.05,
        s"HLL rollup for $k off: approx=$approx exact=$u")
    }
    // mergeability is the point: the union of per-day sketches must
    // equal one sketch built over all days (same estimate exactly)
    val direct = Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("e"))
      .as[(String, Double)].collect().toMap
    unioned.foreach { case (k, approx) =>
      assert(math.abs(approx - direct(k)) <= 1e-9 ||
        math.abs(approx - direct(k)) / direct(k) <= 0.01,
        s"unioned vs direct sketch diverge for $k: $approx vs ${direct(k)}")
    }
    val gate = SparkEntry.queries("q_hll_rollup")(spark, sfDir)
      .as[(String, Long, Long, Long, Boolean)].collect()
    assert(gate.nonEmpty && gate.forall(_._5), s"gate est_ok flags: ${gate.mkString(",")}")
    gate.foreach { case (k, _, nDays, nExact, _) =>
      assert(nExact == exact(k)); assert(nDays >= 1L)
    }
  }

  test("q_approx_percentile: estimates land within the sketch's rank-error window; gate flags true") {
    val approx = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(approx_percentile(col("l_extendedprice"),
        array(lit(0.25), lit(0.5), lit(0.75)), lit(1000)).as("p"))
      .as[(String, Seq[Double])].collect().toMap
    // accuracy=1000 bounds rank error by 1/1000: the estimate must be
    // an actual value whose rank is within n/1000 (+slack for
    // interpolation-free selection) of the target rank
    val byFlag = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(approx.keySet == byFlag.keySet && approx.nonEmpty)
    for ((flag, est) <- approx; (p, v) <- Seq(0.25, 0.5, 0.75).zip(est)) {
      val vals = byFlag(flag)
      val n = vals.length
      val rank = vals.count(_ <= v)
      val target = p * n
      val slack = n / 1000.0 + 1
      assert(math.abs(rank - target) <= 2 * slack,
        s"$flag p$p: value $v has rank $rank, target $target (n=$n)")
    }
    val gate = SparkEntry.queries("q_approx_percentile")(spark, sfDir)
      .as[(String, Long, Boolean, Boolean, Boolean)].collect()
    assert(gate.nonEmpty && gate.forall(r => r._3 && r._4 && r._5),
      s"gate pNN_ok flags: ${gate.mkString(",")}")
  }
}
