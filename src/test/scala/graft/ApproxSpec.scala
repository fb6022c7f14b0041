package graft

import org.apache.spark.sql.functions._

/** Error-bound assertions for the two deliberately oracle-less sketch
  * queries (their sketch values are engine-specific, so the driver
  * only rows-checks them — the real correctness contract lives
  * here).
  */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("q_approx_distinct: HLL estimate within 3x the configured rsd of exact") {
    val approx = SparkEntry.queries("q_approx_distinct")(spark, sfDir)
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
  }

  test("q_hll_rollup: unioned daily sketches estimate within 5% of exact") {
    val got = SparkEntry.queries("q_hll_rollup")(spark, sfDir)
      .as[(String, Double, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val exact = Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet == exact.keySet && got.nonEmpty)
    got.foreach { case (k, (approx, nEvents, nDays)) =>
      val (u, n) = exact(k)
      // lgConfigK=12 default → rse ≈ 1.04/√2¹² ≈ 1.6%; 5% is 3σ+
      assert(math.abs(approx - u) / u <= 0.05,
        s"HLL rollup for $k off: approx=$approx exact=$u")
      assert(nEvents === n, s"event count for $k must be exact")
      assert(nDays >= 1L)
    }
    // mergeability is the point: the union of per-day sketches must
    // equal one sketch built over all days (same estimate exactly)
    val direct = Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("e"))
      .as[(String, Double)].collect().toMap
    got.foreach { case (k, (approx, _, _)) =>
      assert(math.abs(approx - direct(k)) <= 1e-9 ||
        math.abs(approx - direct(k)) / direct(k) <= 0.01,
        s"unioned vs direct sketch diverge for $k: $approx vs ${direct(k)}")
    }
  }

  test("q_approx_percentile: estimates land within the sketch's rank-error window") {
    val approx = SparkEntry.queries("q_approx_percentile")(spark, sfDir)
      .as[(String, Double, Double, Double, Long)].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4)).toMap
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
  }
}
