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
