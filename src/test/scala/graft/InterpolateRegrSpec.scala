package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** B55 q_interpolate / B56 q_regr semantics on crafted + real corpora. */
class InterpolateRegrSpec extends SparkSpec {
  import spark.implicits._

  private def eventsDir(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    val dir = TestTmp.dir("interp").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val data = rows.map { case (id, hourBucket, uid, typ, v) =>
      Row(id, new Timestamp(hourBucket * 3600L * 1000L), uid, typ, v, "{}")
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q_interpolate densifies the hour spine and interpolates linearly") {
    // type a: observed hours h, h+3 (values 1.0, 4.0) → gaps at h+1, h+2
    // filled with the exact linear interpolants 2.0, 3.0; two rows in
    // the h+3 bucket average to 4.0. type b: single hour, no gaps.
    val h = 473352L
    val dir = eventsDir(Seq(
      (1L, h, 10L, "a", 1.0), (2L, h + 3, 11L, "a", 3.0),
      (3L, h + 3, 12L, "a", 5.0), (4L, h, 20L, "b", 7.5)))
    val out = QueriesOlap.queries("q_interpolate")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getDouble(4)))
    val a = out.filter(_._1 == "a").sortBy(_._2)
    assert(a.map(_._2) === Seq(h, h + 1, h + 2, h + 3)) // dense spine
    assert(a.map(_._3) === Seq(1L, 0L, 0L, 2L))         // observed counts
    assert(a.map(_._4) === Seq(false, true, true, false))
    assert(a.map(_._5) === Seq(1.0, 2.0, 3.0, 4.0))     // exact interpolants
    val b = out.filter(_._1 == "b")
    assert(b === Array(("b", h, 1L, false, 7.5)))
  }

  test("q_regr matches an exact BigInt least-squares replay") {
    val rows = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag", $"l_linestatus", $"l_quantity", $"l_extendedprice")
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (BigInt(math.floor(r.getDouble(2) + 0.5).toLong),
          BigInt(math.floor(r.getDouble(3) * 100 + 0.5).toLong))))
    val expected = rows.groupBy(_._1).map { case (g, xs) =>
      val n = BigInt(xs.length)
      val sx = xs.map(_._2._1).sum; val sy = xs.map(_._2._2).sum
      val sxx = xs.map(t => t._2._1 * t._2._1).sum
      val sxy = xs.map(t => t._2._1 * t._2._2).sum
      val syy = xs.map(t => t._2._2 * t._2._2).sum
      val num = n * sxy - sx * sy
      val denx = n * sxx - sx * sx; val deny = n * syy - sy * sy
      def fl(b: BigInt) = BigDecimal(b).toDouble
      val slope = math.floor(fl(num) / fl(denx) * 1e4 + 0.5) / 1e4
      val icept = math.floor(fl(sy * sxx - sx * sxy) / fl(denx) * 1e4 + 0.5) / 1e4
      val r2 = math.floor((fl(num) / fl(denx)) * (fl(num) / fl(deny)) * 1e6 + 0.5) / 1e6
      g -> ((n.toLong, slope, icept, r2))
    }
    val got = QueriesOlap.queries("q_regr")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (g, (n, slope, icept, r2)) =>
      val (gn, gs, gi, gr) = got(g)
      assert(gn === n, s"n at $g")
      assert(math.abs(gs - slope) < 1e-9, s"slope at $g: $gs vs $slope")
      assert(math.abs(gi - icept) < 1e-9, s"intercept at $g: $gi vs $icept")
      assert(math.abs(gr - r2) < 1e-9, s"r2 at $g: $gr vs $r2")
      assert(gr >= 0.0 && gr <= 1.0, s"r2 range at $g")
    }
  }
}
