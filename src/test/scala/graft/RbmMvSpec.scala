package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.RbmMv

/** The exact-distinct bitmap MV (SketchMv's Rbm flavor, the StarRocks
  * BITMAP aggregate-column workflow): CDC stream → foreachBatch →
  * exact bitmap column committed via mergeTxGroup → distinct rollup
  * reading the COMMITTED bitmaps.
  *
  * Exactness is the contract: the rollup must EQUAL the direct
  * countDistinct recount — not sit in a band — through out-of-order
  * delivery and a duplicate batch replay (bitmap union is order-free
  * and idempotent per id).
  */
class RbmMvSpec extends SparkSpec {
  import spark.implicits._

  private def t(d: Int, h: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-0$d $h%02d:00:00")

  test("stream -> committed bitmap column -> distinct rollup equals the exact recount") {
    implicit val sqlCtx = spark.sqlContext
    val root = TestTmp.dir("rbmmv").toString + "/mv"
    // two types, two days each, per-day id ranges overlapping by half
    val all = for {
      (tp, umax) <- Seq(("a", 300), ("b", 900)); d <- 1 to 2; u <- 0 until umax
    } yield (t(d, 1 + u % 20), tp, (u + (d - 1) * umax / 2).toLong)

    val input = MemoryStream[(java.sql.Timestamp, String, Long)]
    val stream = input.toDF().toDF("ts", "event_type", "user_id")
      .withColumn("day", to_date(col("ts")))
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        RbmMv.maintainTx(root, batch, id,
          groupCols = Seq("event_type", "day"), idCol = col("user_id"))
        ()
      }.start()
    val (b1, rest) = all.splitAt(all.size / 3)
    val (b2, b3) = rest.splitAt(rest.size / 2)
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2.reverse: _*); q.processAllAvailable() // out-of-order
    input.addData(b3: _*); q.processAllAvailable()
    q.stop()

    val schemaOf = Seq.empty[(String, java.sql.Date, Map[Long, Array[Long]], Long, Long)]
      .toDF("event_type", "day", "sk", "n", "batch_id")
    val mv = RbmMv.readMv(spark, root, schemaOf)

    val direct = all.toDF("ts", "event_type", "user_id")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("d"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val rolled = RbmMv.rollup(mv, Seq("event_type"))
      .select(col("event_type"), col("n_distinct"), col("n_events"))
      .as[(String, Long, Long)].collect()
    assert(rolled.nonEmpty)
    rolled.foreach { case (tp, d, n) =>
      assert((d, n) == direct(tp),
        s"type $tp: rollup ($d, $n) != direct ${direct(tp)}")
    }

    // a replayed batch id runs zero jobs and changes nothing
    assert(!RbmMv.maintainTx(root,
      Seq((t(1, 1), "a", 999999L)).toDF("ts", "event_type", "user_id")
        .withColumn("day", to_date(col("ts"))),
      0L, Seq("event_type", "day"), col("user_id")))
    val after = RbmMv.rollup(RbmMv.readMv(spark, root, schemaOf),
      Seq("event_type")).select(col("event_type"), col("n_distinct"))
      .as[(String, Long)].collect().toMap
    rolled.foreach { case (tp, d, _) =>
      assert(after(tp) == d, s"replay must not change $tp: ${after(tp)} vs $d")
    }

    // flavor stamp: a KMV writer on this root must refuse
    val e = intercept[IllegalArgumentException] {
      graft.streaming.KmvMv.maintainTx(root,
        Seq((t(1, 1), "a", 1L)).toDF("ts", "event_type", "user_id")
          .withColumn("day", to_date(col("ts"))),
        5L, Seq("event_type", "day"), col("user_id"))
    }
    assert(e.getMessage.contains("flavor"), e.getMessage)
  }
}
