package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.functions.Qsk
import graft.streaming.QskMv

/** A35's missing write path (r9 demand #7 / r10 demand #5): CDC
  * stream → foreachBatch → Qsk sketch column committed via
  * mergeTxGroup → B69-shape rollup reading the COMMITTED sketches.
  *
  * The equivalence contract deliberately matches the sketch's own
  * guarantee: compactor states are merge-order-dependent (two batch
  * recomputes over different partial splits already differ in
  * retained values), so "committed ≡ recomputed" is pinned as
  * (a) EXACT key set and counts, and (b) every quantile estimate —
  * streamed-and-committed AND one-shot batch — within the QskSpec
  * rank bound of the true percentile of the same rows. Plus the
  * transactional edges: a replayed batch id is a zero-job no-op, and
  * the view converges across duplicate delivery.
  */
class QskMvSpec extends SparkSpec {
  import spark.implicits._

  private def t(d: Int, h: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-0$d $h%02d:00:00")

  test("stream -> committed sketch column -> B69 rollup matches batch recompute") {
    implicit val sqlCtx = spark.sqlContext
    val root = TestTmp.dir("qskmv").toString + "/mv"
    // 2 types × 2 days × values 0..499 (type a) / 0..999 (type b)
    val all = for {
      (tp, vmax) <- Seq(("a", 500), ("b", 1000)); d <- 1 to 2; v <- 0 until vmax
    } yield (t(d, 1 + v % 20), tp, v.toDouble)

    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val stream = input.toDF().toDF("ts", "event_type", "value")
      .withColumn("day", to_date(col("ts")))
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        QskMv.maintainTx(root, batch, id,
          groupCols = Seq("event_type", "day"), valueCol = col("value"))
        ()
      }.start()
    // three deliveries, second reversed (out-of-order arrival)
    val (b1, rest) = all.splitAt(all.size / 3)
    val (b2, b3) = rest.splitAt(rest.size / 2)
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2.reverse: _*); q.processAllAvailable()
    input.addData(b3: _*); q.processAllAvailable()
    q.stop()

    val schemaOf = Seq.empty[(String, java.sql.Date, Qsk.Sk, Long, Long)]
      .toDF("event_type", "day", "sk", "n", "batch_id")
    val mv = QskMv.readMv(spark, root, schemaOf)

    // exact key set + exact counts (the sketch never loses rows)
    val keys = mv.select(col("event_type"), col("day"), col("n"))
      .as[(String, java.sql.Date, Long)].collect().toSet
    def d(i: Int) = java.sql.Date.valueOf(s"2024-01-0$i")
    assert(keys == Set(("a", d(1), 500L), ("a", d(2), 500L),
      ("b", d(1), 1000L), ("b", d(2), 1000L)))

    // a REPLAYED batch id is refused without running jobs and the
    // committed view is byte-stable across it
    val dup = stream.limit(0).sparkSession.createDataFrame(
      b1.map { case (ts, tp, v) => (ts, tp, v, new java.sql.Date(ts.getTime)) })
      .toDF("ts", "event_type", "value", "day")
    assert(!QskMv.maintainTx(root, dup, batchId = 0L,
      groupCols = Seq("event_type", "day"), valueCol = col("value")))
    assert(QskMv.readMv(spark, root, schemaOf).select(col("n")).as[Long]
      .collect().sum == 3000L)

    // B69-shape rollup over the COMMITTED sketches vs the one-shot
    // batch recompute over the same raw rows: same keys/counts
    // exactly, every estimate within the sketch rank bound of truth
    val committed = QskMv.rollup(mv, Seq("event_type"), Seq(0.5, 0.9))
      .select(col("event_type"), col("p50_est"), col("p90_est"),
        col("n_events"), col("n_keys"))
      .as[(String, Double, Double, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val rawDf = all.toDF("ts", "event_type", "value")
    val recomputed = QskMv.rollup(
        rawDf.withColumn("day", to_date(col("ts")))
          .groupBy(col("event_type"), col("day"))
          .agg(Qsk.qskOf(col("value")).as("sk"), count(lit(1)).as("n")),
        Seq("event_type"), Seq(0.5, 0.9))
      .select(col("event_type"), col("p50_est"), col("p90_est"),
        col("n_events"), col("n_keys"))
      .as[(String, Double, Double, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(committed.keySet == Set("a", "b"))
    for (tp <- Seq("a", "b")) {
      val (c, r) = (committed(tp), recomputed(tp))
      assert(c._4 == r._4 && c._5 == r._5,
        s"$tp counts drifted: committed $c vs recomputed $r")
      val vmax = if (tp == "a") 500 else 1000
      val n = 2L * vmax
      def rankOk(est: Double, qq: Double): Boolean = {
        // values are duplicated per day: rank of est among 0..vmax-1 ×2
        val rank = 2.0 * math.min(vmax, math.max(0.0, math.floor(est) + 1))
        math.abs(rank - qq * n) <= 0.03 * n + 2
      }
      for ((est, qq) <- Seq(c._2 -> 0.5, c._3 -> 0.9, r._2 -> 0.5, r._3 -> 0.9))
        assert(rankOk(est, qq), s"$tp estimate $est off the $qq rank bound")
    }
  }
}
