package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.cdc.MaterializedAgg

/** Incremental materialized-view maintenance: signed-delta updates
  * must equal a full recompute under updates, deletes, group
  * migration, out-of-order and duplicate delivery. */
class MaterializedAggSpec extends SparkSpec {
  import spark.implicits._

  // changelog rows: (key, version, group, value, deleted)
  private def chg(rows: (Long, Long, String, Double, Boolean)*): DataFrame =
    rows.toDF("k", "ver", "g", "v", "del")

  private def mvOf(batches: Seq[DataFrame]): Map[String, (Long, Double)] =
    MaterializedAgg.maintain(batches, keyCols = Seq("k"),
        version = Seq(col("ver")), deleteFlag = col("del"),
        groupCols = Seq("g"), sums = Seq("total" -> col("v")))
      .select(col("g"), col("n"), col("total"))
      .as[(String, Long, Double)].collect()
      .map { case (g, n, t) => g -> (n, t) }.toMap

  // ground truth: live latest row per key, aggregated directly
  private def recompute(all: DataFrame): Map[String, (Long, Double)] =
    graft.cdc.PkTable.compact(all, Seq("k"), Seq(col("ver")), col("del"))
      .groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("total"))
      .as[(String, Long, Double)].collect()
      .map { case (g, n, t) => g -> (n, t) }.toMap

  test("updates, deletes, and group migration match a full recompute") {
    val b1 = chg((1L, 1L, "a", 10.0, false), (2L, 1L, "a", 20.0, false),
      (3L, 1L, "b", 5.0, false))
    val b2 = chg((1L, 2L, "a", 11.0, false),  // in-place update
      (2L, 2L, "b", 20.0, false),             // migrates a → b
      (4L, 1L, "b", 7.0, false))
    val b3 = chg((3L, 2L, "b", 0.0, true),    // delete
      (5L, 1L, "c", 1.5, false))
    val got = mvOf(Seq(b1, b2, b3))
    val want = recompute(b1.unionByName(b2).unionByName(b3))
    assert(got == want)
    assert(got("a") == ((1L, 11.0)))          // only key 1 left in a
    assert(!got.contains("x"))
  }

  test("group vanishes when its count reaches zero") {
    val b1 = chg((1L, 1L, "solo", 3.0, false))
    val b2 = chg((1L, 2L, "solo", 0.0, true))
    val got = mvOf(Seq(b1, b2))
    assert(got.isEmpty)
  }

  test("out-of-order and duplicate deliveries cancel to a no-op") {
    val b1 = chg((1L, 5L, "a", 50.0, false), (2L, 5L, "a", 60.0, false))
    // stale older versions + an exact duplicate of a delivered row
    val b2 = chg((1L, 3L, "a", 999.0, false), (1L, 5L, "a", 50.0, false),
      (2L, 1L, "b", 999.0, false))
    val got = mvOf(Seq(b1, b2))
    assert(got == Map("a" -> ((2L, 110.0))))
    // a late older insert must not resurrect a deleted key
    val b3 = chg((3L, 9L, "a", 1.0, true))
    val b4 = chg((3L, 2L, "a", 123.0, false))
    assert(mvOf(Seq(b1, b2, b3, b4)) == Map("a" -> ((2L, 110.0))))
  }

  test("streaming deployment: foreachBatch maintains the view over a live stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String, Double, Boolean)]
    var state = MaterializedAgg.emptyState(
      chg().toDF("k", "ver", "g", "v", "del"), col("del"))
    var mv: Option[DataFrame] = None
    val q = input.toDF().toDF("k", "ver", "g", "v", "del")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = MaterializedAgg.step(state, batch,
          Seq("k"), Seq(col("ver")), col("del"))
        state = s.state.localCheckpoint(true)
        mv = Some(MaterializedAgg.mergeMv(mv,
          MaterializedAgg.groupDelta(s.signedDelta, Seq("g"),
            Seq("total" -> col("v"))),
          Seq("g"), Seq("total")).localCheckpoint(true))
      }.start()
    input.addData((1L, 1L, "a", 10.0, false), (2L, 1L, "b", 4.0, false))
    q.processAllAvailable()
    input.addData((1L, 2L, "b", 11.0, false), (2L, 2L, "b", 0.0, true))
    q.processAllAvailable(); q.stop()
    val got = mv.get.select(col("g"), col("n"), col("total"))
      .as[(String, Long, Double)].collect()
      .map { case (g, n, t) => g -> (n, t) }.toMap
    assert(got == Map("b" -> ((1L, 11.0))))
  }

  test("transactional maintenance: exactly-once under batch replay, atomic three-table commit") {
    import graft.sinks.PkTableSink
    val root = TestTmp.dir("mvtx").toString + "/g"
    def apply(b: DataFrame, id: Long) = MaterializedAgg.maintainTx(root, b, id,
      Seq("k"), Seq("ver"), col("del"), Seq("g"),
      Seq("total" -> col("v")), writer = "job1")
    def mv(): Map[String, (Long, Double)] =
      PkTableSink.readTxGroup(spark, root, "mv", chg().toDF("k", "ver", "g", "v", "del"))
        .select(col("g"), col("n"), col("total"))
        .as[(String, Long, Double)].collect()
        .map { case (g, n, t) => g -> (n, t) }.toMap

    assert(apply(chg((1L, 1L, "a", 10.0, false), (2L, 1L, "b", 4.0, false)), 1L))
    assert(apply(chg((1L, 2L, "b", 11.0, false), (2L, 2L, "b", 0.0, true)), 2L))
    assert(mv() == Map("b" -> ((1L, 11.0))))  // a emptied out, tombstoned

    // foreachBatch replay of an already-committed batch is a no-op —
    // the signed delta must not double-apply. The watermark lives in
    // the commit manifest's meta, so the staleness check is pure
    // driver work: the replay must launch ZERO Spark jobs.
    spark.sparkContext.setJobGroup("mv-stale-replay", "stale replay must run no jobs")
    assert(!apply(chg((1L, 2L, "b", 11.0, false), (2L, 2L, "b", 0.0, true)), 2L))
    spark.sparkContext.clearJobGroup()
    assert(spark.sparkContext.statusTracker
      .getJobIdsForGroup("mv-stale-replay").isEmpty)
    assert(mv() == Map("b" -> ((1L, 11.0))))
    // and the watermark is in the manifest meta, not a scanned table
    assert(graft.sinks.TxLog.current(spark, root)
      .flatMap(_.meta.get("wm.job1")).contains("2"))

    // straggler insert of the deleted key: the state tombstone's
    // version wins, view stays consistent with the table
    assert(apply(chg((2L, 1L, "a", 99.0, false)), 3L))
    assert(mv() == Map("b" -> ((1L, 11.0))))

    // and the state table agrees with the view's inputs
    val live = PkTableSink.readTxGroup(spark, root, "state",
      chg().toDF("k", "ver", "g", "v", "del"))
    assert(live.select("k").as[Long].collect().toSet == Set(1L))
  }

  test("corpus-scale: 4 interleaved batches equal the direct aggregate") {
    val q = SparkEntry.queries("cdc_mv_incremental")(spark, sfDir)
      .as[(String, Long, Double)].collect().toSeq
    val e = Tables.events(spark, sfDir)
    val direct = graft.cdc.PkTable.compact(
        e.withColumn("del", col("event_type") === "error"),
        Seq("user_id"), Seq(col("ts"), col("event_id")), col("del"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        graft.functions.Rounding.r(sum("value"), 4).as("total"))
      .orderBy("event_type")
      .as[(String, Long, Double)].collect().toSeq
    assert(q == direct && q.nonEmpty)
  }
}
