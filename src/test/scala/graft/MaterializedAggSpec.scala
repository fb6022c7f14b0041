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

  // ---- MIN/MAX maintenance (not self-maintainable: a retraction of
  // the stored extremum forces a group rescan of the live key-state)

  private def mvMinMax(batches: Seq[DataFrame]): Map[String, (Long, Double, Double, Double)] =
    MaterializedAgg.maintainMinMax(batches, keyCols = Seq("k"),
        version = Seq(col("ver")), deleteFlag = col("del"),
        groupCols = Seq("g"), sums = Seq("total" -> col("v")),
        exts = Seq(MaterializedAgg.Extremum("vmin", col("v"), isMin = true),
          MaterializedAgg.Extremum("vmax", col("v"), isMin = false)))
      .select(col("g"), col("n"), col("total"), col("vmin"), col("vmax"))
      .as[(String, Long, Double, Double, Double)].collect()
      .map { case (g, n, t, lo, hi) => g -> ((n, t, lo, hi)) }.toMap

  private def recomputeMinMax(all: DataFrame): Map[String, (Long, Double, Double, Double)] =
    graft.cdc.PkTable.compact(all, Seq("k"), Seq(col("ver")), col("del"))
      .groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("total"),
        min("v").as("vmin"), max("v").as("vmax"))
      .as[(String, Long, Double, Double, Double)].collect()
      .map { case (g, n, t, lo, hi) => g -> ((n, t, lo, hi)) }.toMap

  test("min/max: deleting the group minimum rescans to the surviving rows") {
    val b1 = chg((1L, 1L, "a", 1.0, false), (2L, 1L, "a", 5.0, false),
      (3L, 1L, "a", 9.0, false), (4L, 1L, "b", 2.0, false))
    // retract the CURRENT min of a (k=1, v=1.0) — the stored vmin is
    // now stale; only a rescan of a's live rows can find 5.0
    val b2 = chg((1L, 2L, "a", 0.0, true))
    val got = mvMinMax(Seq(b1, b2))
    assert(got("a") == ((2L, 14.0, 5.0, 9.0)))
    assert(got("b") == ((1L, 2.0, 2.0, 2.0))) // untouched group keeps its extrema
    assert(got == recomputeMinMax(b1.unionByName(b2)))
  }

  test("min/max: deleting the max, updating the min in place, and migrating a key") {
    val b1 = chg((1L, 1L, "a", 1.0, false), (2L, 1L, "a", 5.0, false),
      (3L, 1L, "a", 9.0, false))
    val b2 = chg((3L, 2L, "a", 0.0, true),   // retract the max
      (1L, 2L, "a", 4.0, false),             // the min moves UP in place
      (2L, 2L, "b", 5.0, false))             // and the middle key migrates a → b
    val got = mvMinMax(Seq(b1, b2))
    // a keeps only k=1@4.0 — every stored extremum was invalidated
    assert(got("a") == ((1L, 4.0, 4.0, 4.0)))
    assert(got("b") == ((1L, 5.0, 5.0, 5.0)))
    assert(got == recomputeMinMax(b1.unionByName(b2)))
  }

  test("min/max: pure inserts merge monotonically; interior deletes keep extrema") {
    val b1 = chg((1L, 1L, "a", 3.0, false), (2L, 1L, "a", 7.0, false))
    val b2 = chg((3L, 1L, "a", 1.0, false), (4L, 1L, "a", 9.0, false)) // widen both ends
    val b3 = chg((3L, 2L, "a", 1.0, false), (5L, 1L, "a", 5.0, false)) // interior insert + dup-ish update
    val b4 = chg((2L, 2L, "a", 0.0, true))  // interior delete: 7 is neither min nor max
    val got = mvMinMax(Seq(b1, b2, b3, b4))
    assert(got("a") == ((4L, 18.0, 1.0, 9.0)))
    assert(got == recomputeMinMax(Seq(b2, b3, b4).foldLeft(b1)(_ unionByName _)))
  }

  test("streaming deployment: foreachBatch maintains min/max through extremum deletes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val exts = Seq(MaterializedAgg.Extremum("vmin", col("v"), isMin = true),
      MaterializedAgg.Extremum("vmax", col("v"), isMin = false))
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
        mv = Some(MaterializedAgg.mergeMvMinMax(mv, s.copy(state = state),
          Seq("g"), Seq("total" -> col("v")), exts).localCheckpoint(true))
      }.start()
    input.addData((1L, 1L, "a", 10.0, false), (2L, 1L, "a", 3.0, false))
    q.processAllAvailable()
    // retract the live minimum (k=2 @ 3.0) AND push the max up — the
    // micro-batch must rescan a's survivors, not keep the stale 3.0
    input.addData((2L, 2L, "a", 0.0, true), (3L, 1L, "a", 20.0, false))
    q.processAllAvailable(); q.stop()
    val got = mv.get.select(col("g"), col("n"), col("total"), col("vmin"), col("vmax"))
      .as[(String, Long, Double, Double, Double)].collect()
      .map { case (g, n, t, lo, hi) => g -> ((n, t, lo, hi)) }.toMap
    assert(got == Map("a" -> ((2L, 30.0, 10.0, 20.0))))
  }

  test("transactional min/max: exactly-once replay, extremum-delete rescan, emptied-group tombstone") {
    import graft.sinks.PkTableSink
    val root = TestTmp.dir("mmtx").toString + "/g"
    val exts = Seq(MaterializedAgg.Extremum("vmin", col("v"), isMin = true),
      MaterializedAgg.Extremum("vmax", col("v"), isMin = false))
    def apply(b: DataFrame, id: Long) = MaterializedAgg.maintainMinMaxTx(root, b, id,
      Seq("k"), Seq("ver"), col("del"), Seq("g"),
      Seq("total" -> col("v")), exts, writer = "job1")
    def mv(): Map[String, (Long, Double, Double, Double)] =
      PkTableSink.readTxGroup(spark, root, "mv",
          chg().toDF("k", "ver", "g", "v", "del").groupBy("g")
            .agg(count(lit(1)).as("n"), sum("v").as("total"),
              min("v").as("vmin"), max("v").as("vmax")))
        .select(col("g"), col("n"), col("total"), col("vmin"), col("vmax"))
        .as[(String, Long, Double, Double, Double)].collect()
        .map { case (g, n, t, lo, hi) => g -> ((n, t, lo, hi)) }.toMap

    assert(apply(chg((1L, 1L, "a", 1.0, false), (2L, 1L, "a", 5.0, false),
      (10L, 1L, "b", 2.0, false)), 1L))
    assert(mv() == Map("a" -> ((2L, 6.0, 1.0, 5.0)), "b" -> ((1L, 2.0, 2.0, 2.0))))

    // retract the stored minimum AND push the max in one batch — the
    // commit must rescan a's survivors; b is untouched
    assert(apply(chg((1L, 2L, "a", 0.0, true), (3L, 1L, "a", 9.0, false)), 2L))
    assert(mv() == Map("a" -> ((2L, 14.0, 5.0, 9.0)), "b" -> ((1L, 2.0, 2.0, 2.0))))

    // replay of a committed batch: zero Spark jobs, view unchanged
    spark.sparkContext.setJobGroup("mm-stale-replay", "stale replay must run no jobs")
    assert(!apply(chg((1L, 2L, "a", 0.0, true), (3L, 1L, "a", 9.0, false)), 2L))
    spark.sparkContext.clearJobGroup()
    assert(spark.sparkContext.statusTracker
      .getJobIdsForGroup("mm-stale-replay").isEmpty)
    assert(mv() == Map("a" -> ((2L, 14.0, 5.0, 9.0)), "b" -> ((1L, 2.0, 2.0, 2.0))))

    // the last key of b deletes — the group must tombstone out
    assert(apply(chg((10L, 2L, "b", 0.0, true)), 3L))
    assert(mv() == Map("a" -> ((2L, 14.0, 5.0, 9.0))))
  }

  test("min/max matches a full recompute on a randomized changelog") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 400).map { i =>
      (rnd.nextInt(40).toLong, i.toLong, "g" + rnd.nextInt(5),
        rnd.nextInt(1000) / 10.0, rnd.nextInt(8) == 0)
    }
    val batches = rows.grouped(100).map(r => chg(r: _*)).toSeq
    // sums accumulate in different orders between the incremental and
    // the recomputed path — compare them at 6dp; min/max stay exact
    def r6(m: Map[String, (Long, Double, Double, Double)]) =
      m.view.mapValues { case (n, t, lo, hi) =>
        (n, math.rint(t * 1e6) / 1e6, lo, hi) }.toMap
    val got = mvMinMax(batches)
    val want = recomputeMinMax(batches.reduce(_ unionByName _))
    assert(r6(got) == r6(want) && got.nonEmpty)
  }
}
