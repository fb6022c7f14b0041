package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.streaming.{CdcStream, EventStream}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val payload = StructType(Seq(
    StructField("id", LongType), StructField("seq", LongType),
    StructField("v", StringType)))

  private def env(id: Long, seq: Long, v: String, op: String, tsMs: Long): String = {
    val img = s"""{"id":$id,"seq":$seq,"v":"$v"}"""
    val (before, after) = if (op == "d") (img, "null") else ("null", img)
    s"""{"before":$before,"after":$after,"op":"$op","ts_ms":$tsMs}"""
  }

  test("A8: streaming CDC upsert via flatMapGroupsWithState (latest-wins, deletes tombstone)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val changes = CdcStream.unwrap(input.toDF().withColumnRenamed("value", "json"),
      "json", payload, keyField = "id", seqField = "seq")
    val states = CdcStream.upsertStates(changes)
    // data must exist before start: AvailableNow snapshots offsets at start
    input.addData(
      env(1, 1, "a", "c", 100), env(1, 2, "a2", "u", 200),  // key 1 → a2
      env(2, 1, "b", "c", 100), env(2, 2, "b", "d", 300),   // key 2 → deleted
      env(3, 2, "c-new", "u", 500), env(3, 1, "c-old", "u", 400)) // out of order
    val q = states.writeStream.format("memory").queryName("cdc_states")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val out = spark.table("cdc_states")
      .groupBy("key").agg(max_by(struct(col("deleted"), col("payload")),
        struct(col("versionMs"), col("seq"))).as("s"))
      .select(col("key"), col("s.deleted"), col("s.payload"))
      .orderBy("key").collect()
    assert(out.length == 3)
    assert(!out(0).getBoolean(1) && out(0).getString(2).contains("\"a2\""))
    assert(out(1).getBoolean(1)) // key 2 tombstoned
    assert(out(2).getString(2).contains("c-new")) // version order beat arrival order
  }

  test("A8b: second batch updates only changed keys") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val states = CdcStream.upsertStates(CdcStream.unwrap(
      input.toDF().withColumnRenamed("value", "json"), "json", payload, "id", "seq"))
    val q = states.writeStream.format("memory").queryName("cdc_states2")
      .outputMode("update").start()
    input.addData(env(1, 1, "a", "c", 100), env(2, 1, "b", "c", 100))
    q.processAllAvailable()
    input.addData(env(1, 2, "a2", "u", 200),
      env(2, 0, "stale", "u", 50)) // stale update must not re-emit key 2
    q.processAllAvailable(); q.stop()
    val emitted = spark.table("cdc_states2").collect()
    // batch1: keys 1,2; batch2: only key 1 re-emitted
    assert(emitted.count(_.getLong(0) == 1L) == 2)
    assert(emitted.count(_.getLong(0) == 2L) == 1)
  }

  test("A9: watermarked tumbling-window aggregate over an event stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val agg = EventStream.windowedCounts(df, "ts", "event_type", "value",
      window = "1 hour", watermark = "2 hours")
    val q = agg.writeStream.format("memory").queryName("win_agg")
      .outputMode("append").start()
    def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    input.addData((t(0, 10), "click", 1.0), (t(0, 40), "click", 2.0), (t(1, 5), "view", 5.0))
    q.processAllAvailable()
    // advance watermark far enough to close the earlier windows
    input.addData((t(9, 0), "click", 0.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("win_agg")
      .select(date_format(col("window_start"), "HH:mm").as("w"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("w", "event_type").collect()
    assert(rows.exists(r => r.getString(0) == "00:00" && r.getString(1) == "click"
      && r.getLong(2) == 2L && r.getDouble(3) == 3.0))
    assert(rows.exists(r => r.getString(0) == "01:00" && r.getString(1) == "view"
      && r.getLong(2) == 1L))
  }

  test("streaming bitmap distinct: exact per-window distincts, duplicates collapse") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Long)]
    val df = input.toDF().toDF("ts", "event_type", "user_id")
    val agg = EventStream.bitmapDistinctStream(df, "ts", "event_type", "user_id",
      window = "1 hour", watermark = "2 hours")
    val q = agg.writeStream.format("memory").queryName("bm_distinct")
      .outputMode("append").start()
    def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // user 7 appears 3× in the 00:00 click window (twice in one batch,
    // once cross-batch) and again in the 01:00 window — distinct is
    // per WINDOW; ids straddle a 2^16 bucket boundary (65535/65536)
    input.addData((t(0, 5), "click", 7L), (t(0, 10), "click", 7L),
      (t(0, 20), "click", 65535L), (t(0, 30), "click", 65536L),
      (t(0, 40), "view", 7L))
    q.processAllAvailable()
    input.addData((t(0, 50), "click", 7L), (t(1, 10), "click", 7L))
    q.processAllAvailable()
    input.addData((t(9, 0), "click", 0L)) // advance watermark, close windows
    q.processAllAvailable(); q.stop()
    val rows = spark.table("bm_distinct")
      .select(date_format(col("window_start"), "HH:mm").as("w"),
        col("event_type"), col("n_distinct"), col("n"))
      .as[(String, String, Long, Long)].collect().toSet
    assert(rows.contains(("00:00", "click", 3L, 5L))) // 7, 65535, 65536
    assert(rows.contains(("00:00", "view", 1L, 1L)))
    assert(rows.contains(("01:00", "click", 1L, 1L)))
  }

  test("streaming SLIDING bitmap distinct: each event counts once per overlapping window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Long)]
    val df = input.toDF().toDF("ts", "event_type", "user_id")
    val agg = EventStream.bitmapDistinctStream(df, "ts", "event_type", "user_id",
      window = "1 hour", watermark = "2 hours", slide = Some("30 minutes"))
    val q = agg.writeStream.format("memory").queryName("bm_sliding")
      .outputMode("append").start()
    def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // u7 at 00:40 and u8 at 01:10 share ONLY the [00:30,01:30) window;
    // u7 repeated in both its windows stays distinct per window
    input.addData((t(0, 40), "click", 7L), (t(0, 45), "click", 7L),
      (t(1, 10), "click", 8L))
    q.processAllAvailable()
    input.addData((t(9, 0), "click", 0L)) // advance watermark
    q.processAllAvailable(); q.stop()
    val rows = spark.table("bm_sliding")
      .select(date_format(col("window_start"), "HH:mm").as("w"),
        col("event_type"), col("n_distinct"), col("n"))
      .as[(String, String, Long, Long)].collect().toSet
    assert(rows.contains(("00:00", "click", 1L, 2L)), s"got $rows") // u7 only
    assert(rows.contains(("00:30", "click", 2L, 3L)), s"got $rows") // u7 + u8
    assert(rows.contains(("01:00", "click", 1L, 1L)), s"got $rows") // u8 only
  }

  test("streaming windowed percentiles: sketch-state p50 within rank bound, cross-batch + out-of-order") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val agg = EventStream.percentileStream(df, "ts", "event_type", "value",
      q = 0.5, window = "1 hour", watermark = "2 hours")
    val q = agg.writeStream.format("memory").queryName("pct_stream")
      .outputMode("append").start()
    def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // window [00:00,01:00): 1001 values delivered across two batches,
    // second batch out-of-order (earlier timestamps than the first)
    val w0 = (0 until 1001).map(i => (t(0, 1 + (i % 55)), "click", i.toDouble))
    val (b1, b2) = w0.splitAt(600)
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2.reverse: _*) // out-of-order arrival
    input.addData((t(1, 10), "click", 9999.0)) // second window
    q.processAllAvailable()
    input.addData((t(9, 0), "click", 0.0)) // advance watermark, close windows
    q.processAllAvailable(); q.stop()
    val rows = spark.table("pct_stream")
      .select(date_format(col("window_start"), "HH:mm").as("w"),
        col("event_type"), col("p_est"), col("n"))
      .as[(String, String, Double, Long)].collect()
    val first = rows.find(r => r._1 == "00:00" && r._2 == "click").get
    assert(first._4 == 1001L)
    // exact values are 0..1000 → true median 500; sketch rank bound 3%
    assert(math.abs(first._3 - 500.0) <= 0.03 * 1001 + 1,
      s"windowed p50 ${first._3} too far from 500")
    val second = rows.find(r => r._1 == "01:00" && r._2 == "click").get
    assert(second._3 == 9999.0 && second._4 == 1L)
  }

  test("streaming dedup: re-deliveries within the watermark are dropped, state bounded") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    // dedupStream = dropDuplicatesWithinWatermark: exact dedup whose
    // state expires with the watermark (a bare dropDuplicates grows
    // its key set forever — an OOM at crawl scale)
    val df = EventStream.dedupStream(input.toDF().toDF("ts", "doc_id"),
      idCol = "doc_id", tsCol = "ts", watermark = "1 hour")
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val q = df.writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append").start()
    input.addData((t(1), 1L), (t(2), 2L), (t(2), 1L)) // same-batch replay of 1
    q.processAllAvailable()
    input.addData((t(3), 2L), (t(4), 3L)) // cross-batch replay of 2
    q.processAllAvailable(); q.stop()
    val ids = spark.table("stream_dedup").select("doc_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("session windows: events split by inactivity gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // user 1: two bursts an hour apart → two sessions (30 min gap)
    input.addData((t(0, 0), 1L), (t(0, 10), 1L), (t(1, 30), 1L), (t(9, 0), 2L))
    val agg = graft.streaming.EventStream.sessionCounts(
      input.toDF().toDF("ts", "user_id"), "ts", "user_id")
    val q = agg.writeStream.format("memory").queryName("sessions")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val sessions = spark.table("sessions").where(col("user_id") === 1L).collect()
    assert(sessions.length == 2)
    assert(sessions.map(_.getAs[Long]("n_events")).sorted.toSeq == Seq(1L, 2L))
  }

  test("stream-stream time-bound join correlates two feeds with bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(java.sql.Timestamp, Long)]
    val buys = MemoryStream[(java.sql.Timestamp, Long)]
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    clicks.addData((t(1), 1L), (t(5), 2L))
    buys.addData((t(10), 1L), (t(50), 2L)) // 2's purchase is outside the 15-min bound
    val joined = graft.streaming.EventStream.timeBoundJoin(
      clicks.toDF().toDF("cts", "user_id"), buys.toDF().toDF("bts", "user_id"),
      "user_id", "cts", "bts", bound = "15 minutes")
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("ssjoin").collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("user_id") == 1L)
  }

  test("keyed upsert state runs on the RocksDB state store (large-state path)") {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[String]
      input.addData(env(1, 1, "a", "c", 10), env(1, 2, "a2", "u", 20), env(2, 1, "b", "c", 10))
      val states = CdcStream.upsertStates(CdcStream.unwrap(
        input.toDF().withColumnRenamed("value", "json"), "json", payload, "id", "seq"))
      val q = states.writeStream.format("memory").queryName("rocks_states")
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
      val out = spark.table("rocks_states")
        .groupBy("key").agg(max_by(col("payload"), struct(col("versionMs"), col("seq"))).as("p"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out(1L).contains("a2") && out(2L).contains("\"b\""))
    } finally {
      prev match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("Monitor reports rows and state for an active query") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    input.addData(env(1, 1, "a", "c", 10), env(2, 1, "b", "c", 10))
    val states = CdcStream.upsertStates(CdcStream.unwrap(
      input.toDF().withColumnRenamed("value", "json"), "json", payload, "id", "seq"))
    val q = states.writeStream.format("memory").queryName("monitored")
      .outputMode("update").start()
    q.processAllAvailable()
    val st = graft.streaming.Monitor.status(q)
    q.stop()
    assert(st.name == "monitored" && st.batchId >= 0)
    assert(st.numInputRows == 2 && st.stateRows == 2)
  }

  test("error accounting: corrupt envelope lines are counted per batch, good rows flow") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    input.addData(
      env(1, 1, "a", "c", 100), env(2, 1, "b", "c", 100),
      "CORRUPT{not json", """{"no_op_field": true}""",
      env(3, 1, "c", "c", 100))
    val changes = CdcStream.unwrapWithErrors(
      input.toDF().withColumnRenamed("value", "json"), "json", payload, "id", "seq")
    val q = CdcStream.upsertStates(changes).writeStream.format("memory")
      .queryName("err_accounted").outputMode("update").start()
    q.processAllAvailable()
    val st = graft.streaming.Monitor.status(q)
    q.stop()
    assert(st.errorRows == 2, s"expected 2 error rows, got $st")
    assert(st.goodRows == 3)
    assert(spark.table("err_accounted").count() == 3)
    // file/memory sources report no row offsets → lag unknown, not 0
    assert(st.sourceLagRows == -1L)
  }

  test("kafka lag math: sum of latest-minus-end across topic partitions") {
    import graft.streaming.Monitor
    val end = """{"cdc.shop.orders":{"0":100,"1":250},"cdc.shop.customers":{"0":40}}"""
    val latest = """{"cdc.shop.orders":{"0":180,"1":250},"cdc.shop.customers":{"0":90}}"""
    assert(Monitor.kafkaLagRows(end, latest) == 80 + 0 + 50)
    // caught-up consumer
    assert(Monitor.kafkaLagRows(latest, latest) == 0)
    // file-source style offsets (not topic->partition maps) → unknown
    assert(Monitor.kafkaLagRows("""{"logOffset":7}""", """{"logOffset":9}""") == -1)
    assert(Monitor.kafkaLagRows("", "") == -1)
  }

  test("routine-load lifecycle: pause holds position, resume continues exactly-once") {
    import graft.streaming.RoutineLoadControl
    val dir = TestTmp.dir("rlsrc").toString
    val out = TestTmp.dir("rlout").toString + "/t"
    val ckpt = TestTmp.dir("rlckpt").toString
    def write(f: String, lines: String*) = java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, f), lines.mkString("\n"))
    write("b0.json", env(1, 1, "a", "c", 100), env(2, 1, "b", "c", 100))

    // factory contract: same checkpoint + exactly-once file sink
    val job = RoutineLoadControl("orders_load") {
      CdcStream.unwrap(CdcStream.fileSource(spark, dir), "json", payload, "id", "seq")
        .select(col("key"), col("seq"), col("payload"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .start()
    }
    assert(job.state == RoutineLoadControl.NeedSchedule)
    job.start()
    job.active.get.processAllAvailable()
    assert(spark.read.parquet(out).count() == 2)
    assert(job.show()._1 == "RUNNING")

    // PAUSE: new files land while the job is down — no progress
    job.pause()
    assert(job.state == RoutineLoadControl.Paused)
    assert(job.active.isEmpty)
    write("b1.json", env(3, 1, "c", "c", 200), env(1, 2, "a2", "u", 300))
    Thread.sleep(200)
    assert(spark.read.parquet(out).count() == 2, "paused job made progress")
    // ALTER requires PAUSED and swaps the definition for the restart
    job.alter {
      CdcStream.unwrap(CdcStream.fileSource(spark, dir), "json", payload, "id", "seq")
        .select(col("key"), col("seq"), col("payload"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .option("maxFilesPerTrigger", "1")
        .start()
    }

    // RESUME: continues from the checkpoint — every envelope exactly once
    job.resume()
    job.active.get.processAllAvailable()
    val rows = spark.read.parquet(out).select("key", "seq")
      .as[(Long, Long)].collect().toSeq
    assert(rows.size == 4, s"expected 4 rows exactly-once, got $rows")
    assert(rows.distinct.size == 4)
    assert(rows.toSet == Set((1L, 1L), (2L, 1L), (3L, 1L), (1L, 2L)))

    // STOP is terminal
    job.stop()
    assert(job.state == RoutineLoadControl.Stopped)
    intercept[IllegalArgumentException](job.resume())
  }

  test("D4: file-based CDC stream source feeds the same pipeline") {
    val dir = TestTmp.dir("cdcsrc").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "b0.json"),
      Seq(env(7, 1, "x", "c", 10), env(7, 2, "x2", "u", 20)).mkString("\n"))
    val states = CdcStream.upsertStates(CdcStream.unwrap(
      CdcStream.fileSource(spark, dir), "json", payload, "id", "seq"))
    val q = states.writeStream.format("memory").queryName("cdc_file")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("cdc_file").orderBy(col("versionMs").desc).collect()
    assert(out.nonEmpty && out.head.getAs[String]("payload").contains("x2"))
  }

  test("streaming funnel equals the batch funnel under out-of-order cross-batch delivery") {
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("signup", "click", "purchase")
    val w = 86400000000L // 1 day in micros
    def ev(u: Long, t: String, et: String) =
      (u, java.sql.Timestamp.valueOf(t), et)
    // u1 completes the funnel but its ANCHOR arrives LAST (the late
    // earlier-signup case that chain-tip-only state gets wrong:
    // the d2 signup anchors first, then the d1 signup re-anchors and
    // pulls the d1 click+purchase into range);
    // u2 only ever signs up; u3's purchase is outside the window
    val all = Seq(
      ev(1, "2024-01-02 09:00:00", "signup"),
      ev(1, "2024-01-01 10:00:00", "click"),
      ev(1, "2024-01-01 11:00:00", "purchase"),
      ev(1, "2024-01-01 09:00:00", "signup"), // late anchor, last batch
      ev(2, "2024-01-01 09:00:00", "signup"),
      ev(3, "2024-01-01 09:00:00", "signup"),
      ev(3, "2024-01-03 09:00:00", "purchase"))
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val depths = EventStream.funnelDepthStream(
      input.toDF().toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "event_type", steps, w)
    val q = depths.toDF("user_id", "depth")
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("update").start()
    for (batch <- all.grouped(2)) {
      input.addData(batch: _*); q.processAllAvailable()
    }
    q.stop()
    // last emitted depth per key
    val got = spark.table("funnel_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .zipWithIndex.groupBy(_._1._1).view
      .mapValues(_.maxBy(_._2)._1._2).toMap
    val want = graft.ops.Funnel.depthFirst(
        all.toDF("user_id", "ts", "event_type"),
        keyCol = col("user_id"), tsCol = col("ts"), typeCol = col("event_type"),
        steps = steps, windowMicros = w, dedup = false)
      .as[(Long, Long)].collect().toMap
    assert(got == want, s"streaming=$got batch=$want")
    assert(want == Map(1L -> 3L, 2L -> 1L, 3L -> 1L))
  }

  test("streaming funnel dedup mode matches the batch kernel") {
    implicit val sqlCtx = spark.sqlContext
    def ev(u: Long, t: String, et: String) = (u, java.sql.Timestamp.valueOf(t), et)
    // u1: second signup lands between click and purchase → dedup kills
    // step 3 (depth 2); non-dedup still reaches 3
    val all = Seq(
      ev(1, "2024-01-01 09:00:00", "signup"),
      ev(1, "2024-01-01 10:00:00", "click"),
      ev(1, "2024-01-01 10:30:00", "signup"),
      ev(1, "2024-01-01 11:00:00", "purchase"))
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val depths = EventStream.funnelDepthStream(
      input.toDF().toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "event_type", Seq("signup", "click", "purchase"),
      86400000000L, dedup = true)
    val q = depths.toDF("user_id", "depth")
      .writeStream.format("memory").queryName("funnel_dedup_stream")
      .outputMode("update").start()
    all.foreach { e => input.addData(e); q.processAllAvailable() }
    q.stop()
    val last = spark.table("funnel_dedup_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1))).lastOption
    assert(last.contains((1L, 2L)), s"dedup mode should stop at depth 2: $last")
  }

  test("streaming sequence count equals the batch fold under out-of-order delivery") {
    implicit val sqlCtx = spark.sqlContext
    def ev(u: Long, t: String, id: Long, et: String) =
      (u, java.sql.Timestamp.valueOf(t), id, et)
    // u1's OPENS arrive after its closes: in arrival order the closes
    // find nothing armed (running count would stay 0), but re-folding
    // the time-sorted buffer pairs S@9→P@10 and S@11→P@12 → 2.
    // u2 exercises the S S P collapse; the click is invisible.
    val all = Seq(
      ev(1, "2024-01-01 10:00:00", 2L, "purchase"),
      ev(1, "2024-01-01 12:00:00", 4L, "purchase"),
      ev(1, "2024-01-01 09:00:00", 1L, "signup"), // late open, later batch
      ev(1, "2024-01-01 11:00:00", 3L, "signup"),
      ev(2, "2024-01-01 09:00:00", 5L, "signup"),
      ev(2, "2024-01-01 09:30:00", 6L, "click"),
      ev(2, "2024-01-01 10:00:00", 7L, "signup"),
      ev(2, "2024-01-01 11:00:00", 8L, "purchase"))
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val counts = EventStream.sequenceCountStream(
      input.toDF().toDF("user_id", "ts", "event_id", "event_type"),
      "user_id", "ts", "event_id", "event_type", "signup", "purchase")
    val q = counts.toDF("user_id", "n")
      .writeStream.format("memory").queryName("seq_count_stream")
      .outputMode("update").start()
    for (batch <- all.grouped(2)) {
      input.addData(batch: _*); q.processAllAvailable()
    }
    q.stop()
    val got = spark.table("seq_count_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .zipWithIndex.groupBy(_._1._1).view
      .mapValues(_.maxBy(_._2)._1._2).toMap
    val want = graft.ops.Funnel.sequenceCount(
        all.toDF("user_id", "ts", "event_id", "event_type"),
        keyCol = col("user_id"), tsCol = col("ts"), tieCol = col("event_id"),
        typeCol = col("event_type"),
        openType = "signup", closeType = "purchase")
      .select(col("key"), col("n_matches")).as[(Long, Long)].collect().toMap
    assert(got == want, s"streaming=$got batch=$want")
    assert(want == Map(1L -> 2L, 2L -> 1L))
  }

  test("event-time TTL evicts funnel state by the DATA's clock, not wall time") {
    // a multi-year backfill replayed in seconds: processing-time TTL
    // would never fire here — the whole replay is one wall-clock
    // instant — but the watermark advances with the events, so a key
    // idle for > TTL of EVENT time restarts from scratch
    implicit val sqlCtx = spark.sqlContext
    def ev(u: Long, t: String, et: String) = (u, java.sql.Timestamp.valueOf(t), et)
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val depths = EventStream.funnelDepthStream(
      input.toDF().toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "event_type", Seq("signup", "click", "purchase"),
      windowMicros = 3600L * 1000000,
      stateTtlMs = 60000L, // 60 s of EVENT time
      eventTimeWatermark = Some("10 seconds"))
    val q = depths.toDF("user_id", "depth")
      .writeStream.format("memory").queryName("funnel_ettl")
      .outputMode("update").start()
    // u1 reaches depth 2, then goes idle in event time
    input.addData(ev(1, "2024-01-01 09:00:00", "signup"),
      ev(1, "2024-01-01 09:00:01", "click"))
    q.processAllAvailable()
    // u2 advances the watermark far past u1's newest event + TTL …
    input.addData(ev(2, "2024-01-01 10:00:00", "signup")); q.processAllAvailable()
    // … and the next batch fires u1's event-time timeout (eviction)
    input.addData(ev(2, "2024-01-01 10:00:05", "click")); q.processAllAvailable()
    // u1 reappears: with state evicted this is a FRESH depth-1 funnel;
    // had state survived, the old signup anchor would keep depth 2 and
    // nothing would be emitted (update mode suppresses no-change)
    input.addData(ev(1, "2024-01-01 10:00:20", "signup")); q.processAllAvailable()
    q.stop()
    val emits = spark.table("funnel_ettl").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(emits.take(1) == Seq((1L, 2L)), s"pre-idle depth: $emits")
    assert(emits.last == (1L, 1L),
      s"u1 should restart at depth 1 after event-time eviction: $emits")
  }

  test("event-time TTL evicts sequence-count state on watermark passage") {
    implicit val sqlCtx = spark.sqlContext
    def ev(u: Long, t: String, id: Long, et: String) =
      (u, java.sql.Timestamp.valueOf(t), id, et)
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val counts = EventStream.sequenceCountStream(
      input.toDF().toDF("user_id", "ts", "event_id", "event_type"),
      "user_id", "ts", "event_id", "event_type", "signup", "purchase",
      stateTtlMs = 60000L, eventTimeWatermark = Some("10 seconds"))
    val q = counts.toDF("user_id", "n")
      .writeStream.format("memory").queryName("seq_ettl")
      .outputMode("update").start()
    input.addData(ev(1, "2024-01-01 09:00:00", 1L, "signup"),
      ev(1, "2024-01-01 09:01:00", 2L, "purchase"))
    q.processAllAvailable() // u1 count = 1
    input.addData(ev(2, "2024-01-01 10:00:00", 3L, "signup")); q.processAllAvailable()
    input.addData(ev(2, "2024-01-01 10:00:05", 4L, "signup")); q.processAllAvailable()
    // an unpaired close after eviction: fresh state folds to 0 and
    // EMITS it (0 ≠ initial -1); surviving state would have stayed at
    // 1 (S@9:00 already consumed by P@9:01, lone P pairs nothing) and
    // emitted nothing
    input.addData(ev(1, "2024-01-01 10:30:00", 5L, "purchase")); q.processAllAvailable()
    q.stop()
    val emits = spark.table("seq_ettl").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(emits.take(1) == Seq((1L, 1L)), s"pre-idle count: $emits")
    assert(emits.last == (1L, 0L),
      s"u1 should restart at count 0 after event-time eviction: $emits")
  }

  test("streaming bounded top-k keeps exact leaders across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Double, Long)]
    val top = input.toDF().toDF("score", "id")
      .select(graft.functions.TopKBy.topKBy(col("score"), col("id"), 3).as("top"))
    val q = top.writeStream.format("memory").queryName("topk_stream")
      .outputMode("complete").start()
    input.addData((1.0, 1L), (5.0, 2L), (3.0, 3L)); q.processAllAvailable()
    input.addData((9.0, 4L), (2.0, 5L), (5.0, 6L)); q.processAllAvailable()
    q.stop()
    val got = spark.table("topk_stream").as[Seq[(Double, Long)]].head()
    // ties at 5.0 break to the smaller id
    assert(got == Seq((9.0, 4L), (5.0, 2L), (5.0, 6L)), s"got $got")
  }

  test("streaming Misra-Gries sketch keeps the heavy-hitter guarantee across micro-batches") {
    // the MG Aggregator's buffer lives in the streaming state store,
    // so the sketch accumulates over the whole stream: items heavy
    // over ALL batches must be present even if light within each
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val sketch = input.toDF()
      .select(graft.functions.HeavyHitters.mgSketch(col("value"), 5).as("mg"))
    val q = sketch.writeStream.format("memory").queryName("mg_stream")
      .outputMode("complete").start()
    // hot0 is spread across batches (40 per batch, 120 total of 245:
    // > n/6 ≈ 41); tail items churn through the counters
    for (b <- 0 until 3) {
      input.addData(Seq.fill(40)("hot0") ++ (1 to 15).map(i => s"tail-$b-$i"): _*)
      q.processAllAvailable()
    }
    q.stop()
    val mg = spark.table("mg_stream").as[Map[String, Long]].head()
    assert(mg.size <= 5 && mg.contains("hot0"),
      s"cross-batch heavy item missing from streaming sketch: $mg")
    val n = 3 * (40 + 15)
    assert(mg("hot0") >= 120L - n / 6 && mg("hot0") <= 120L)
  }

  test("A30: sharded streaming heavy hitters — per-shard MG bound holds across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val k = 4
    val shards = 2
    val out = EventStream.heavyHittersStream(
      input.toDF().withColumnRenamed("value", "item"), "item", k, shards)
    val q = out.writeStream.format("memory").queryName("hh_stream")
      .outputMode("update").start()
    val batch1 = Seq.fill(30)("a") ++ Seq.fill(20)("b") ++
      ('c' to 'j').flatMap(ch => Seq.fill(2)(ch.toString))
    val batch2 = Seq.fill(25)("z") ++ Seq.fill(10)("a")
    input.addData(batch1: _*); q.processAllAvailable()
    input.addData(batch2: _*); q.processAllAvailable()
    q.stop()
    // newest sketch per shard
    val latest = spark.table("hh_stream").as[(Int, Map[String, Long], Long)]
      .collect().groupBy(_._1).map { case (_, rs) => rs.maxBy(_._3) }.toSeq
    assert(latest.map(_._1).toSet.subsetOf((0 until shards).toSet))
    // replicate the item-hash sharding to get exact per-shard truth
    val all = batch1 ++ batch2
    val shardOf = all.distinct.toDF("item")
      .select(col("item"), pmod(hash(col("item")), lit(shards)).cast("int").as("s"))
      .as[(String, Int)].collect().toMap
    val exact = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    latest.foreach { case (shard, counters, n) =>
      val mine = exact.filter { case (it, _) => shardOf(it) == shard }
      assert(n == mine.values.sum, s"shard $shard n=$n vs ${mine.values.sum}")
      val bound = n / (k + 1)
      mine.foreach { case (it, c) =>
        if (c > bound) {
          assert(counters.contains(it), s"heavy '$it' ($c > $bound) absent in shard $shard")
          assert(counters(it) <= c && counters(it) >= c - bound,
            s"'$it' estimate ${counters(it)} outside [${c - bound}, $c]")
        }
      }
      assert(counters.size <= k)
    }
    // the true heavies of this workload all survived somewhere
    val kept = latest.flatMap(_._2.keys).toSet
    assert(Set("a", "b", "z").subsetOf(kept), s"heavies lost: $kept")
  }

  test("A33: streaming join-MV maintenance from one multi-table CDC feed") {
    implicit val sqlCtx = spark.sqlContext
    import graft.cdc.MaterializedJoin
    // one topic carries both tables' changes (the single-connector
    // multi-table Debezium shape); foreachBatch splits by table and
    // advances the join MV incrementally — no batch re-joins history
    val input = MemoryStream[(String, Long, Long, String, Long, Boolean)]
    val feed = input.toDF().toDF("tbl", "k", "fk", "payload", "ver", "del")
    val protoL = Seq.empty[(Long, Long, Long, Boolean)].toDF("okey", "ckey", "ov", "odel")
    val protoR = Seq.empty[(Long, String, Long, Boolean)].toDF("ckey", "nm", "cv", "cdel")
    var stateL = MaterializedJoin.emptyState(protoL, col("odel"))
    var stateR = MaterializedJoin.emptyState(protoR, col("cdel"))
    var mv: Option[org.apache.spark.sql.DataFrame] = None
    val outCols = Seq("okey", "ckey", "nm")
    val q = feed.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val bl = batch.where(col("tbl") === "ord")
          .select(col("k").as("okey"), col("fk").as("ckey"),
            col("ver").as("ov"), col("del").as("odel"))
        val br = batch.where(col("tbl") === "cust")
          .select(col("k").as("ckey"), col("payload").as("nm"),
            col("ver").as("cv"), col("del").as("cdel"))
        val st = MaterializedJoin.step(
          stateL, bl, Seq("okey"), Seq(col("ov")), col("odel"),
          stateR, br, Seq("ckey"), Seq(col("cv")), col("cdel"),
          joinL = Seq("ckey"), joinR = Seq("ckey"), outCols = outCols)
        stateL = st.stateL.localCheckpoint(true)
        stateR = st.stateR.localCheckpoint(true)
        mv = Some(MaterializedJoin.mergeMv(mv, st.delta, outCols).localCheckpoint(true))
        ()
      }.start()
    // batch 1: order arrives BEFORE its customer exists
    input.addData(("ord", 1L, 10L, "", 1L, false)); q.processAllAvailable()
    assert(mv.get.count() == 0, "dangling fact must not join yet")
    // batch 2: the dim lands → the old fact joins; plus a second order
    input.addData(("cust", 10L, 0L, "alice", 1L, false),
      ("ord", 2L, 10L, "", 1L, false))
    q.processAllAvailable()
    assert(mv.get.select(col("okey"), col("nm")).as[(Long, String)].collect().toSet ==
      Set((1L, "alice"), (2L, "alice")))
    // batch 3: dim rename fans out; order 1 deleted
    input.addData(("cust", 10L, 0L, "alicia", 2L, false),
      ("ord", 1L, 10L, "", 2L, true))
    q.processAllAvailable(); q.stop()
    val fin = mv.get.select(col("okey"), col("nm")).as[(Long, String)].collect().toSet
    assert(fin == Set((2L, "alicia")), s"final MV: $fin")
  }

  test("A34: streaming ingest dedup against the persisted transactional LSH index") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.LshIndex
    import graft.sinks.TxLog
    // the crawl front door at index scale: each micro-batch PROBES the
    // persisted index (cost ∝ batch, never corpus), novel docs flow
    // downstream AND extend the index as a delta commit; near-dups of
    // any EARLIER batch are dropped. In-batch exact re-delivery is
    // C28's dropDuplicatesWithinWatermark — this is the cross-batch,
    // near-duplicate, restart-surviving layer.
    val root = TestTmp.dir("slsh").toString + "/idx"
    val input = MemoryStream[(Long, String)]
    val passed = scala.collection.mutable.ArrayBuffer[Long]()
    val q = input.toDF().toDF("id", "text").writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (TxLog.current(spark, root).isEmpty) {
          LshIndex.build(batch, col("id"), col("text"), root)
          passed ++= batch.select(col("id")).as[Long].collect()
        } else {
          // the probe's signature-agreement ESTIMATE has binomial
          // noise around the true jaccard (no exact verify inside the
          // index), so the drop threshold sits under the dedup target
          val dups = LshIndex.probe(batch, col("id"), col("text"), root,
              thresholdNum = 3, thresholdDen = 4)
            .select(col("new_id")).distinct()
          val novel = batch.join(dups, batch("id") === dups("new_id"), "left_anti")
            .localCheckpoint(true)
          if (novel.count() > 0)
            LshIndex.add(novel, col("id"), col("text"), root)
          passed ++= novel.select(col("id")).as[Long].collect()
        }
        ()
      }.start()
    val a = "the quick brown fox jumps over the lazy dog again and again " +
      "while the patient crane waits beside the quiet river watching every " +
      "small fish drift slowly past the mossy stones today"
    input.addData((1L, a),
      (2L, "completely different content about spark engines and shuffles"))
    q.processAllAvailable()
    // near-dup of doc 1 from the PREVIOUS batch (one word changed in a
    // 32-word doc: true jaccard ~0.93) + one novel doc
    input.addData(
      (3L, a.stripSuffix("today") + "tomorrow"),
      (4L, "a third unrelated document mentioning bitmaps and zone maps"))
    q.processAllAvailable()
    // exact re-delivery of doc 1's content much later still dedups
    input.addData((5L, a)); q.processAllAvailable()
    q.stop()
    assert(passed.toSet == Set(1L, 2L, 4L), s"passed: $passed")
    // the index grew by exactly the novel docs
    assert(LshIndex.count(spark, root) == 3)
  }

  test("A36: streaming embedding ingest dedup against the persisted graph-ANN index") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.GraphIndex
    import graft.streaming.VectorIngest
    // the dense-vector front door: micro-batches of (id, embedding)
    // probe the committed graph index; near-dups of any EARLIER batch
    // (by cosine) and id redeliveries are dropped; novel vectors flow
    // downstream AND extend the index as one delta commit
    val root = TestTmp.dir("ving").toString + "/idx"
    val input = MemoryStream[(Long, Array[Double])]
    val passed = scala.collection.mutable.ArrayBuffer[Long]()
    val q = input.toDF().toDF("id", "vec").writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val novel = VectorIngest.ingestTx(root, batch, col("id"), col("vec"))
        passed ++= novel.select(col("id")).as[Long].collect()
        ()
      }.start()
    val e1 = Array(1.0, 0.0, 0.0, 0.0)
    val e2 = Array(0.0, 1.0, 0.0, 0.0)
    val e3 = Array(0.0, 0.0, 1.0, 0.0)
    input.addData((1L, e1), (2L, e2))
    q.processAllAvailable()
    // batch 2: id 3 is a near-dup of vector 1 from the PREVIOUS batch
    // (cos ≈ 0.9988 ≥ 0.995) + one genuinely novel direction
    input.addData((3L, Array(1.0, 0.05, 0.0, 0.0)), (4L, e3))
    q.processAllAvailable()
    // batch 3: id 1 REDELIVERED (membership, not similarity — the
    // search excludes self-matches, the liveIds anti-join catches it)
    // and an exact content copy of vector 2 under a fresh id (cos 1.0)
    input.addData((1L, e1), (5L, e2))
    q.processAllAvailable()
    q.stop()
    assert(passed.toSet == Set(1L, 2L, 4L), s"passed: $passed")
    // the index grew by exactly the novel vectors
    assert(GraphIndex.count(spark, root) == 3)
    // and serves them: nearest committed neighbor of e2's direction
    val hit = GraphIndex.search(spark, root,
        Seq((9L, Array(0.0, 0.9, 0.1, 0.0))).toDF("id", "vec"),
        col("id"), col("vec"), k = 1)
      .select(col("nid")).as[Long].collect()
    assert(hit.toSeq == Seq(2L), s"hit: ${hit.toSeq}")
  }

  test("A29: streaming enrichment re-reads the PK dim per batch; upserts become visible") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sinks.{PkTableSink, TableStats}
    import org.apache.spark.sql.types._
    val dimRoot = TestTmp.dir("dim").toString + "/t"
    val dimSchema = StructType(Seq(StructField("cust", LongType),
      StructField("ver", LongType), StructField("tier", StringType),
      StructField("del", BooleanType)))
    val input = MemoryStream[Long]
    val facts = input.toDF().withColumnRenamed("value", "cust_id")
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Long, String)]()
    val q = CdcPipeline.toEnrichedSink(facts, dimRoot, "cust_id", "cust", dimSchema,
      (df, bid) => seen ++= df.select(col("cust_id"), col("tier")).collect()
        .map(r => (bid, r.getLong(0), Option(r.getString(1)).getOrElse("<none>"))))
      .start()
    // batch -1 equivalent: dim root has NO committed version at all —
    // facts must pass through with null dim columns (the advertised
    // late-dimension contract), not die on a zero-column frame
    input.addData(9L); q.processAllAvailable()
    PkTableSink.mergeTx(spark, dimRoot,
      Seq((1L, 1L, "gold", false)).toDF("cust", "ver", "tier", "del"),
      Seq("cust"), Seq("ver"), "del", writer = "w")
    TableStats.analyzeTx(spark, dimRoot)
    input.addData(1L, 2L); q.processAllAvailable()
    // dimension moves BETWEEN batches: cust 2 appears, cust 1 upgrades
    PkTableSink.mergeTx(spark, dimRoot,
      Seq((2L, 1L, "silver", false), (1L, 2L, "platinum", false))
        .toDF("cust", "ver", "tier", "del"),
      Seq("cust"), Seq("ver"), "del", writer = "w")
    input.addData(1L, 2L); q.processAllAvailable()
    q.stop()
    val byBatch = seen.groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    assert(byBatch(0L) == Map(9L -> "<none>"),
      s"pre-bootstrap batch must null-passthrough: ${byBatch.get(0L)}")
    assert(byBatch(1L) == Map(1L -> "gold", 2L -> "<none>"),
      s"batch 1 enriched wrong: ${byBatch(1L)}") // late dim → null passthrough, not a drop
    assert(byBatch(2L) == Map(1L -> "platinum", 2L -> "silver"),
      s"batch 2 must see the between-batch upsert: ${byBatch(2L)}")
  }
}
