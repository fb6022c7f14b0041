package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.cdc.Envelope
import graft.streaming.CdcStream

/** Streaming CDC throughput benchmark — the library's analogue of the
  * reference's `benchmark.sh` end-to-end rate tests (insert/update
  * rows/s through MySQL→Debezium→Kafka→StarRocks; see
  * /root/reference/benchmark.sh). Here: envelope JSON files → stream
  * source → unwrap → keyed upsert state → sink, one JSON line with
  * end-to-end rows/s.
  */
object StreamBench {

  /** One measured end-to-end pass (envelope files → stream → unwrap →
    * keyed upsert → noop sink). Returns (rows, seconds); callable from
    * [[Bench]] so the driver's per-round artifact captures the
    * streaming rate, not just self-reported numbers.
    */
  def run(spark: org.apache.spark.sql.SparkSession, sfDir: String): (Long, Double) = {
    val work = TmpSweep.gateTempDir("streambench").toString
    val chg = Tables.events(spark, sfDir).withColumn("op",
      when(col("event_type") === "signup", Envelope.OpCreate)
        .when(col("event_type") === "error", Envelope.OpDelete)
        .otherwise(Envelope.OpUpdate))
    val envelopes = chg.select(Envelope.encode(col("op"),
      (col("ts").cast("double") * 1000).cast("long"),
      Seq(col("event_id"), col("user_id"), col("value")), "testdb", "events").as("value"))
    val n = envelopes.count()
    envelopes.coalesce(8).write.mode("overwrite").text(s"$work/input")

    val payload = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("value", DoubleType)))
    val t0 = System.nanoTime()
    val states = CdcStream.upsertStates(CdcStream.unwrap(
      CdcStream.fileSource(spark, s"$work/input"), "json", payload,
      keyField = "user_id", seqField = "event_id"))
    val q = states.writeStream.format("noop")
      .outputMode("update")
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9
    (n, secs)
  }

  /** Per-row end-to-end latency distribution — the reference's
    * `test_single_row_latency` (benchmark.sh:319): one INSERT in MySQL
    * until the row is queryable in StarRocks, budget 1–15 s
    * (docs/ARCHITECTURE.md:245–255). Here the same edge is one
    * envelope file atomically dropped into the watched directory until
    * the key is visible in the sink's in-memory table, through the
    * full unwrap → keyed-upsert-state pipeline on a short
    * ProcessingTime trigger.
    *
    * Also measures delete propagation (`test_delete_propagation`,
    * benchmark.sh:381): a delete envelope for a live key until its
    * tombstone (deleted=true) is visible downstream.
    *
    * Returns (insert latencies ms, delete latencies ms). The timed
    * loop does only file I/O + sink polls; envelope lines are
    * pre-generated.
    */
  def latencyBench(spark: org.apache.spark.sql.SparkSession,
                   nInserts: Int = 30, nDeletes: Int = 10): (Seq[Double], Seq[Double]) = {
    import org.apache.spark.sql.functions.{col, lit}
    val work = TmpSweep.gateTempDir("latbench")
    val input = work.resolve("input"); java.nio.file.Files.createDirectories(input)
    val stage = work.resolve("stage"); java.nio.file.Files.createDirectories(stage)
    val payload = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("value", DoubleType)))

    def envelopes(op: String, keys: Seq[Long], tsBase: Long): Map[Long, String] = {
      val df = spark.createDataFrame(keys.map(Tuple1(_))).toDF("id")
        .select(col("id"), Envelope.encode(lit(op), (col("id") + tsBase).as("ts"),
          Seq(col("id").as("event_id"), col("id").as("user_id"),
            lit(1.0).as("value")), "testdb", "events").as("json"))
      df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    val keys = (1L to nInserts.toLong).toSeq
    val insEnv = envelopes(Envelope.OpCreate, 0L +: keys, tsBase = 1000000L)
    val delEnv = envelopes(Envelope.OpDelete, keys.take(nDeletes), tsBase = 2000000L)

    def drop(name: String, line: String): Unit = {
      val tmp = stage.resolve(name)
      java.nio.file.Files.writeString(tmp, line + "\n")
      java.nio.file.Files.move(tmp, input.resolve(name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }

    val sink = s"graft_lat_${System.nanoTime()}"
    val states = CdcStream.upsertStates(CdcStream.unwrap(
      CdcStream.fileSource(spark, input.toString), "json", payload,
      keyField = "user_id", seqField = "event_id"))
    // single-row micro-batches: per-batch cost is task launch ×
    // state partitions, so a latency-tier query wants FEW state
    // partitions (conf is captured at query start; the throughput
    // benches keep the session default)
    val spKey = "spark.sql.shuffle.partitions"
    val prevSp = spark.conf.get(spKey)
    spark.conf.set(spKey, "4")
    val q = try {
      states.writeStream.format("memory").queryName(sink)
        .outputMode("update")
        .option("checkpointLocation", work.resolve("ckpt").toString)
        .trigger(Trigger.ProcessingTime("25 milliseconds"))
        .start()
    } finally spark.conf.set(spKey, prevSp)
    try {
      def awaitVisible(filter: org.apache.spark.sql.Column, timeoutMs: Long = 30000): Double = {
        val t0 = System.nanoTime()
        while (spark.table(sink).where(filter).isEmpty) {
          if ((System.nanoTime() - t0) / 1e6 > timeoutMs)
            throw new IllegalStateException("latency probe timed out")
          Thread.sleep(2)
        }
        (System.nanoTime() - t0) / 1e6
      }
      // untimed warm row: batch planning, state store, codegen
      drop("warm", insEnv(0L)); awaitVisible(col("key") === 0L)
      val insLat = keys.map { k =>
        val t0 = System.nanoTime()
        drop(s"i$k", insEnv(k))
        awaitVisible(col("key") === k); (System.nanoTime() - t0) / 1e6
      }
      val delLat = keys.take(nDeletes).map { k =>
        val t0 = System.nanoTime()
        drop(s"d$k", delEnv(k))
        awaitVisible(col("key") === k && col("deleted")); (System.nanoTime() - t0) / 1e6
      }
      (insLat, delLat)
    } finally q.stop()
  }

  /** Concurrent-load benchmark — the reference's `test_concurrent_load`
    * (benchmark.sh:417): multiple load jobs ingesting into ONE primary
    * key table at once. Here `writers` threads each push
    * `batchesPerWriter` disjoint micro-batches through
    * [[graft.sinks.PkTableSink.mergeTx]] on the same table root; the
    * transactional log serializes commits, losers re-merge and retry.
    * Returns (rows ingested, wall seconds, final table rows).
    */
  def concurrentLoad(spark: org.apache.spark.sql.SparkSession, sfDir: String,
                     writers: Int = 2, batchesPerWriter: Int = 4): (Long, Double, Long) = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val root = TmpSweep.gateTempDir("txload").toString + "/t"
    val chg = Tables.events(spark, sfDir).select(
      col("event_id"), col("user_id"), col("ts"), col("value"),
      (col("event_type") === "error").as("del"))
    val total = chg.count()
    val slices = writers * batchesPerWriter
    val t0 = System.nanoTime()
    val fs = (0 until writers).map { w =>
      Future {
        (0 until batchesPerWriter).foreach { b =>
          val slice = chg.where(
            pmod(col("event_id"), lit(slices)) === lit(w * batchesPerWriter + b))
          graft.sinks.PkTableSink.mergeTx(spark, root, slice,
            Seq("user_id"), Seq("ts", "event_id"), "del",
            writer = s"w$w", maxAttempts = 4 * slices)
        }
      }
    }
    Await.result(Future.sequence(fs), 600.seconds)
    val secs = (System.nanoTime() - t0) / 1e9
    val finalRows = graft.sinks.PkTableSink.readTx(spark, root,
      chg.drop("del")).count()
    (total, secs, finalRows)
  }

  def percentile(xs: Seq[Double], p: Double): Double =
    if (xs.isEmpty) -1.0
    else xs.sorted.apply(math.min(xs.size - 1, math.ceil(p * xs.size).toInt - 1).max(0))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.ready(GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt, maxPartitionBytes = "4m").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val (n, secs) = run(spark, sfDir)
    val (ins, del) = latencyBench(spark)
    val (clRows, clSecs, clFinal) = concurrentLoad(spark, sfDir)
    println(s"""{"metric":"stream_cdc_rows_per_sec","value":${(n / secs).toLong},"unit":"rows/sec","rows":$n,"secs":$secs,""" +
      s""""latency_ms":{"p50":${percentile(ins, 0.50)},"p95":${percentile(ins, 0.95)},"p99":${percentile(ins, 0.99)}},""" +
      s""""delete_propagation_ms":{"p50":${percentile(del, 0.50)},"p95":${percentile(del, 0.95)}},""" +
      s""""concurrent_load_rows_per_sec":${(clRows / clSecs).toLong},"concurrent_load_final_rows":$clFinal,"sf":"$sfDir"}""")
    spark.stop()
  }
}
