package graft

import org.apache.spark.sql.functions._
import graft.plans.MvRewrite
import graft.plans.MvRewrite.{CountStar, KmvSketchOf}
import graft.streaming.{KmvMv, MvRefresher}

/** streaming.MvRefresher: the async MV refresh WORKER (r15 verdict
  * #5) — a stale publish is refreshed by the scheduled daemon, not by
  * the test driving the loop. */
class MvRefresherSpec extends SparkSpec {
  import spark.implicits._

  private val day = java.sql.Date.valueOf("2024-01-01")
  private def batchDf(ids: Range) =
    ids.map(i => (day, "a", i.toLong)).toDF("day", "event_type", "user_id")
  private val schemaOf = Seq.empty[(String, java.sql.Date, Array[Long], Long, Long)]
    .toDF("event_type", "day", "sk", "n", "batch_id")

  private def mkPublish(src: String, root: String, pub: String): () => Unit =
    () => MvRewrite.registerSketchSnapshot(spark, src,
      KmvMv.readMv(spark, root, schemaOf)
        .select(col("event_type"), col("day"), col("sk"), col("n")),
      pub, Seq("event_type", "day"),
      Map("sk" -> KmvSketchOf("user_id"), "n" -> CountStar),
      mvRoot = Some(root))

  private def scansMv(df: org.apache.spark.sql.DataFrame, mvDir: String): Boolean = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val mvp = new org.apache.hadoop.fs.Path(mvDir).toUri.getPath
    df.queryExecution.optimizedPlan.collect {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.map(_.toUri.getPath)
    }.flatten.exists(_.startsWith(mvp))
  }

  test("runOnce: no-op on a fresh publish, refreshes a stale one, verifies the clear") {
    MvRewrite.clear()
    val tmp = TestTmp.dir("mvrf1")
    val (src, root, pub) = (s"$tmp/src", s"$tmp/mv", s"$tmp/pub")
    val publish = mkPublish(src, root, pub)
    try {
      batchDf(0 until 50).write.parquet(src)
      assert(KmvMv.maintainTx(root, batchDf(0 until 50), 0L,
        Seq("event_type", "day"), col("user_id")))
      publish()
      val regs = Seq(MvRefresher.Refreshable("kmv", pub, publish = publish))
      assert(MvRefresher.runOnce(spark, regs).isEmpty,
        "fresh publish: the worker must not touch it")
      // a second commit flips staleness; one sweep refreshes exactly it
      batchDf(50 until 120).write.mode("append").parquet(src)
      assert(KmvMv.maintainTx(root, batchDf(50 until 120), 1L,
        Seq("event_type", "day"), col("user_id")))
      assert(MvRewrite.publishStale(spark, pub))
      assert(MvRefresher.runOnce(spark, regs) == Seq("kmv"))
      assert(!MvRewrite.publishStale(spark, pub))
      assert(MvRefresher.runOnce(spark, regs).isEmpty, "idempotent once fresh")
    } finally MvRewrite.clear()
  }

  test("Worker daemon: a stale publish is refreshed WITHOUT the test driving the loop") {
    MvRewrite.clear()
    val tmp = TestTmp.dir("mvrf2")
    val (src, root, pub) = (s"$tmp/src", s"$tmp/mv", s"$tmp/pub")
    val publish = mkPublish(src, root, pub)
    val worker = new MvRefresher.Worker(spark,
      Seq(MvRefresher.Refreshable("kmv", pub, publish = publish)),
      pollIntervalMs = 50L)
    try {
      batchDf(0 until 100).write.parquet(src)
      assert(KmvMv.maintainTx(root, batchDf(0 until 100), 0L,
        Seq("event_type", "day"), col("user_id")))
      publish() // generation 1
      worker.start()
      // the stream lands a second batch; the TEST only commits it —
      // the WORKER must notice staleness and re-publish on its own
      batchDf(100 until 250).write.mode("append").parquet(src)
      assert(KmvMv.maintainTx(root, batchDf(100 until 250), 1L,
        Seq("event_type", "day"), col("user_id")))
      assert(worker.awaitRefreshed(1, timeoutMs = 30000L),
        s"worker did not refresh in time; errors: ${worker.errors}")
      assert(!MvRewrite.publishStale(spark, pub))
      // the user's literal SQL now serves the updated counts from the
      // worker-published generation (below k=1024, KMV is exact)
      val q = spark.read.parquet(src)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("d"), count(lit(1)).as("n"))
      assert(scansMv(q, pub), "serving must come from the snapshot")
      val r = q.collect().head
      assert(r.getLong(1) == 250L && r.getLong(2) == 250L,
        s"worker-refreshed snapshot must serve all 250 users, got $r")
      assert(worker.errors.isEmpty, s"worker errors: ${worker.errors}")
    } finally {
      worker.stop()
      MvRewrite.clear()
    }
  }

  test("Worker daemon: survives a failing refresh and keeps polling") {
    MvRewrite.clear()
    val tmp = TestTmp.dir("mvrf3")
    val (src, root, pub) = (s"$tmp/src", s"$tmp/mv", s"$tmp/pub")
    val publish = mkPublish(src, root, pub)
    val failures = new java.util.concurrent.atomic.AtomicInteger(0)
    // first re-publish attempt throws (a transient failure); the
    // worker must record it and succeed on a later tick
    val flaky: () => Unit = () =>
      if (failures.incrementAndGet() == 1)
        throw new RuntimeException("transient publish failure")
      else publish()
    val worker = new MvRefresher.Worker(spark,
      Seq(MvRefresher.Refreshable("kmv", pub, publish = flaky)),
      pollIntervalMs = 50L)
    try {
      batchDf(0 until 40).write.parquet(src)
      assert(KmvMv.maintainTx(root, batchDf(0 until 40), 0L,
        Seq("event_type", "day"), col("user_id")))
      publish()
      worker.start()
      batchDf(40 until 90).write.mode("append").parquet(src)
      assert(KmvMv.maintainTx(root, batchDf(40 until 90), 1L,
        Seq("event_type", "day"), col("user_id")))
      assert(worker.awaitRefreshed(1, timeoutMs = 30000L),
        s"worker did not recover from the transient failure; errors: ${worker.errors}")
      assert(worker.errors.exists(_.getMessage.contains("transient")),
        "the failed tick must be recorded")
      assert(!MvRewrite.publishStale(spark, pub))
    } finally {
      worker.stop()
      MvRewrite.clear()
    }
  }
}
