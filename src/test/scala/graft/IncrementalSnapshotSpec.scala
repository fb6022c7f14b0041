package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.cdc.IncrementalSnapshot

/** DBLog-style chunked re-snapshot (A43): the watermark-window
  * suppression must be LOAD-BEARING (a torn chunk read appended after
  * its in-flight event must never beat it), a killed snapshot must
  * RESUME at the next chunk without re-reading completed ones, and
  * deletes must interleave correctly on every side of a chunk. */
class IncrementalSnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def rows(rs: (Long, Long, Boolean)*): DataFrame =
    rs.toDF("k", "v", "del")

  private def schemaOf: DataFrame =
    Seq.empty[(Long, Long, Long)].toDF("k", "v", IncrementalSnapshot.SeqCol)

  private def state(root: String): Map[Long, Long] =
    IncrementalSnapshot.state(spark, root, schemaOf)
      .select(col("k"), col("v")).as[(Long, Long)].collect().toMap

  test("window suppression is load-bearing: a torn chunk read never beats its in-flight event") {
    // key 1 is updated 10→20 by the in-flight batch; the chunk read is
    // TORN (still shows 10) and appends AFTER the event. With
    // suppression the event stands; the control run WITHOUT the window
    // proves the stale read would have won (order is the authority).
    def run(withWindow: Boolean): Map[Long, Long] = {
      val root = TestTmp.dir("snapw").toString + "/g"
      assert(IncrementalSnapshot.appendBatch(root,
        rows((1L, 20L, false)), Seq("k"), col("del"), seq = 0L))
      val torn = rows((1L, 10L, false), (2L, 7L, false)).drop("del")
      val window = if (withWindow) rows((1L, 20L, false)) else rows()
      assert(IncrementalSnapshot.appendChunk(root, torn, Seq("k"),
        windowKeys = window, chunkId = 0, seq = 1L))
      state(root)
    }
    assert(run(withWindow = true) == Map(1L -> 20L, 2L -> 7L),
      "suppressed: the in-flight event is the authority")
    assert(run(withWindow = false) == Map(1L -> 10L, 2L -> 7L),
      "control: without suppression the stale torn read WOULD win - " +
        "the window dedup is load-bearing, not decorative")
  }

  test("kill/restart resumes at the next chunk; completed work replays as no-ops") {
    val root = TestTmp.dir("snapr").toString + "/g"
    val chunks = IncrementalSnapshot.planChunks(1L, 8L, 4)
    assert(chunks.map(c => (c.lo, c.hi)) == Seq((1L, 3L), (3L, 5L), (5L, 7L), (7L, 9L)))
    val source = rows((1L, 1L, false), (2L, 2L, false), (3L, 3L, false),
      (4L, 4L, false), (5L, 5L, false), (6L, 6L, false), (7L, 7L, false),
      (8L, 8L, false)).drop("del")
    var chunkReads = 0
    def runFrom(firstChunk: Int, until: Int): Unit =
      (firstChunk until until).foreach { i =>
        val ch = chunks(i)
        chunkReads += 1
        assert(IncrementalSnapshot.appendChunk(root,
          source.where(col("k") >= ch.lo && col("k") < ch.hi), Seq("k"),
          windowKeys = rows(), chunkId = i, seq = i.toLong), s"chunk $i")
      }
    runFrom(0, 2) // ...then the process dies
    // a fresh "process" recovers progress from the manifest alone
    assert(IncrementalSnapshot.completedChunk(spark, root).contains(1))
    runFrom(IncrementalSnapshot.completedChunk(spark, root).get + 1, 4)
    assert(chunkReads == 4, "completed chunks must not be re-read on resume")
    // replaying a completed chunk is a watermark no-op, not a double append
    assert(!IncrementalSnapshot.appendChunk(root, source, Seq("k"),
      windowKeys = rows(), chunkId = 2, seq = 2L))
    assert(state(root) == (1L to 8L).map(k => k -> k).toMap)
  }

  test("deletes interleave on every side of a chunk; later updates resurrect") {
    val root = TestTmp.dir("snapd").toString + "/g"
    // batch 0: delete key 1, update key 2 (v=20)
    assert(IncrementalSnapshot.appendBatch(root,
      rows((1L, 0L, true), (2L, 20L, false)), Seq("k"), col("del"), seq = 0L))
    // chunk 0 covers keys 1-3, read AFTER batch 0 applied (key 1 gone,
    // key 2 already carries 20); window empty (batch 0 closed before
    // the chunk opened)
    assert(IncrementalSnapshot.appendChunk(root,
      rows((2L, 20L, false), (3L, 3L, false)).drop("del"), Seq("k"),
      windowKeys = rows(), chunkId = 0, seq = 1L))
    // batch 1 AFTER the chunk: delete key 3 (supersedes its READ),
    // resurrect key 1 (update appended after the tombstone)
    assert(IncrementalSnapshot.appendBatch(root,
      rows((3L, 0L, true), (1L, 11L, false)), Seq("k"), col("del"), seq = 2L))
    assert(state(root) == Map(1L -> 11L, 2L -> 20L))
    assert(IncrementalSnapshot.appliedSeq(spark, root).contains(2L))
  }

  test("chunks interleave with a LIVE streaming changelog; redelivered batches are exactly-once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = TestTmp.dir("snaps").toString + "/g"
    val ckpt = TestTmp.dir("snaps-ck").toString
    val input = MemoryStream[(Long, Long, Boolean)]
    val q = input.toDF().toDF("k", "v", "del").writeStream
      .foreachBatch(IncrementalSnapshot.changelogSink(root, Seq("k"), col("del")) _)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      // micro-batch 0 (seq 0): inserts; key 2 will be in chunk 0's window
      input.addData((1L, 10L, false), (2L, 99L, false))
      q.processAllAvailable()
      assert(IncrementalSnapshot.appliedSeq(spark, root).contains(0L))
      // chunk 0 (seq 1, keys 1-2) read TORN around batch 0: shows key
      // 2's pre-batch value — suppressed via the window
      assert(IncrementalSnapshot.appendChunk(root,
        rows((1L, 10L, false), (2L, 2L, false)).drop("del"), Seq("k"),
        windowKeys = rows((2L, 0L, false)), chunkId = 0, seq = 1L))
      // micro-batch 1 (seq 2): update key 1, delete key 2 — both AFTER
      // the chunk, both must supersede its READ rows
      input.addData((1L, 11L, false), (2L, 0L, true))
      q.processAllAvailable()
      // chunk 1 (seq 3, keys 3-4): fresh read, empty window
      assert(IncrementalSnapshot.appendChunk(root,
        rows((3L, 30L, false), (4L, 40L, false)).drop("del"), Seq("k"),
        windowKeys = rows(), chunkId = 1, seq = 3L))
    } finally q.stop()
    // crash redelivery: the sink re-invoked with an already-applied
    // batch id must be a watermark no-op (exactly-once onto the log)
    IncrementalSnapshot.changelogSink(root, Seq("k"), col("del"))(
      rows((1L, 666L, false)).drop("del").withColumn("del", lit(false)), 1L)
    assert(state(root) == Map(1L -> 11L, 3L -> 30L, 4L -> 40L),
      "stream events beat the torn chunk; delete propagated; redelivery skipped")
  }
}
