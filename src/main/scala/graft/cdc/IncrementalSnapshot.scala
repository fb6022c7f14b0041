package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sinks.{PkTableSink, TxLog}

/** DBLog-style INCREMENTAL (chunked) RE-SNAPSHOT interleaved with a
  * live changelog — the one genuine CDC-capability gap the reference
  * left open: it pins `snapshot.mode=initial`
  * (debezium-connector.json:6, docs/ARCHITECTURE.md:87), while
  * Debezium 3's headline operational feature is the signal-triggered
  * ad-hoc incremental snapshot (the DBLog watermark algorithm,
  * Andreoni dos Santos & Gruchalski, Netflix 2019): re-snapshot a
  * keyed table WHILE its changelog keeps streaming, for backfill
  * after a connector gap or onboarding a table into a running
  * pipeline — without stopping the stream or locking the source.
  *
  * The algorithm, re-expressed on the transactional lake:
  *
  *  - the source is read in contiguous PK-RANGE CHUNKS
  *    ([[planChunks]]); changelog batches and chunks append to ONE
  *    ordered log (a [[PkTableSink.mergeTxGroup]] table whose version
  *    column is the append sequence — the Kafka-topic model: LAST
  *    APPEND WINS, there is no trustworthy source version on a
  *    snapshot read);
  *  - a chunk is read between a LOW and HIGH watermark of the
  *    changelog; events IN that window may or may not already be
  *    reflected in the read (a torn read — the source moved while the
  *    SELECT ran). The chunk therefore SUPPRESSES every key the
  *    window's events touched ([[appendChunk]]'s anti join): for
  *    those keys the changelog is the authority. Suppression is
  *    load-bearing precisely because order is the authority — the
  *    chunk appends AFTER the window's events, so an unsuppressed
  *    stale row would win;
  *  - keys untouched by the window merge as READ records; any LATER
  *    changelog event supersedes them by sequence, and a read taken
  *    AFTER an earlier event already carries that event's effect, so
  *    both interleavings converge (the DBLog correctness argument);
  *  - chunk completion and changelog progress ride the SAME manifest
  *    flip as the data (`wm.snapshot_chunk` / `wm.changelog` meta on
  *    the transactional commit): a killed snapshot resumes at the
  *    next chunk, and replays of an applied batch/chunk are
  *    watermark-skipped without running jobs.
  *
  * Scale shape (100 TB): a chunk read is one PK-range predicate —
  * pushed down to the parquet/JDBC scan (compose with
  * [[graft.sources.JdbcSnapshot]]'s partitioned range reads for a
  * real re-snapshot source); suppression is an anti join against one
  * BATCH-sized key set (broadcast); commit I/O ∝ chunk rows
  * (merge-on-read deltas). Nothing scales with the table except the
  * number of chunks, which is the knob.
  */
object IncrementalSnapshot {

  /** Append-sequence column — the log's version/order axis. */
  val SeqCol = "__snap_seq"
  private val DelCol = "__snap_del"
  /** The group-table name the ordered log lives under. */
  val Table = "log"
  private val WmChangelog = "wm.changelog"
  private val WmChunk = "wm.snapshot_chunk"

  /** One PK-range chunk: keys in [lo, hi). */
  final case class Chunk(id: Int, lo: Long, hi: Long)

  /** Split the key domain [min, max] into `n` contiguous ranges (the
    * DBLog chunking — ranges, not hashes, so each chunk is ONE
    * pushed-down range scan on a PK-ordered source). */
  def planChunks(min: Long, max: Long, n: Int): Seq[Chunk] = {
    require(n >= 1, "need at least one chunk")
    require(max >= min, s"empty key domain [$min, $max]")
    val span = max - min + 1
    (0 until n).map { i =>
      Chunk(i, min + span * i / n, min + span * (i + 1) / n)
    }.map(c => if (c.id == n - 1) c.copy(hi = max + 1) else c)
  }

  /** Highest applied changelog sequence (restart recovery). */
  def appliedSeq(spark: SparkSession, root: String): Option[Long] =
    TxLog.current(spark, root).flatMap(_.meta.get(WmChangelog)).map(_.toLong)

  /** Highest completed chunk id (restart recovery: resume at +1). */
  def completedChunk(spark: SparkSession, root: String): Option[Int] =
    TxLog.current(spark, root).flatMap(_.meta.get(WmChunk)).map(_.toInt)

  /** Append one changelog batch at sequence `seq`. Returns false (zero
    * jobs) when `seq` is already applied — the replay/restart guard.
    * Within a batch a key must appear at most once (the usual
    * latest-per-key CDC batch contract). */
  def appendBatch(root: String, events: DataFrame, keyCols: Seq[String],
                  deleteFlag: Column, seq: Long,
                  writer: String = "cdc"): Boolean = {
    val spark = events.sparkSession
    if (appliedSeq(spark, root).exists(seq <= _)) return false
    PkTableSink.mergeTxGroup(spark, root, Map(Table -> PkTableSink.TableBatch(
      events.withColumn(DelCol, coalesce(deleteFlag, lit(false)))
        .withColumn(SeqCol, lit(seq)),
      keyCols, Seq(SeqCol), DelCol)),
      writer = writer, extraMeta = Map(WmChangelog -> seq.toString))
    true
  }

  /** Append one snapshot chunk at sequence `seq`: `chunkRows` is the
    * (possibly torn) range read; `windowKeys` are the keys touched by
    * the changelog events in the chunk's low/high watermark window —
    * those keys are SUPPRESSED (the changelog is the authority for
    * them). Returns false (zero jobs) when the chunk is already
    * completed — the resume guard. */
  def appendChunk(root: String, chunkRows: DataFrame, keyCols: Seq[String],
                  windowKeys: DataFrame, chunkId: Int, seq: Long,
                  writer: String = "snapshot"): Boolean = {
    val spark = chunkRows.sparkSession
    if (completedChunk(spark, root).exists(chunkId <= _)) return false
    val survivors = chunkRows.join(
      windowKeys.select(keyCols.map(col): _*).distinct(),
      keyCols, "left_anti")
    PkTableSink.mergeTxGroup(spark, root, Map(Table -> PkTableSink.TableBatch(
      survivors.withColumn(DelCol, lit(false)).withColumn(SeqCol, lit(seq)),
      keyCols, Seq(SeqCol), DelCol)),
      writer = writer, extraMeta = Map(WmChunk -> chunkId.toString))
    true
  }

  /** The converged table state: last-append-wins per key, tombstones
    * dropped (merge-on-read over the committed log). `schemaOf` must
    * carry the payload columns plus [[SeqCol]] — only evaluated before
    * the first commit. */
  def state(spark: SparkSession, root: String,
            schemaOf: => DataFrame): DataFrame =
    PkTableSink.readTxGroup(spark, root, Table, schemaOf).drop(SeqCol)

  /** `foreachBatch` sink for a LIVE Structured Streaming changelog:
    * micro-batch `id` appends at sequence `2·id` — odd sequences are
    * reserved for snapshot chunks interleaving BETWEEN batches (chunk
    * after batch b ⇒ seq `2·b + 1`, window = batch b's keys). A
    * crash-redelivered batch is watermark-skipped, so the ordered log
    * is exactly-once without relying on the stream's own checkpoint. */
  def changelogSink(root: String, keyCols: Seq[String], deleteFlag: Column)
                   (batch: DataFrame, id: Long): Unit = {
    appendBatch(root, batch, keyCols, deleteFlag, seq = 2L * id)
    ()
  }
}
