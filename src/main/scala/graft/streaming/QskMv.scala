package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Qsk
import graft.sinks.{PkTableSink, TxLog}

/** Transactional PERCENTILE-SKETCH materialized view — the write-path
  * completion of the A35 streaming percentile kernel: a CDC/event
  * stream lands per-group [[Qsk]] compactor sketches in a PK lake
  * table, and B69-shape percentile rollups read the COMMITTED sketch
  * column instead of the raw event history (the StarRocks
  * `PERCENTILE` aggregate-table column: `percentile_hash` on load,
  * `percentile_union` on read).
  *
  * Maintenance is the [[graft.cdc.MaterializedAgg.maintainTx]]
  * discipline for the APPEND-ONLY case (sketches cannot retract, so
  * the feed contract is insert-only — exactly the routine-load event
  * shape; keyed upsert/delete feeds belong to MaterializedAgg's
  * signed arithmetic):
  *
  *  - each micro-batch folds to ONE bounded sketch partial per
  *    touched (groupCols) key — commit I/O ∝ batch ∪ touched keys,
  *    never history;
  *  - the stored sketch for a touched key is UNIONED with the batch
  *    partial (Qsk merge is associative and order-free, so replays of
  *    distinct batches in any order converge) and committed with
  *    [[PkTableSink.mergeTxGroup]] — one manifest flips state and
  *    watermark atomically;
  *  - exactly-once per `writer` via the `wm.<writer>` manifest meta
  *    key: a replayed/stale `batchId` runs ZERO Spark jobs and
  *    returns false (crash before commit → replay re-applies; after →
  *    replay skips; no partial state is reachable).
  *
  * QskMvSpec pins the end-to-end contract: stream → foreachBatch →
  * committed sketches → [[rollup]] ≡ the one-shot batch recompute
  * over all events, including through a mid-stream duplicate
  * delivery.
  */
object QskMv {

  private val Mv = "mv"
  private val Gone = "__qskmv_gone"

  private def wmKey(writer: String) = s"wm.$writer"

  /** Last applied batch id for `writer`, if any. */
  def appliedWatermark(spark: SparkSession, root: String,
                       writer: String): Option[Long] =
    TxLog.current(spark, root).flatMap(_.meta.get(wmKey(writer))).map(_.toLong)

  /** Apply one micro-batch: fold to per-group sketch partials, union
    * into the committed view, commit atomically. Returns false (no
    * jobs run) when `batchId` is at or behind the writer's watermark.
    * Call from `foreachBatch`. */
  def maintainTx(root: String, batch: DataFrame, batchId: Long,
                 groupCols: Seq[String], valueCol: Column,
                 writer: String = "qskmv"): Boolean = {
    val spark = batch.sparkSession
    if (appliedWatermark(spark, root, writer).exists(batchId <= _))
      return false
    val gc = groupCols.map(col)
    val partial = batch.groupBy(gc: _*)
      .agg(Qsk.qskOf(valueCol).as("sk"), count(lit(1)).as("n"))
      .localCheckpoint(true)
    // stored sketches for TOUCHED groups only — an untouched group's
    // row carries forward in its delta dir, unread
    val cur = PkTableSink.readTxGroup(spark, root, Mv,
      partial.withColumn("batch_id", lit(batchId)))
    val touched = partial.select(gc: _*)
    val merged = cur.join(broadcast(touched), groupCols, "left_semi")
      .select((gc :+ col("sk") :+ col("n")): _*)
      .unionByName(partial)
      .groupBy(gc: _*)
      .agg(Qsk.qskMerge(col("sk")).as("sk"), sum(col("n")).as("n"))
      .withColumn("batch_id", lit(batchId))
      .withColumn(Gone, lit(false))
    PkTableSink.mergeTxGroup(spark, root,
      Map(Mv -> PkTableSink.TableBatch(merged, groupCols,
        Seq("batch_id"), Gone)),
      writer = writer,
      extraMeta = Map(wmKey(writer) -> batchId.toString))
    true
  }

  /** The committed view: (groupCols…, sk, n, batch_id). */
  def readMv(spark: SparkSession, root: String,
             schemaOf: => DataFrame): DataFrame =
    PkTableSink.readTxGroup(spark, root, Mv, schemaOf)

  /** B69-shape rollup over the COMMITTED sketch column: re-group the
    * stored per-key sketches to `rollupCols` and emit one estimate
    * per quantile — `percentile_union` + extraction, never touching a
    * raw event. Output: (rollupCols…, n_events, n_keys,
    * p<q*100>_est…). */
  def rollup(mv: DataFrame, rollupCols: Seq[String],
             qs: Seq[Double]): DataFrame = {
    val rc = rollupCols.map(col)
    val aggs = qs.map(q =>
        Qsk.qskMergeQuantile(col("sk"), q)
          .as(s"p${math.round(q * 100)}_est")) :+
      sum(col("n")).as("n_events") :+ count(lit(1)).as("n_keys")
    mv.groupBy(rc: _*).agg(aggs.head, aggs.tail: _*)
  }
}
