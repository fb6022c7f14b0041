package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Qsk

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
  * delivery. The flavor-independent machinery (watermark, touched-key
  * semi-join, atomic commit) lives in [[SketchMv]], shared with the
  * distinct-count twin [[KmvMv]].
  */
object QskMv {

  /** Last applied batch id for `writer`, if any. */
  def appliedWatermark(spark: SparkSession, root: String,
                       writer: String): Option[Long] =
    SketchMv.appliedWatermark(spark, root, writer)

  /** Apply one micro-batch: fold to per-group sketch partials, union
    * into the committed view, commit atomically. Returns false (no
    * jobs run) when `batchId` is at or behind the writer's watermark.
    * Call from `foreachBatch`. */
  def maintainTx(root: String, batch: DataFrame, batchId: Long,
                 groupCols: Seq[String], valueCol: Column,
                 writer: String = "qskmv"): Boolean =
    SketchMv.maintainTx(root, batch, batchId, groupCols,
      partialAggs = Seq(Qsk.qskOf(valueCol).as("sk"), count(lit(1)).as("n")),
      mergeAggs = Seq(Qsk.qskMerge(col("sk")).as("sk"), sum(col("n")).as("n")),
      stateCols = Seq("sk", "n"), writer = writer, gone = "__qskmv_gone",
      flavor = "qsk")

  /** The committed view: (groupCols…, sk, n, batch_id). */
  def readMv(spark: SparkSession, root: String,
             schemaOf: => DataFrame): DataFrame =
    SketchMv.readMv(spark, root, schemaOf)

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
