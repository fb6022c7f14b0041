package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Kmv

/** Transactional DISTINCT-COUNT sketch materialized view — the
  * [[SketchMv]] flavor for the StarRocks `HLL` aggregate-table column
  * (`hll_hash` on load, `hll_union` / `hll_union_agg` on read), here
  * carried by the repo's KMV bottom-k sketch ([[Kmv]]) instead of
  * HLL: same O(k) mergeable state and union-only algebra, PLUS exact
  * counts below k and the set-expression estimators (∩/∪/Jaccard)
  * over any two stored rows — so the one committed column serves
  * distinct-count rollups AND audience-overlap queries.
  *
  * The classic use: a CDC/event stream lands per-(type, day) sketches
  * of the user-id domain; "distinct users per type this quarter" is a
  * `kmvMerge` over ≤ k longs per stored row, never a re-scan of event
  * history — the 100 TB pre-aggregation shape.
  *
  * Determinism note (stronger than [[QskMv]]): distinct-bottom-k is
  * PARTITION- and BATCH-ORDER free, so the committed sketch after any
  * replay-converged batch sequence is BIT-IDENTICAL to a one-shot
  * sketch of all events, and every estimate served from the MV equals
  * the direct-computation estimate exactly — KmvMvSpec pins array
  * equality, not an error band.
  *
  * Exactly-once, atomic commits, and touched-key I/O bounds are
  * [[SketchMv]]'s contract; the gate query `kmv_mv_rollup` drives
  * three batches + one replayed id end-to-end under the DuckDB oracle.
  */
object KmvMv {

  /** Last applied batch id for `writer`, if any. */
  def appliedWatermark(spark: SparkSession, root: String,
                       writer: String): Option[Long] =
    SketchMv.appliedWatermark(spark, root, writer)

  /** Apply one micro-batch: per-group KMV sketch partials of
    * `idCol`'s 63-bit hash, unioned into the committed view
    * atomically. Returns false (no jobs run) when `batchId` is at or
    * behind the writer's watermark. Call from `foreachBatch`. */
  def maintainTx(root: String, batch: DataFrame, batchId: Long,
                 groupCols: Seq[String], idCol: Column,
                 writer: String = "kmvmv"): Boolean =
    SketchMv.maintainTx(root, batch, batchId, groupCols,
      partialAggs = Seq(Kmv.kmvOf(Kmv.hash63(idCol)).as("sk"),
        count(lit(1)).as("n")),
      mergeAggs = Seq(Kmv.kmvMerge(col("sk")).as("sk"), sum(col("n")).as("n")),
      stateCols = Seq("sk", "n"), writer = writer, gone = "__kmvmv_gone",
      flavor = "kmv")

  /** The committed view: (groupCols…, sk, n, batch_id). */
  def readMv(spark: SparkSession, root: String,
             schemaOf: => DataFrame): DataFrame =
    SketchMv.readMv(spark, root, schemaOf)

  /** Distinct-count rollup over the COMMITTED sketch column: re-group
    * the stored per-key sketches to `rollupCols` and estimate the
    * distinct ids per group — `kmv_union` + the estimator, never
    * touching a raw event. Output: (rollupCols…, n_events, n_keys,
    * du_est). Exact when the group's distinct count < k. */
  def rollup(mv: DataFrame, rollupCols: Seq[String]): DataFrame = {
    val rc = rollupCols.map(col)
    mv.groupBy(rc: _*)
      .agg(Kmv.kmvMerge(col("sk")).as("sk"),
        sum(col("n")).as("n_events"), count(lit(1)).as("n_keys"))
      .select((rc :+ col("n_events") :+ col("n_keys") :+
        Kmv.distinctEst(col("sk")).as("du_est")): _*)
  }
}
