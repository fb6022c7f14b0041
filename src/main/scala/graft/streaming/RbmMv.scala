package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Rbm

/** Transactional EXACT-DISTINCT bitmap materialized view — the
  * [[SketchMv]] flavor for the StarRocks `BITMAP` aggregate-table
  * column (`to_bitmap` on load, `bitmap_union` /
  * `bitmap_union_count` on read), completing the committed-MV trio:
  * QskMv (percentile, order-sensitive sketch), KmvMv (approximate
  * distinct + set expressions, O(k) state), RbmMv (EXACT distinct,
  * state ∝ distinct ids — the documented tradeoff that makes it the
  * right column when ids are dense integers and exactness is the
  * contract, e.g. billing-grade distinct users).
  *
  * Exactness changes the gate discipline: unlike the KMV/Qsk gates'
  * bound FLAGS, a bitmap-served `count(DISTINCT id)` equals the raw
  * recount EXACTLY, so the driver gate (`mv_bitmap_rewrite`) compares
  * VALUES hash-for-hash with the oracle — no estimator tolerance
  * anywhere. Bitmap union is associative and order-free, so replays
  * converge and the committed state is independent of batch
  * partitioning (RbmMvSpec pins rollup ≡ direct recount through
  * out-of-order delivery and a replayed batch id).
  *
  * CONTRACT: `idCol` must be non-null integer ids (the bitmap domain).
  * ENFORCED at ingest, not just documented: a null id would otherwise
  * coerce to 0 inside the typed aggregator and a bitmap-served
  * `count(DISTINCT id)` would silently count nulls where the raw
  * aggregate excludes them — invisible divergence under the
  * transparent rewrite. [[maintainTx]] raises on the first null id
  * instead (fail-fast beats a silent filter here: the exactness
  * contract is the whole point of this flavor, and the CDC/event
  * feeds this mirrors — user_id, order keys — are non-null by
  * schema, so a null is feed corruption, not data).
  *
  * Exactly-once, atomic commits, touched-key I/O bounds, and the
  * flavor guard are [[SketchMv]]'s contract (flavor stamp: "rbm").
  */
object RbmMv {

  /** Last applied batch id for `writer`, if any. */
  def appliedWatermark(spark: SparkSession, root: String,
                       writer: String): Option[Long] =
    SketchMv.appliedWatermark(spark, root, writer)

  /** Apply one micro-batch: per-group exact bitmap partials of
    * `idCol`, unioned into the committed view atomically. Returns
    * false (no jobs run) when `batchId` is at or behind the writer's
    * watermark. Call from `foreachBatch`. */
  def maintainTx(root: String, batch: DataFrame, batchId: Long,
                 groupCols: Seq[String], idCol: Column,
                 writer: String = "rbmmv"): Boolean = {
    // non-null ENFORCEMENT (object doc): Coalesce short-circuits, so
    // the assert arm only evaluates (and throws) when the id IS null —
    // zero cost on the contract-respecting path
    val id = idCol.cast("long")
    val checked = coalesce(id, assert_true(id.isNotNull,
      lit("RbmMv: null id at ingest — bitmap MVs require non-null " +
        "integer ids (count(DISTINCT) would diverge)")).cast("long"))
    SketchMv.maintainTx(root, batch, batchId, groupCols,
      partialAggs = Seq(Rbm.rbmOf(checked).as("sk"),
        count(lit(1)).as("n")),
      mergeAggs = Seq(Rbm.rbmUnion(col("sk")).as("sk"), sum(col("n")).as("n")),
      stateCols = Seq("sk", "n"), writer = writer, gone = "__rbmmv_gone",
      flavor = "rbm")
  }

  /** The committed view: (groupCols…, sk, n, batch_id). */
  def readMv(spark: SparkSession, root: String,
             schemaOf: => DataFrame): DataFrame =
    SketchMv.readMv(spark, root, schemaOf)

  /** EXACT distinct-count rollup over the COMMITTED bitmap column:
    * re-group the stored per-key bitmaps to `rollupCols` —
    * `bitmap_union` + cardinality, never touching a raw event.
    * Output: (rollupCols…, n_events, n_keys, n_distinct). */
  def rollup(mv: DataFrame, rollupCols: Seq[String]): DataFrame = {
    val rc = rollupCols.map(col)
    mv.groupBy(rc: _*)
      .agg(Rbm.rbmUnion(col("sk")).as("sk"),
        sum(col("n")).as("n_events"), count(lit(1)).as("n_keys"))
      .select((rc :+ col("n_events") :+ col("n_keys") :+
        Rbm.cardinality(col("sk")).as("n_distinct")): _*)
  }
}
