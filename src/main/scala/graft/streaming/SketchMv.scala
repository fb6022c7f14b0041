package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sinks.{PkTableSink, TxLog}

/** The transactional SKETCH-COLUMN materialized-view engine — the
  * sketch-agnostic core of [[QskMv]] (percentile compactor) and
  * [[KmvMv]] (bottom-k distinct), mirroring the StarRocks
  * aggregate-table column types (`PERCENTILE`, `HLL`) whose loads
  * fold to mergeable state and whose reads union stored state.
  *
  * The discipline is [[graft.cdc.MaterializedAgg.maintainTx]]'s for
  * the APPEND-ONLY case (mergeable sketches cannot retract, so the
  * feed contract is insert-only — the routine-load event shape):
  *
  *  - each micro-batch folds to ONE bounded state row per touched
  *    (groupCols) key — commit I/O ∝ batch ∪ touched keys, never
  *    history;
  *  - the stored state for a touched key is re-folded with the batch
  *    partial through the caller's MERGE aggregates (associative and
  *    order-free by contract, so distinct batches replay in any order
  *    and converge) and committed with [[PkTableSink.mergeTxGroup]] —
  *    one manifest flips state and watermark atomically;
  *  - exactly-once per `writer` via the `wm.<writer>` manifest meta
  *    key: a replayed/stale `batchId` runs ZERO Spark jobs and
  *    returns false (crash before commit → replay re-applies; after →
  *    replay skips; no partial state is reachable).
  *
  * The sketch flavor enters as two aggregate lists over the SAME
  * output names: `partialAggs` folds raw batch rows to state columns,
  * `mergeAggs` re-folds (stored ∪ partial) state rows keyed by those
  * names. Everything else — watermark, touched-key semi-join, the
  * atomic commit — is flavor-independent and lives here once.
  *
  * Flavor safety: both flavors commit to the same fixed table name,
  * so a QskMv writer pointed at a KmvMv root would silently
  * interleave incompatible sketch encodings. The FIRST commit stamps
  * `sketch.flavor` in the manifest meta; every later maintainTx
  * fails fast on a mismatch instead of corrupting the view.
  */
object SketchMv {

  private val Mv = "mv"
  private val FlavorKey = "sketch.flavor"

  private def wmKey(writer: String) = s"wm.$writer"

  /** Last applied batch id for `writer`, if any. */
  def appliedWatermark(spark: SparkSession, root: String,
                       writer: String): Option[Long] =
    TxLog.current(spark, root).flatMap(_.meta.get(wmKey(writer))).map(_.toLong)

  /** Apply one micro-batch (see object doc). `stateCols` names the
    * outputs both aggregate lists produce, in stored order. */
  def maintainTx(root: String, batch: DataFrame, batchId: Long,
                 groupCols: Seq[String],
                 partialAggs: Seq[Column], mergeAggs: Seq[Column],
                 stateCols: Seq[String], writer: String,
                 gone: String, flavor: String): Boolean = {
    val spark = batch.sparkSession
    val cur0 = TxLog.current(spark, root)
    cur0.foreach { m =>
      m.meta.get(FlavorKey) match {
        case Some(committed) =>
          require(committed == flavor,
            s"sketch MV at $root holds flavor '$committed'; a '$flavor' " +
              "writer would interleave incompatible sketch encodings")
        case None =>
          // a committed root with NO stamp is foreign (or pre-guard):
          // letting the first post-upgrade writer stamp its own flavor
          // would bless a wrong writer and interleave encodings — the
          // exact corruption the guard exists to prevent. Fail and
          // require an explicit migration; only an EMPTY root (no
          // committed manifest at all) may be claimed by a first write.
          throw new IllegalStateException(
            s"sketch MV at $root has committed state but no " +
              s"'$FlavorKey' stamp — foreign or pre-guard root; migrate " +
              "explicitly (re-commit its state with the stamp) before " +
              "writing")
      }
    }
    if (cur0.flatMap(_.meta.get(wmKey(writer))).map(_.toLong)
        .exists(batchId <= _))
      return false
    val gc = groupCols.map(col)
    val partial = batch.groupBy(gc: _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .localCheckpoint(true)
    try {
      // stored state for TOUCHED groups only — an untouched group's
      // row carries forward in its delta dir, unread
      val cur = PkTableSink.readTxGroup(spark, root, Mv,
        partial.withColumn("batch_id", lit(batchId)))
      val touched = partial.select(gc: _*)
      val merged = cur.join(broadcast(touched), groupCols, "left_semi")
        .select((gc ++ stateCols.map(col)): _*)
        .unionByName(partial)
        .groupBy(gc: _*)
        .agg(mergeAggs.head, mergeAggs.tail: _*)
        .withColumn("batch_id", lit(batchId))
        .withColumn(gone, lit(false))
      PkTableSink.mergeTxGroup(spark, root,
        Map(Mv -> PkTableSink.TableBatch(merged, groupCols,
          Seq("batch_id"), gone)),
        writer = writer,
        extraMeta = Map(wmKey(writer) -> batchId.toString,
          FlavorKey -> flavor))
    } finally {
      // the checkpointed partial is consumed entirely by this commit —
      // free its blocks so a long-lived writer (or the bench JVM, which
      // drives many batches across many runs) doesn't accumulate
      // pinned block-manager state one commit at a time. A
      // localCheckpoint'ed frame's blocks live on its LogicalRDD, not
      // in the CacheManager — Dataset.unpersist would be a no-op.
      partial.queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(false)
        case _ => partial.unpersist(false)
      }
    }
    true
  }

  /** The committed view: (groupCols…, stateCols…, batch_id). */
  def readMv(spark: SparkSession, root: String,
             schemaOf: => DataFrame): DataFrame =
    PkTableSink.readTxGroup(spark, root, Mv, schemaOf)
}
