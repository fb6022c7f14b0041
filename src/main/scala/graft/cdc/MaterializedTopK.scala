package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Incremental TOP-K-PER-GROUP materialized view over a keyed CDC
  * changelog — the materialized top-N the reference keeps warm as a
  * hand-run ranking query against the PK table (monitor.sh's "top
  * customers" checks; StarRocks/ClickHouse serve the same shape as
  * materialized TOPN). Like MIN/MAX ([[MaterializedAgg.mergeMvMinMax]],
  * whose k=1 special case this generalizes), top-k is NOT
  * self-maintainable: retracting a stored member says nothing about
  * which state row moves up to replace it. The maintenance rule keeps
  * the cost at its IVM minimum:
  *
  *  - INSERTS never rescan: the new top-k is a subset of
  *    (stored top-k ∪ inserted rows) — one bounded per-group rank over
  *    ≤ k + batch rows;
  *  - a RETRACTION rescans its group only if the retracted key is a
  *    STORED MEMBER (a below-k retraction cannot change membership);
  *    rescanned groups recompute exactly from the live key-state
  *    restricted to those groups (left-semi join), so the rescan costs
  *    Σ|affected groups|, never the view or the corpus;
  *  - an UPDATE to a member arrives as −member/+new and lands in the
  *    rescan leg; an update to a non-member merges like an insert.
  *
  * Deltas come from [[MaterializedAgg.step]]'s state diff, so
  * out-of-order and duplicate deliveries cancel before they reach the
  * view (the A24/A39 discipline — tombstones stay in the state, a
  * straggler insert loses `latestPerKey`).
  *
  * The view stores (groupCols, keyCols, value) rows — at most k per
  * group; [[rank]] attaches the dense 1..k ordering (value desc, keys
  * asc) at read time.
  */
object MaterializedTopK {

  private[cdc] val Val = "__topk_v"

  /** Advance the view by one [[MaterializedAgg.Step]]. `state` must be
    * the step's NEW key-state (live + tombstones). */
  def mergeTopK(mv: Option[DataFrame], st: MaterializedAgg.Step,
                groupCols: Seq[String], keyCols: Seq[String],
                value: Column, k: Int): DataFrame = {
    require(k >= 1, s"mergeTopK: need k >= 1, got $k")
    val gCols = groupCols.map(col)
    val gkCols = (groupCols ++ keyCols).map(col)
    val wTop = Window.partitionBy(gCols: _*)
      .orderBy(col(Val).desc +: keyCols.map(col(_).asc): _*)
    def topK(df: DataFrame): DataFrame =
      df.withColumn("__rn", row_number().over(wTop))
        .where(col("__rn") <= k).drop("__rn")

    val stored = mv.getOrElse(
      st.state.select(gkCols :+ value.as(Val): _*).limit(0))

    // rescan set: a −1 row whose (group, key) is a stored member —
    // retracting below-k rows cannot change membership
    val rescanG = st.signedDelta.where(col(MaterializedAgg.Sign) === -1)
      .join(stored, groupCols ++ keyCols, "left_semi")
      .select(gCols: _*).distinct()

    // non-rescan groups: stored ∪ inserts, re-ranked (bounded per
    // group by k + batch rows; no key duplicates — a +1 for a stored
    // key implies a −1 for it too, which routed the group to rescan)
    val inserts = st.signedDelta.where(col(MaterializedAgg.Sign) === 1)
      .select(gkCols :+ value.as(Val): _*)
    val merged = topK(stored.unionByName(inserts)
      .join(rescanG, groupCols, "left_anti"))

    // rescanned groups: exact top-k from the live key-state of those
    // groups only
    val rescanned = topK(st.state.where(!col(MaterializedAgg.Del))
      .join(rescanG, groupCols, "left_semi")
      .select(gkCols :+ value.as(Val): _*))

    merged.unionByName(rescanned)
  }

  /** Attach the 1..k rank (value desc, keys asc) to a maintained view. */
  def rank(mv: DataFrame, groupCols: Seq[String], keyCols: Seq[String],
           valueName: String = "value"): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(Val).desc +: keyCols.map(col(_).asc): _*)
    mv.withColumn("rank", row_number().over(w).cast("long"))
      .select((groupCols.map(col) :+ col("rank")) ++ keyCols.map(col) :+
        col(Val).as(valueName): _*)
  }

  /** EXACTLY-ONCE transactional maintenance —
    * [[MaterializedAgg.maintainTx]]'s discipline for the top-k view:
    * key-state, the (groupCols ++ keyCols)-keyed view table, and the
    * per-writer batch watermark commit ATOMICALLY in one
    * [[graft.sinks.PkTableSink.mergeTxGroup]] manifest. A replayed
    * batch (id ≤ the committed watermark) is a driver-side no-op
    * running zero Spark jobs. The view's batch writes only TOUCHED
    * groups: the new top-k rows upsert, and previously-stored members
    * that fell out (demoted by inserts, retracted, or migrated away)
    * tombstone — commit I/O ∝ batch + touched groups' k, never the
    * view. Read the live view with `PkTableSink.readTxGroup(spark,
    * root, "mv", …)` and attach ranks with [[rank]]. */
  def maintainTx(root: String, batch: DataFrame, batchId: Long,
                 keyCols: Seq[String], versionCols: Seq[String],
                 deleteFlag: Column, groupCols: Seq[String], value: Column,
                 k: Int, writer: String): Boolean = {
    import graft.sinks.{PkTableSink, TxLog}
    val spark = batch.sparkSession
    val wmKey = s"wm.$writer"
    val manifest = TxLog.current(spark, root)
    val applied = manifest.flatMap(_.meta.get(wmKey)).map(_.toLong)
    if (applied.exists(batchId <= _)) return false

    // state WITH tombstones (the A24 rule: a deleted key's version
    // must stay visible so a straggler insert loses latestPerKey)
    val state = PkTableSink.readTxGroupAll(spark, root, "state",
      MaterializedAgg.emptyState(batch, deleteFlag), deletedCol = MaterializedAgg.Del)
    val st = MaterializedAgg.step(state, batch, keyCols, versionCols.map(col), deleteFlag)

    // current view restricted to the TOUCHED groups, then the normal
    // merge/rescan rule over exactly those groups
    val gkCols = groupCols ++ keyCols
    val touched = st.signedDelta.select(groupCols.map(col): _*).distinct()
      .localCheckpoint(true)
    val mvSchema = st.state.select(gkCols.map(col) :+ value.as(Val): _*).limit(0)
    // project the stored view down to (group, key, value) — stored
    // rows also carry their commit's batch_id, which must not leak
    // into the merge unions
    val curMv = PkTableSink.readTxGroup(spark, root, "mv", mvSchema)
      .select(gkCols.map(col) :+ col(Val): _*)
      .join(touched, groupCols, "left_semi")
      .localCheckpoint(true) // read twice: inside mergeTopK and for the tombstone diff
    val newRows = mergeTopK(Some(curMv), st, groupCols, keyCols, value, k)
      .localCheckpoint(true)
    val gone = curMv.join(newRows, gkCols, "left_anti")
      .select(gkCols.map(col) :+ col(Val): _*)
    val mvBatch = newRows.withColumn("__mv_gone", lit(false))
      .unionByName(gone.withColumn("__mv_gone", lit(true)))
      .withColumn("batch_id", lit(batchId))
    PkTableSink.mergeTxGroup(spark, root, Map(
      "state" -> PkTableSink.TableBatch(
        batch.withColumn("__state_del", coalesce(deleteFlag, lit(false))),
        keyCols, versionCols, "__state_del"),
      "mv" -> PkTableSink.TableBatch(mvBatch, gkCols, Seq("batch_id"), "__mv_gone")),
      writer = writer,
      extraMeta = Map(wmKey -> batchId.toString))
    Seq(touched, curMv, newRows).foreach(graft.Ckpt.free)
    true
  }

  /** Live ranked view of a [[maintainTx]] lake: (groupCols, rank,
    * keyCols, `valueName`), demoted/retracted members tombstoned out.
    *
    * `schemaOf`: optional example frame supplying the EMPTY-LAKE
    * fallback schema (only its group/key/[[Val]] column types are
    * used; no data is read). Without it a genuinely empty lake falls
    * back to StringType keys / DoubleType value — column names still
    * align but typed consumers of an empty result would see the wrong
    * leaf types (mirrors how maintainTx derives mvSchema from its
    * state). */
  def readTx(spark: org.apache.spark.sql.SparkSession, root: String,
             groupCols: Seq[String], keyCols: Seq[String],
             valueName: String = "value",
             schemaOf: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
    val gkCols = groupCols ++ keyCols
    val empty = schemaOf match {
      case Some(df) => df.select(gkCols.map(col) :+ col(Val): _*).limit(0)
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(gkCols.map(StructField(_, StringType)) :+
          StructField(Val, DoubleType)))
    }
    rank(graft.sinks.PkTableSink.readTxGroup(spark, root, "mv", empty),
      groupCols, keyCols, valueName)
  }

  /** Drive a whole batch sequence; returns the final ranked view
    * (groupCols, rank, keyCols, `valueName`). Same checkpoint
    * discipline as [[MaterializedAgg.maintain]]. */
  def maintain(batches: Seq[DataFrame], keyCols: Seq[String],
               version: Seq[Column], deleteFlag: Column,
               groupCols: Seq[String], value: Column, k: Int,
               valueName: String = "value"): DataFrame = {
    require(batches.nonEmpty, "maintain: no batches")
    var state = MaterializedAgg.emptyState(batches.head, deleteFlag)
    var mv: Option[DataFrame] = None
    batches.foreach { batch =>
      // materialize via the hook: rescan leg and signed delta read the
      // checkpointed successor (see MaterializedAgg.maintain)
      val s = MaterializedAgg.step(state, batch, keyCols, version, deleteFlag,
        materialize = _.localCheckpoint(true))
      val prevState = state
      val prevMv = mv
      state = s.state
      mv = Some(mergeTopK(prevMv, s,
        groupCols, keyCols, value, k).localCheckpoint(true))
      graft.Ckpt.free(prevState)
      prevMv.foreach(graft.Ckpt.free)
    }
    graft.Ckpt.free(state)
    rank(mv.get, groupCols, keyCols, valueName)
  }
}
