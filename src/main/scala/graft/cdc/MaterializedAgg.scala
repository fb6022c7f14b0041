package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental materialized AGGREGATE view over a keyed CDC changelog
  * — the StarRocks materialized-view analogue (the reference keeps
  * hand-run aggregate queries warm against the PK table;
  * create-starrocks-tables.sh + monitor.sh's count reconciliation):
  * the view tracks `GROUP BY g: count, sum(v)` over the LIVE latest
  * state of every key, and each batch updates it with signed deltas
  * instead of a full recompute.
  *
  * Mechanism (sign-based retraction, the classic incremental
  * view-maintenance construction — Flink retract streams / DBSP):
  * a batch changes some keys' latest rows; for each touched key the
  * OLD live row (if any) enters the delta with sign −1 and the NEW
  * live row (if any) with sign +1. Aggregating the signed delta by
  * group yields per-group adjustments (Σsign for count, Σsign·v for
  * sums) that merge into the stored view. Group-changing updates move
  * a key between groups via the same −1/+1 pair; deletes retract
  * without inserting.
  *
  * Deltas are computed as a STATE DIFF (old latest-per-key vs new
  * latest-per-key on the touched keys) rather than from the raw
  * change rows, so out-of-order and duplicate deliveries are
  * harmless: a stale version loses `latestPerKey` and produces a
  * −row/+row pair that cancels to zero. Tombstones stay in the state
  * (the multi-writer rule from [[PkTable.latestPerKey]]), so a late
  * older insert cannot resurrect a deleted key's contribution.
  *
  * Scale shape: each step is two hash aggregations over
  * state ∪ batch (the state merge and the group delta) plus a
  * broadcast-sized semi-join on the touched keys — commit work is
  * proportional to the batch and the touched keys, never to the
  * view's history. The MV itself stays group-cardinality-sized.
  */
object MaterializedAgg {

  private[cdc] val Sign = "__mv_sign"
  private[cdc] val Del = "__mv_del"

  /** One maintenance step's outputs: the successor key-state and the
    * signed row delta (old live rows −1, new live rows +1, only for
    * keys the batch touched). */
  final case class Step(state: DataFrame, signedDelta: DataFrame)

  /** Empty key-state with the right schema for `step`. */
  def emptyState(batch: DataFrame, deleteFlag: Column): DataFrame =
    batch.withColumn(Del, coalesce(deleteFlag, lit(false))).limit(0)

  /** Advance the key-state by one batch and emit the signed delta.
    * The caller should checkpoint/persist `state` between steps — it
    * is referenced twice (as the old image and inside the successor).
    *
    * `materialize` (default identity) is applied to the successor
    * state BEFORE the signed delta is built over it: a caller whose
    * downstream reads the new state several times (every N-way delta
    * term in [[MaterializedJoin.stepN]] does) passes
    * `_.localCheckpoint(true)` so the full-state merge runs ONCE
    * instead of once per consumer — semantics identical either way. */
  def step(state: DataFrame, batch: DataFrame, keyCols: Seq[String],
           version: Seq[Column], deleteFlag: Column,
           materialize: DataFrame => DataFrame = identity): Step = {
    val b = PkTable.latestPerKey(
      batch.withColumn(Del, coalesce(deleteFlag, lit(false))), keyCols, version)
    val newState = materialize(
      PkTable.latestPerKey(state.unionByName(b), keyCols, version))
    val touched = b.select(keyCols.map(col): _*)
    def liveTouched(df: DataFrame) =
      df.join(touched, keyCols, "left_semi").where(!col(Del))
    Step(newState,
      liveTouched(state).withColumn(Sign, lit(-1L))
        .unionByName(liveTouched(newState).withColumn(Sign, lit(1L))))
  }

  /** Per-group adjustment of a signed delta: `n` (Σsign) plus
    * Σ sign·expr for each named sum. */
  def groupDelta(signedDelta: DataFrame, groupCols: Seq[String],
                 sums: Seq[(String, Column)]): DataFrame =
    signedDelta.groupBy(groupCols.map(col): _*)
      .agg(sum(col(Sign)).as("n"),
        sums.map { case (n, c) => sum(col(Sign) * c).as(n) }: _*)

  /** Merge a group delta into the view; groups whose count reaches
    * zero vanish (all their keys deleted or migrated away). */
  def mergeMv(mv: Option[DataFrame], delta: DataFrame, groupCols: Seq[String],
              sumNames: Seq[String]): DataFrame = {
    val unioned = mv.map(_.unionByName(delta)).getOrElse(delta)
    unioned.groupBy(groupCols.map(col): _*)
      .agg(sum(col("n")).as("n"), sumNames.map(n => sum(col(n)).as(n)): _*)
      .where(col("n") > 0)
  }

  /** EXACTLY-ONCE transactional maintenance for the streaming
    * deployment (foreachBatch): key-state and the view commit
    * ATOMICALLY in one [[graft.sinks.PkTableSink.mergeTxGroup]]
    * manifest, with the per-writer batch watermark riding in the SAME
    * manifest's meta map (`wm.<writer>`). foreachBatch replays a batch
    * after a crash — and a signed delta is NOT idempotent (re-applying
    * doubles it) — so the watermark decides: `batchId ≤` the committed
    * watermark means the manifest landed and the replay is a no-op
    * (returns false). Either the crash happened before the commit
    * (nothing landed, replay re-applies cleanly) or after (everything
    * landed, replay skips) — no partial state is reachable because
    * state, view, and watermark flip in one manifest. The watermark
    * check is a driver-side manifest read: a stale replay runs ZERO
    * Spark jobs, and each live batch saves the 1-row commits-table
    * scan+write the pre-meta protocol paid. Lakes written by that
    * older protocol (a `commits` table, no meta key) are honored via a
    * one-time fallback scan; their next commit upgrades them to meta.
    *
    * Single-writer per `writer` id (the routine-load shape: one job
    * owns one view); concurrent DIFFERENT writers are serialized by
    * the commit protocol but must partition the key space.
    *
    * Read the live view with
    * `PkTableSink.readTxGroup(spark, root, "mv", …)` — groups whose
    * count reached zero are tombstoned out.
    */
  def maintainTx(root: String, batch: DataFrame, batchId: Long,
                 keyCols: Seq[String], versionCols: Seq[String], deleteFlag: Column,
                 groupCols: Seq[String], sums: Seq[(String, Column)],
                 writer: String): Boolean = {
    import graft.sinks.{PkTableSink, TxLog}
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val spark = batch.sparkSession
    val sumNames = sums.map(_._1)
    val wmKey = s"wm.$writer"
    val manifest = TxLog.current(spark, root)
    val applied: Option[Long] = manifest.flatMap(_.meta.get(wmKey)).map(_.toLong)
      .orElse(manifest.filter(_.tables.contains("commits")).flatMap { _ =>
        // pre-meta lake: one fallback scan of the 1-row-per-writer
        // commits table; the next commit writes the meta key
        val r = PkTableSink.readTxGroup(spark, root, "commits",
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            StructType(Seq(StructField("writer_id", StringType),
              StructField("batch_id", LongType)))))
          .where(col("writer_id") === writer)
          .agg(max(col("batch_id"))).collect()(0)
        if (r.isNullAt(0)) None else Some(r.getLong(0))
      })
    if (applied.exists(batchId <= _)) return false

    // state WITH tombstones: a deleted key's version must stay visible
    // so a straggler insert loses latestPerKey here exactly as it does
    // in the stored table — view and table can never diverge
    val state = PkTableSink.readTxGroupAll(spark, root, "state",
      emptyState(batch, deleteFlag), deletedCol = Del)
    val s = step(state, batch, keyCols, versionCols.map(col), deleteFlag)
    val delta = groupDelta(s.signedDelta, groupCols, sums)
      .localCheckpoint(true)
    // new rows for TOUCHED groups only: current view restricted to the
    // delta's groups, merged additively; n = 0 becomes a tombstone
    val curMv = PkTableSink.readTxGroup(spark, root, "mv", delta)
    val touched = delta.select(groupCols.map(col): _*)
    val newMv = mergeMvAllowZero(
        curMv.join(touched, groupCols, "left_semi"), delta, groupCols, sumNames)
      .withColumn("batch_id", lit(batchId))
      .withColumn("__mv_gone", col("n") <= 0)
    PkTableSink.mergeTxGroup(spark, root, Map(
      "state" -> PkTableSink.TableBatch(
        batch.withColumn("__state_del", coalesce(deleteFlag, lit(false))),
        keyCols, versionCols, "__state_del"),
      "mv" -> PkTableSink.TableBatch(newMv, groupCols, Seq("batch_id"), "__mv_gone")),
      writer = writer,
      extraMeta = Map(wmKey -> batchId.toString))
    true
  }

  /** [[mergeMv]] but keeping zero-count groups (the caller tombstones
    * them instead of dropping the rows). Shared with
    * [[MaterializedJoin.maintainAggTx]]. */
  private[cdc] def mergeMvAllowZero(mv: DataFrame, delta: DataFrame,
                               groupCols: Seq[String], sumNames: Seq[String]): DataFrame =
    mv.unionByName(delta, allowMissingColumns = true)
      .select((groupCols.map(col) :+ col("n")) ++ sumNames.map(col): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("n")).as("n"), sumNames.map(n => sum(col(n)).as(n)): _*)

  /** Drive a whole batch sequence: returns the final view
    * (groupCols, n, named sums). Convenience for queries/specs; a
    * streaming deployment calls [[step]]/[[groupDelta]]/[[mergeMv]]
    * from foreachBatch with the state in a PK lake table — or
    * [[maintainTx]] for the exactly-once transactional variant.
    */
  def maintain(batches: Seq[DataFrame], keyCols: Seq[String],
               version: Seq[Column], deleteFlag: Column,
               groupCols: Seq[String], sums: Seq[(String, Column)]): DataFrame = {
    require(batches.nonEmpty, "maintain: no batches")
    var state = emptyState(batches.head, deleteFlag)
    var mv: Option[DataFrame] = None
    batches.foreach { batch =>
      // materialize via step's hook so the signed delta reads the
      // CHECKPOINTED successor (checkpointing after the fact left the
      // delta on the lazy merge plan — the view's job then re-ran the
      // full state merge every round; r17 optimization, guide §1.2).
      // The checkpoint still bounds lazy-plan depth across steps and
      // pins the state each side of the diff reads the same snapshot of
      val s = step(state, batch, keyCols, version, deleteFlag,
        materialize = _.localCheckpoint(true))
      val prevState = state
      val prevMv = mv
      state = s.state
      mv = Some(mergeMv(mv, groupDelta(s.signedDelta, groupCols, sums),
        groupCols, sums.map(_._1)).localCheckpoint(true))
      // both successors are eager, so the superseded generation's
      // blocks are consumed — free them IN-LOOP (the cdc_mv_join
      // discipline; a run otherwise pins every state/view generation
      // until JVM exit and bench timings swing with block pressure)
      graft.Ckpt.free(prevState) // no-op on the initial empty state
      prevMv.foreach(graft.Ckpt.free)
    }
    // the final state checkpoint has no further consumer (the returned
    // view is itself an eager checkpoint) — release it too
    graft.Ckpt.free(state)
    mv.get
  }

  /** One maintained extremum column: output name, value expression,
    * `isMin` (false = max). */
  final case class Extremum(name: String, value: Column, isMin: Boolean)

  /** Per-group MIN/MAX maintained alongside count/sums. MIN and MAX
    * are NOT self-maintainable: a sum absorbs a retraction as `−v`,
    * but retracting the row that WAS the group minimum says nothing
    * about the new minimum — only the surviving rows do. The classic
    * IVM answer (Gupta/Mumick's non-distributive aggregates) is kept
    * here at its minimal cost:
    *
    *  - inserts merge monotonically: new_min = least(stored, batch-min
    *    of the +1 rows) — no state read;
    *  - a retraction triggers a RESCAN only when it could have removed
    *    the extremum (retracted value ≤ stored min / ≥ stored max).
    *    Rescanned groups recompute min/max exactly from the live
    *    key-state restricted to those groups (a left-semi join), so
    *    the rescan costs Σ|affected groups|, never the view or the
    *    corpus. Non-extremal deletes and pure-insert batches never
    *    touch the state.
    *
    * Count/sum arithmetic rides the existing [[groupDelta]]/[[mergeMv]]
    * path unchanged; groups whose count reaches zero vanish before the
    * extremum columns are attached.
    */
  def mergeMvMinMax(mv: Option[DataFrame], st: Step, groupCols: Seq[String],
                    sums: Seq[(String, Column)], exts: Seq[Extremum]): DataFrame =
    attachExtrema(
      mergeMv(mv.map(_.drop(exts.map(_.name): _*)),
        groupDelta(st.signedDelta, groupCols, sums), groupCols, sums.map(_._1)),
      mv, st, groupCols, sums, exts)

  /** The extremum half of [[mergeMvMinMax]], reusable over any
    * count/sum `base` (zero-dropping for the in-memory loop,
    * zero-keeping for the transactional tombstone path): attaches
    * `exts` to base's groups via the insert-merge / retraction-rescan
    * rule. */
  private[cdc] def attachExtrema(base: DataFrame, mv: Option[DataFrame], st: Step,
                                 groupCols: Seq[String], sums: Seq[(String, Column)],
                                 exts: Seq[Extremum]): DataFrame = {
    require(exts.nonEmpty, "attachExtrema: no extremum columns")
    val gCols = groupCols.map(col)
    def extAgg(e: Extremum, out: String): Column =
      (if (e.isMin) min(e.value) else max(e.value)).as(out)

    // insert candidates: per-group extremum of this batch's +1 rows
    val ins = st.signedDelta.where(col(Sign) === 1)
      .groupBy(gCols: _*).agg(extAgg(exts.head, "__ins_" + exts.head.name),
        exts.tail.map(e => extAgg(e, "__ins_" + e.name)): _*)

    // stored extrema, renamed so the final select can tell them apart
    val stored = mv.map(_.select(gCols ++
      exts.map(e => col(e.name).as("__old_" + e.name)): _*))

    // rescan set: groups where some −1 row ties-or-beats the stored
    // extremum (or the stored row is missing — conservatively rescan).
    // Retracting a strictly interior value cannot move min/max.
    val retracts = st.signedDelta.where(col(Sign) === -1)
    val rescanG = (stored match {
      case Some(m) => retracts.join(m, groupCols, "left").where(
        exts.map { e =>
          val old = col("__old_" + e.name)
          old.isNull || (if (e.isMin) e.value <= old else e.value >= old)
        }.reduce(_ || _))
      case None => retracts
    }).select(gCols: _*).distinct()

    // exact recompute, but ONLY over the rescanned groups' live rows
    val rescanned = st.state.where(!col(Del))
      .join(rescanG, groupCols, "left_semi")
      .groupBy(gCols: _*).agg(extAgg(exts.head, "__re_" + exts.head.name),
        exts.tail.map(e => extAgg(e, "__re_" + e.name)): _*)

    val withSides = base
      .join(ins, groupCols, "left")
      .join(rescanG.withColumn("__rescan", lit(true)), groupCols, "left")
      .join(rescanned, groupCols, "left")
    val joined = stored.map(withSides.join(_, groupCols, "left"))
      .getOrElse(exts.foldLeft(withSides)((d, e) =>
        d.withColumn("__old_" + e.name, lit(null))))

    // per group: rescanned value if rescanned, else the monotone merge
    // (least/greatest skip nulls, so a brand-new group takes __ins and
    // an untouched group keeps __old)
    joined.select((gCols :+ col("n")) ++ sums.map(s => col(s._1)) ++
      exts.map { e =>
        val merged = if (e.isMin) least(col("__old_" + e.name), col("__ins_" + e.name))
                     else greatest(col("__old_" + e.name), col("__ins_" + e.name))
        when(col("__rescan"), col("__re_" + e.name)).otherwise(merged).as(e.name)
      }: _*)
  }

  /** EXACTLY-ONCE transactional maintenance with MIN/MAX columns —
    * [[maintainTx]]'s discipline plus [[mergeMvMinMax]]'s extremum
    * rule: state, view, and the per-writer watermark flip in ONE
    * manifest; the view's batch writes only TOUCHED groups (zero-count
    * groups tombstone); stale replays run zero Spark jobs. */
  def maintainMinMaxTx(root: String, batch: DataFrame, batchId: Long,
                       keyCols: Seq[String], versionCols: Seq[String],
                       deleteFlag: Column, groupCols: Seq[String],
                       sums: Seq[(String, Column)], exts: Seq[Extremum],
                       writer: String): Boolean = {
    import graft.sinks.{PkTableSink, TxLog}
    val spark = batch.sparkSession
    val sumNames = sums.map(_._1)
    val wmKey = s"wm.$writer"
    val manifest = TxLog.current(spark, root)
    val applied = manifest.flatMap(_.meta.get(wmKey)).map(_.toLong)
    if (applied.exists(batchId <= _)) return false

    val state = PkTableSink.readTxGroupAll(spark, root, "state",
      emptyState(batch, deleteFlag), deletedCol = Del)
    val st = step(state, batch, keyCols, versionCols.map(col), deleteFlag)
    val delta = groupDelta(st.signedDelta, groupCols, sums).localCheckpoint(true)
    val touched = delta.select(groupCols.map(col): _*)
    // empty-lake schema fallback: the view's shape derived from the
    // state (never evaluated once a manifest exists)
    val mvSchema = st.state.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sums.map { case (nm, c) => sum(c).as(nm) } ++
          exts.map(e => (if (e.isMin) min(e.value) else max(e.value)).as(e.name)): _*)
      .limit(0)
    val curMv = PkTableSink.readTxGroup(spark, root, "mv", mvSchema)
      .join(touched, groupCols, "left_semi")
      .localCheckpoint(true) // read thrice: count base, stored extrema, rescan test
    val newMv = attachExtrema(
        mergeMvAllowZero(curMv.drop(exts.map(_.name): _*), delta, groupCols, sumNames),
        Some(curMv), st, groupCols, sums, exts)
      .withColumn("batch_id", lit(batchId))
      .withColumn("__mv_gone", col("n") <= 0)
    PkTableSink.mergeTxGroup(spark, root, Map(
      "state" -> PkTableSink.TableBatch(
        batch.withColumn("__state_del", coalesce(deleteFlag, lit(false))),
        keyCols, versionCols, "__state_del"),
      "mv" -> PkTableSink.TableBatch(newMv, groupCols, Seq("batch_id"), "__mv_gone")),
      writer = writer,
      extraMeta = Map(wmKey -> batchId.toString))
    Seq(delta, curMv).foreach(graft.Ckpt.free)
    true
  }

  /** [[maintain]] with MIN/MAX columns — same batch loop, same
    * checkpoint discipline, extrema maintained via [[mergeMvMinMax]].
    */
  def maintainMinMax(batches: Seq[DataFrame], keyCols: Seq[String],
                     version: Seq[Column], deleteFlag: Column,
                     groupCols: Seq[String], sums: Seq[(String, Column)],
                     exts: Seq[Extremum]): DataFrame = {
    require(batches.nonEmpty, "maintainMinMax: no batches")
    var state = emptyState(batches.head, deleteFlag)
    var mv: Option[DataFrame] = None
    batches.foreach { batch =>
      // materialize via the hook: the rescan leg AND the signed delta
      // both read the checkpointed successor (the post-hoc checkpoint
      // left the delta on the lazy merge plan — see maintain)
      val s = step(state, batch, keyCols, version, deleteFlag,
        materialize = _.localCheckpoint(true))
      val prevState = state
      val prevMv = mv
      state = s.state
      mv = Some(mergeMvMinMax(mv, s, groupCols, sums, exts)
        .localCheckpoint(true))
      graft.Ckpt.free(prevState)
      prevMv.foreach(graft.Ckpt.free)
    }
    graft.Ckpt.free(state)
    mv.get
  }
}
