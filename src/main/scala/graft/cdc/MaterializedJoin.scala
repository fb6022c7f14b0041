package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental materialized JOIN view over TWO keyed CDC changelogs —
  * the StarRocks multi-table (sync) materialized view: the view tracks
  * `SELECT <left cols>, <right cols> FROM L JOIN R ON L.jk = R.jk`
  * over the LIVE latest state of both tables, and each batch pair
  * updates it with signed deltas instead of a re-join.
  *
  * The delta algebra (the textbook bilinear IVM decomposition, cf.
  * DBSP / differential dataflow): with L_new = L_old + ΔL and
  * R_new = R_old + ΔR as SIGNED multisets,
  *
  *   Δ(L ⋈ R) = ΔL ⋈ R_new  ∪  L_old ⋈ ΔR
  *
  * — exact, including the ΔL⋈ΔR cross term (it lives inside the first
  * join because R_new already contains ΔR). Row signs multiply; since
  * live states carry +1, each delta row's sign is just its Δ-side
  * sign. Per-table signed deltas and key states come from
  * [[MaterializedAgg.step]], so the same out-of-order/duplicate-
  * delivery guarantees hold: a stale version's −/+ pair cancels.
  *
  * The MV is stored as projected rows + `__mult` (signed-count
  * multiplicity): a fact-PK-preserving projection keeps mult ≤ 1 (the
  * PK-table MV case), while an aggregating projection (e.g. just the
  * dim attribute) accumulates true join multiplicities — both fall
  * out of the same Σsign merge, and rows at mult ≤ 0 vanish.
  *
  * Scale shape: each step joins BATCH-sized deltas against live state
  * (delta side broadcastable), plus the two per-table state merges —
  * work ∝ batch + touched keys + delta fan-out, never ∝ the view. A
  * dim-side update fans out to exactly its referencing facts via the
  * L_old ⋈ ΔR join — the unavoidable cost of materializing a join.
  */
object MaterializedJoin {

  import MaterializedAgg.{Del, Sign}

  /** One maintenance step: successor states for both tables plus the
    * signed join delta projected to `outCols`. */
  final case class Step(stateL: DataFrame, stateR: DataFrame, delta: DataFrame)

  /** Advance both tables by one batch each (either may be empty) and
    * emit the signed join-row delta. `joinL`/`joinR` are the equi-join
    * columns; `outCols` the view's projection (column names must be
    * unambiguous across the two inputs after the join). Callers should
    * checkpoint the returned states between steps, as with
    * [[MaterializedAgg.step]]. */
  def step(stateL: DataFrame, batchL: DataFrame, keyL: Seq[String],
           verL: Seq[Column], delFlagL: Column,
           stateR: DataFrame, batchR: DataFrame, keyR: Seq[String],
           verR: Seq[Column], delFlagR: Column,
           joinL: Seq[String], joinR: Seq[String],
           outCols: Seq[String]): Step = {
    require(joinL.length == joinR.length && joinL.nonEmpty, "need equi-join keys")
    val sl = MaterializedAgg.step(stateL, batchL, keyL, verL, delFlagL)
    val sr = MaterializedAgg.step(stateR, batchR, keyR, verR, delFlagR)

    // the right side's join columns are renamed away before the join
    // (they duplicate the left's values anyway), so the common fk=pk
    // same-name case resolves; NON-join columns must be distinct
    // across the two tables — that's the view author's contract
    def joined(l: DataFrame, r: DataFrame): DataFrame = {
      val r2 = joinR.zipWithIndex.foldLeft(r) { case (df, (c, i)) =>
        df.withColumnRenamed(c, s"__graft_jr$i")
      }
      val cond = joinL.zipWithIndex.map { case (a, i) =>
        col(a) === col(s"__graft_jr$i")
      }.reduce(_ && _)
      l.join(r2, cond).select(col(Sign) +: outCols.map(col): _*)
    }

    // ΔL ⋈ R_new(live): delta rows keep their sign
    val left1 = joined(sl.signedDelta.drop(Del),
      sr.state.where(!col(Del)).drop(Del))
    // L_old(live) ⋈ ΔR: sign comes from the right delta
    val left2 = joined(stateL.where(!col(Del)).drop(Del),
      sr.signedDelta.drop(Del))

    Step(sl.state, sr.state, left1.unionByName(left2))
  }

  /** Merge a signed join delta into the view (projected rows +
    * `__mult`); rows whose multiplicity reaches zero vanish. */
  def mergeMv(mv: Option[DataFrame], delta: DataFrame,
              outCols: Seq[String]): DataFrame = {
    val d = delta.groupBy(outCols.map(col): _*)
      .agg(sum(col(Sign)).as("__mult"))
    mv.map(_.unionByName(d)).getOrElse(d)
      .groupBy(outCols.map(col): _*)
      .agg(sum(col("__mult")).as("__mult"))
      .where(col("__mult") > 0)
  }

  /** Empty left/right states for [[step]]. */
  def emptyState(batch: DataFrame, delFlag: Column): DataFrame =
    MaterializedAgg.emptyState(batch, delFlag)
}
