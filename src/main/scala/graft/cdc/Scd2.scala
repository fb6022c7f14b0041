package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal (SCD-2-style) view of a keyed changelog: every change row
  * becomes a VERSION with a half-open validity interval
  * `[valid_from, valid_to)`, where valid_to is the next version's
  * timestamp (a cap literal for the current version). Point-in-time
  * lookups ("the row's state AS OF t") then join points into
  * intervals — executed with the bucketed equi-join of
  * [[graft.ops.RangeJoin]], not a nested loop.
  *
  * This is the row-level complement of the PK table's latest-wins
  * compaction (PkTable) and the TxLog's version-level time travel:
  * StarRocks serves "current state"; a warehouse audit query needs
  * "state at T" — reference analogue: the binlog IS this history
  * (mysql-cdc-debezium-starrocks docs/ARCHITECTURE.md's ordered
  * row-change log), here materialized queryably.
  *
  * Scale shape: interval construction is ONE window (shuffle+sort by
  * key) — the standard SCD2 build; the lookup is linear via
  * bucketization. Ties on (ts, tiebreak) order deterministically;
  * a version superseded at the same timestamp gets a zero-length
  * interval and is correctly invisible to lookups.
  */
object Scd2 {

  /** Build validity intervals. Output = input columns +
    * `valid_from`, `valid_to` (timestamps).
    *
    * @param cap valid_to for each key's current version — pick any
    *   literal beyond the corpus horizon (half-open compare keeps it
    *   exact)
    */
  def intervals(changelog: DataFrame, keyCol: Column, tsCol: Column,
                tiebreak: Column, cap: Column): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tsCol, tiebreak)
    changelog
      .withColumn("valid_from", tsCol)
      .withColumn("valid_to", coalesce(lead(tsCol, 1).over(w), cap))
  }

  /** Point-in-time lookup: for each row of `points`, the version of
    * the same key whose validity interval contains `pointTs`.
    * Executed as the bucketed range equi-join; both sides' timestamps
    * compare in exact epoch MICROSECONDS (no sub-second truncation).
    *
    * The interval end used for BUCKETIZATION is clamped at
    * (max point ts + 1 µs) — one cheap scalar aggregate — because
    * every key's CURRENT version runs to the cap sentinel, and an
    * unclamped far-future cap would replicate that row into one copy
    * per bucket up to the cap (a row explosion at any realistic
    * sentinel). Clamping is lossless: buckets past the last point can
    * never contain a match.
    *
    * @param bucketWidthUs bucket size in µs; ≈ the median interval
    *   length (see RangeJoin scaladoc)
    */
  /** Validity-interval OVERLAP join: for each row of `ranges` (a
    * closed time range `[rangeStart, rangeEndIncl]`, e.g. a session or
    * an audit window), every version of the same key whose validity
    * interval intersects it. Runs as the bucketed interval-overlap
    * equi-join of [[graft.ops.RangeJoin.intervalOverlap]] in exact
    * epoch microseconds.
    *
    * As in [[asOfLookup]], the version ends used for bucketization are
    * clamped at (max range end + 1 µs) — current versions run to the
    * cap sentinel, and unclamped they would replicate into every
    * bucket up to it. Clamping is lossless here too: with every range
    * ending at or before the clamp, `valid_to > rangeStart` holds iff
    * `min(valid_to, clamp) > rangeStart`.
    *
    * @param bucketWidthUs bucket size in µs; ≈ the median of version
    *   validity and range lengths
    */
  def overlappingVersions(intervals: DataFrame, intervalKey: Column,
                          ranges: DataFrame, rangeKey: Column,
                          rangeStart: Column, rangeEndIncl: Column,
                          bucketWidthUs: Long): DataFrame = {
    val rg = ranges
      .withColumn("__r_from_us", unix_micros(rangeStart))
      .withColumn("__r_to_us", unix_micros(rangeEndIncl) + lit(1L))
    // the clamp (last range end — bounds the open current version) is
    // a broadcast scalar in the same job, not a driver-side collect
    val clamp = rg.agg(coalesce(max(col("__r_to_us")), lit(0L)).as("__sc_clamp"))
    graft.ops.RangeJoin.intervalOverlap(
      rg,
      intervals.crossJoin(broadcast(clamp))
        .withColumn("__v_from_us", unix_micros(col("valid_from")))
        .where(col("__v_from_us") < col("__sc_clamp"))
        .withColumn("__v_to_us",
          least(unix_micros(col("valid_to")), col("__sc_clamp"))),
      leftKey = rangeKey, lStart = col("__r_from_us"), lEndExcl = col("__r_to_us"),
      rightKey = intervalKey, rStart = col("__v_from_us"), rEndExcl = col("__v_to_us"),
      bucketWidth = bucketWidthUs)
      .drop("__r_from_us", "__r_to_us", "__v_from_us", "__v_to_us", "__sc_clamp")
  }

  def asOfLookup(intervals: DataFrame, intervalKey: Column,
                 points: DataFrame, pointKey: Column, pointTs: Column,
                 bucketWidthUs: Long): DataFrame = {
    val pts = points.withColumn("__p_us", unix_micros(pointTs))
    // clamp = last point + 1, as a broadcast scalar in the same job
    val clamp = pts.agg(
      coalesce(max(col("__p_us")) + lit(1L), lit(0L)).as("__sc_clamp"))
    graft.ops.RangeJoin.pointInInterval(
      pts,
      intervals.crossJoin(broadcast(clamp))
        .withColumn("__from_us", unix_micros(col("valid_from")))
        // an interval starting after the last point can't match —
        // dropping it also keeps clamped ends >= starts for sequence()
        .where(col("__from_us") < col("__sc_clamp"))
        .withColumn("__to_us",
          least(unix_micros(col("valid_to")), col("__sc_clamp"))),
      leftKey = pointKey, point = col("__p_us"),
      rightKey = intervalKey, start = col("__from_us"), endExcl = col("__to_us"),
      bucketWidth = bucketWidthUs)
      .drop("__p_us", "__from_us", "__to_us", "__sc_clamp")
  }
}
