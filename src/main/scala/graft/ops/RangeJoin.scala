package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join that plans as an EQUI-join.
  *
  * Spark has no native range-join operator: a bare
  * `l.join(r, k_l === k_r && p >= s && p < e)` plans the range
  * predicate as a post-join filter, and with a skewed or absent equi
  * key degrades to a nested-loop — and even in the good case the
  * within-key match is O(|l_k|·|r_k|). Bucketization fixes the shape
  * (the public trick behind Databricks' range-join hint and the
  * interval-join in Flink):
  *
  *  - the interval side replicates each row into the fixed-width time
  *    buckets its `[start, end)` interval overlaps — with bucketWidth
  *    chosen ≈ the typical interval length that is ≤ 2 copies;
  *  - the point side lands in exactly ONE bucket;
  *  - the join becomes an equi-join on (key, bucket) — hash shuffle
  *    both sides, no sort of the union, no nested loop — followed by
  *    the exact containment filter inside the join condition.
  *
  * Cost is linear in both inputs times the small replication factor,
  * and the shuffle key (key, bucket) is FINER than key alone, so a hot
  * key's intervals spread across time buckets instead of piling onto
  * one task — the property that keeps this shape alive at 100 TB.
  *
  * Reference analogue: time-windowed lookups over the CDC-maintained
  * warm store (mysql-cdc-debezium-starrocks docs/ARCHITECTURE.md's
  * query tier); re-expressed Spark-first.
  */
object RangeJoin {

  /** Inner point-in-interval join: rows (l, r) with
    * `leftKey === rightKey && point ∈ [start, endExcl)`.
    *
    * `point`, `start`, `endExcl` must be castable to long and share a
    * unit (e.g. epoch seconds). Left and right column names must be
    * disjoint (select/alias first, as with any self-join).
    *
    * @param bucketWidth bucket size in the time unit; pick ≈ the
    *   typical interval length (replication = len/width + 1)
    */
  def pointInInterval(left: DataFrame, right: DataFrame,
                      leftKey: Column, point: Column,
                      rightKey: Column, start: Column, endExcl: Column,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    pointInIntervalW(left, right, leftKey, point, rightKey, start, endExcl,
      lit(bucketWidth))
  }

  /** [[pointInInterval]] with the width as a COLUMN (every row must
    * carry the same positive value — the broadcast-scalar pattern
    * [[pointInIntervalAuto]] uses to keep width derivation inside the
    * one job). */
  private def pointInIntervalW(left: DataFrame, right: DataFrame,
                               leftKey: Column, point: Column,
                               rightKey: Column, start: Column, endExcl: Column,
                               width: Column): DataFrame = {
    val lb = left.withColumn("__gr_bucket", floor(point.cast("long") / width))
    // empty/inverted intervals (dirty data) contain no points — and
    // must not reach sequence(), whose step defaults to -1 when
    // start > stop and would explode into a huge descending array
    // sequence() is inclusive; endExcl-1 keeps an interval ending
    // exactly on a bucket boundary out of the next bucket
    val rb = right.where(start.cast("long") < endExcl.cast("long"))
      .withColumn("__gr_bucket",
        explode(sequence(floor(start.cast("long") / width),
          floor((endExcl.cast("long") - 1) / width))))
    lb.join(rb,
        leftKey === rightKey && lb("__gr_bucket") === rb("__gr_bucket") &&
          point >= start && point < endExcl)
      .drop("__gr_bucket")
  }

  /** Inner interval-OVERLAP join: rows (l, r) with
    * `leftKey === rightKey` and `[lStart, lEndExcl) ∩ [rStart, rEndExcl) ≠ ∅`.
    *
    * Same bucketization as [[pointInInterval]], applied to BOTH sides:
    * each interval replicates into the fixed-width buckets it covers
    * and the join runs as an equi-join on (key, bucket). A pair of
    * overlapping intervals co-occurs in EVERY bucket their overlap
    * spans, so the join condition additionally pins the pair to the
    * single bucket containing the overlap's start
    * (`max(lStart, rStart)`) — each qualifying pair emits exactly
    * once, with no post-join distinct (a distinct here would be a
    * second shuffle carrying the full payload).
    *
    * Zero-length intervals (start >= endExcl) contain no points, so
    * they are dropped up front — which also keeps the bucket
    * `sequence()` bounds ordered.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      leftKey: Column, lStart: Column, lEndExcl: Column,
                      rightKey: Column, rStart: Column, rEndExcl: Column,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def buckets(df: DataFrame, s: Column, e: Column): DataFrame =
      df.where(s.cast("long") < e.cast("long"))
        .withColumn("__gr_bucket",
          explode(sequence(floor(s.cast("long") / bucketWidth),
            floor((e.cast("long") - 1) / bucketWidth))))
    val lb = buckets(left, lStart, lEndExcl)
    val rb = buckets(right, rStart, rEndExcl)
    lb.join(rb,
        leftKey === rightKey && lb("__gr_bucket") === rb("__gr_bucket") &&
          lStart < rEndExcl && rStart < lEndExcl &&
          lb("__gr_bucket") ===
            floor(greatest(lStart.cast("long"), rStart.cast("long")) / bucketWidth))
      .drop("__gr_bucket")
  }

  /** [[pointInInterval]] with the bucket width derived from the
    * interval side's MEDIAN length. Median ≈ the replication sweet
    * spot: typical intervals copy ≤2×, and only the long tail
    * replicates more — the choice a query author would make by hand
    * after profiling.
    *
    * The width is a BROADCAST SCALAR inside the same job (a 1-row
    * approx-percentile aggregate cross-joined onto both sides), not a
    * driver-side `.collect()` — no separate action, no extra pass
    * scheduled ahead of the join. */
  def pointInIntervalAuto(left: DataFrame, right: DataFrame,
                          leftKey: Column, point: Column,
                          rightKey: Column, start: Column, endExcl: Column): DataFrame = {
    val stats = right
      .select(percentile_approx((endExcl.cast("long") - start.cast("long")),
        lit(0.5), lit(10000)).as("__gr_m"))
      .select(greatest(coalesce(col("__gr_m"), lit(1L)), lit(1L)).as("__gr_width"))
    val lw = left.crossJoin(broadcast(stats))
    val rw = right.crossJoin(broadcast(stats))
    pointInIntervalW(lw, rw, leftKey, point, rightKey, start, endExcl,
      col("__gr_width"))
      .drop("__gr_width")
  }
}
