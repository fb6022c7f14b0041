package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Funnel-depth analysis (StarRocks `window_funnel()` analogue) in ONE
  * aggregation pass.
  *
  * The staged formulation (see `q_window_funnel`) computes each step
  * with a keyed aggregation and re-joins the events — k steps, k
  * joins. This operator instead collects each key's (ts, type) events
  * once and evaluates every step as an array expression over that
  * list: one shuffle total, no joins, all steps evaluated in the same
  * projection. Step semantics are VALUE-based (each step is the
  * minimum qualifying timestamp), not scan-order-based, so results are
  * deterministic even when distinct events share a timestamp.
  *
  * Step rules, mirroring window_funnel:
  *  - the anchor is the key's FIRST step-0 event (no window bound);
  *  - step i (i ≥ 1) is the first step-i event strictly after step
  *    i−1 and within `window` of the anchor;
  *  - `dedup` mode (window_funnel's DEDUPLICATION): a repeat of any
  *    ALREADY-matched step type strictly between step i−1 and the
  *    candidate step i (within the window) breaks the funnel at depth
  *    i — ties break (a candidate at the same timestamp as a repeat
  *    does not count).
  *
  * Scale shape: the collected list is per-key and bounded by per-key
  * activity — the same working-set assumption any per-user funnel
  * carries. Memory-bound keys (bot-grade event counts) should be
  * capped upstream or routed to the staged twin, which never
  * materializes a key's events together.
  */
object Funnel {

  /** Per-key funnel depth. Output: one row per key —
    * `key` (named from keyName), `step_0..step_{n-1}` (matched
    * timestamps, null past the reached depth) and `depth` (long).
    *
    * @param steps  ordered event-type names, head = anchor step
    * @param window max distance from the anchor, e.g.
    *   `expr("INTERVAL 1 DAY")`
    * @param dedup  break on repeated matched-step types (see scaladoc)
    */
  def depth(events: DataFrame, keyCol: Column, tsCol: Column, typeCol: Column,
            steps: Seq[String], window: Column, dedup: Boolean): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    val grouped = events
      .groupBy(keyCol.as("key"))
      .agg(collect_list(struct(tsCol.as("ts"), typeCol.as("et"))).as("evs"))

    def minTs(pred: Column => Column): Column =
      array_min(transform(filter(col("evs"), pred), e => e("ts")))

    val horizon = col("step_0") + window
    val withSteps = steps.zipWithIndex.foldLeft(grouped) {
      case (df, (step, 0)) =>
        df.withColumn("step_0", minTs(e => e("et") === step))
      case (df, (step, i)) =>
        val prev = col(s"step_${i - 1}")
        val cand = minTs(e =>
          e("et") === step && e("ts") > prev && e("ts") <= horizon)
        val stepCol = if (dedup) {
          val repeat = minTs(e =>
            e("et").isin(steps.take(i): _*) &&
              e("ts") > prev && e("ts") <= horizon)
          when(cand.isNotNull && (repeat.isNull || cand < repeat), cand)
        } else cand
        df.withColumn(s"step_$i", stepCol)
    }
    withSteps.withColumn("depth",
      steps.indices.map(i => col(s"step_$i").isNotNull.cast("long")).reduce(_ + _))
  }
}
