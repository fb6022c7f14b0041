package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermarked windowed aggregation over an event stream — the
  * monitoring/metrics queries the reference pipeline serves
  * continuously (rates per type over time; see the counters in
  * /root/reference/monitor.sh and continuous-ingest.sh).
  */
object EventStream {

  /** Tumbling-window counts/sums per event type with a watermark.
    * Emits (window_start, window_end, event_type, n, sum_value).
    *
    * At scale: the pre-shuffle partial aggregation collapses each
    * executor's slice of a window before the exchange, and the
    * watermark bounds state to (watermark horizon / window) rows per
    * type — no unbounded state.
    */
  def windowedCounts(events: DataFrame, tsCol: String, typeCol: String,
                     valueCol: String, window: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window), col(typeCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col(typeCol), col("n"), col("sum_value"))

  /** Gap-based session windows per key (the streaming twin of the
    * batch sessionization query): a session closes after `gap` of
    * inactivity; state is bounded by the watermark.
    */
  def sessionCounts(events: DataFrame, tsCol: String, keyCol: String,
                    gap: String = "30 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col(keyCol), col("n_events"))

  /** Streaming ingest dedup — the training-data front door: a crawl /
    * CDC feed re-delivers documents (at-least-once transport, repeated
    * crawls), and only the first arrival of each id within the
    * watermark horizon should flow downstream.
    * `dropDuplicatesWithinWatermark` keeps one state row per id ONLY
    * until the watermark passes it (exact dedup with bounded state) —
    * unlike a bare dropDuplicates whose state grows forever. Re-keyed
    * content dedup = pass a content hash (e.g. md5(text)) as `idCol`.
    */
  def dedupStream(events: DataFrame, idCol: String, tsCol: String,
                  watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCol)

  /** Stream-stream inner join within a time bound: each left event
    * joins right events of the same key within `bound` after it.
    * Watermarks on both sides let Spark expire join state — the
    * pattern for correlating two CDC/event feeds at scale.
    */
  def timeBoundJoin(left: DataFrame, right: DataFrame, keyCol: String,
                    leftTs: String, rightTs: String, bound: String,
                    watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      l(keyCol) === r(keyCol) &&
        r(rightTs) >= l(leftTs) &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $bound"))
      .drop(r(keyCol))
  }
}
