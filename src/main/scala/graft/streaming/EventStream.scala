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
}
