package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Pipeline monitoring — the library's `monitor.sh` (see
  * /root/reference/monitor.sh: connector status, routine-load lag,
  * per-job row counters). Structured Streaming already tracks all of
  * it per query; this formats the numbers a pipeline operator watches.
  */
object Monitor {

  final case class QueryStatus(
      name: String,
      isActive: Boolean,
      batchId: Long,
      inputRowsPerSecond: Double,
      processedRowsPerSecond: Double,
      numInputRows: Long,
      stateRows: Long,
      batchDurationMs: Long)

  /** Snapshot of a streaming query's latest progress (zeros before the
    * first completed batch). */
  def status(q: StreamingQuery): QueryStatus = {
    val p = Option(q.lastProgress)
    QueryStatus(
      name = Option(q.name).getOrElse(q.id.toString),
      isActive = q.isActive,
      batchId = p.map(_.batchId).getOrElse(-1L),
      inputRowsPerSecond = p.map(_.inputRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0),
      processedRowsPerSecond = p.map(_.processedRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0),
      numInputRows = p.map(_.numInputRows).getOrElse(0L),
      stateRows = p.flatMap(x => Option(x.stateOperators))
        .map(_.map(_.numRowsTotal).sum).getOrElse(0L),
      batchDurationMs = p.map(_.batchDuration).getOrElse(0L))
  }

  /** One status line per active query on the session — the
    * `SHOW ROUTINE LOAD`-style overview. */
  def report(spark: org.apache.spark.sql.SparkSession): Seq[QueryStatus] =
    spark.streams.active.toSeq.map(status)
}
