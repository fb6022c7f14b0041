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
      batchDurationMs: Long,
      errorRows: Long,
      goodRows: Long,
      sourceLagRows: Long)

  /** Consumer lag from a pair of Kafka-style offset JSONs
    * (`{"topic":{"0":1234,…},…}`): Σ max(latest − end, 0) over
    * partitions. −1 when either side is absent or not offset-shaped
    * (file sources report log versions, not row offsets).
    * Exposed for direct testing; [[status]] applies it per source.
    */
  def kafkaLagRows(endOffsetJson: String, latestOffsetJson: String): Long = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    def partitions(s: String): Option[Map[(String, String), Long]] =
      scala.util.Try(JsonMethods.parse(s)).toOption.flatMap {
        case JObject(topics) =>
          val parts = topics.flatMap {
            case (topic, JObject(ps)) => ps.collect {
              case (part, JInt(off)) => (topic, part) -> off.toLong
            }
            case _ => Nil
          }
          if (parts.nonEmpty) Some(parts.toMap) else None
        case _ => None
      }
    (partitions(endOffsetJson), partitions(latestOffsetJson)) match {
      case (Some(end), Some(latest)) =>
        latest.map { case (tp, lo) => math.max(lo - end.getOrElse(tp, 0L), 0L) }.sum
      case _ => -1L
    }
  }

  /** Snapshot of a streaming query's latest progress (zeros before the
    * first completed batch). `errorRows`/`goodRows` surface the
    * `graft_cdc` observed metrics attached by
    * [[CdcStream.unwrapWithErrors]]; `sourceLagRows` is the summed
    * Kafka consumer lag (−1 for sources that don't report row
    * offsets) — the `SHOW ROUTINE LOAD` lag + ErrorLogUrls pair.
    */
  def status(q: StreamingQuery): QueryStatus = {
    val p = Option(q.lastProgress)
    def observed(metric: String): Long = p.flatMap { x =>
      Option(x.observedMetrics.get("graft_cdc")).map(_.getAs[Long](metric))
    }.getOrElse(0L)
    val lag = p.flatMap(x => Option(x.sources)).map(_.toSeq).getOrElse(Nil)
      .map(s => kafkaLagRows(
        Option(s.endOffset).getOrElse(""), Option(s.latestOffset).getOrElse("")))
      .foldLeft(-1L) { (acc, l) => if (l < 0) acc else if (acc < 0) l else acc + l }
    QueryStatus(
      name = Option(q.name).getOrElse(q.id.toString),
      isActive = q.isActive,
      batchId = p.map(_.batchId).getOrElse(-1L),
      inputRowsPerSecond = p.map(_.inputRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0),
      processedRowsPerSecond = p.map(_.processedRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0),
      numInputRows = p.map(_.numInputRows).getOrElse(0L),
      stateRows = p.flatMap(x => Option(x.stateOperators))
        .map(_.map(_.numRowsTotal).sum).getOrElse(0L),
      batchDurationMs = p.map(_.batchDuration).getOrElse(0L),
      errorRows = observed("error_rows"),
      goodRows = observed("good_rows"),
      sourceLagRows = lag)
  }

  /** One status line per active query on the session — the
    * `SHOW ROUTINE LOAD`-style overview. */
  def report(spark: org.apache.spark.sql.SparkSession): Seq[QueryStatus] =
    spark.streams.active.toSeq.map(status)
}
