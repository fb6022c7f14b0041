package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Stream-Load-protocol-shaped batch sink: the Spark-side equivalent
  * of StarRocks Routine Load's consume-batch-and-POST loop
  * (see /root/reference/create-routine-load.sh and the Stream Load
  * HTTP protocol it drives internally).
  *
  * Rows are serialized to JSON lines and handed to a pluggable
  * transport in size-bounded chunks, each labeled `label-partNNN` for
  * idempotent retry (Stream Load deduplicates by label). The container
  * has no network egress, so the shipped transports are local (file /
  * collecting); a real HTTP PUT transport plugs in with the same
  * signature.
  *
  * Scale: serialization runs distributed via toJSON.foreachPartition —
  * each executor ships its own partitions; nothing funnels through the
  * driver.
  */
object StarRocksSink {

  /** A transport receives (chunkLabel, jsonLinesPayload). Must be
    * Serializable — it is invoked on executors. */
  type Transport = (String, String) => Unit

  /** A file transport writing each chunk under `dir/label-partNNN.json`
    * (test/local stand-in for the Stream Load HTTP endpoint). */
  def fileTransport(dir: String): Transport = { (label, payload) =>
    val p = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(p)
    java.nio.file.Files.writeString(p.resolve(s"$label.json"), payload)
  }

  /** Ship a DataFrame as chunked JSON-lines "stream loads".
    *
    * @param maxChunkBytes flush threshold per chunk (Stream Load's
    *                      max_batch_size analogue)
    * @return number of chunks shipped
    */
  def write(df: DataFrame, label: String, transport: Transport,
            maxChunkBytes: Int = 64 * 1024 * 1024): Long = {
    val counter = df.sparkSession.sparkContext.longAccumulator("chunks")
    df.toJSON.foreachPartition { (rows: Iterator[String]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val sb = new StringBuilder
      var chunk = 0
      def flush(): Unit = if (sb.nonEmpty) {
        transport(f"$label-p$pid%04d-c$chunk%04d", sb.toString)
        sb.clear(); chunk += 1; counter.add(1)
      }
      rows.foreach { line =>
        sb.append(line).append('\n')
        if (sb.length >= maxChunkBytes) flush()
      }
      flush()
    }
    counter.value
  }

  /** Primary-key-table parquet sink: the materialized PK table written
    * partitioned by a derived partition column (e.g. a date) —
    * StarRocks' `DISTRIBUTED BY HASH(key)` + partition-by-range
    * analogue for a lake layout. Overwrite is idempotent per run.
    */
  def writePkTable(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
}
