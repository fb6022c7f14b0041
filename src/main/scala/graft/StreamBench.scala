package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.cdc.Envelope
import graft.streaming.CdcStream

/** Streaming CDC throughput benchmark — the library's analogue of the
  * reference's `benchmark.sh` end-to-end rate tests (insert/update
  * rows/s through MySQL→Debezium→Kafka→StarRocks; see
  * /root/reference/benchmark.sh). Here: envelope JSON files → stream
  * source → unwrap → keyed upsert state → sink, one JSON line with
  * end-to-end rows/s.
  */
object StreamBench {

  /** One measured end-to-end pass (envelope files → stream → unwrap →
    * keyed upsert → noop sink). Returns (rows, seconds); callable from
    * [[Bench]] so the driver's per-round artifact captures the
    * streaming rate, not just self-reported numbers.
    */
  def run(spark: org.apache.spark.sql.SparkSession, sfDir: String): (Long, Double) = {
    val work = java.nio.file.Files.createTempDirectory("streambench").toString
    val chg = Tables.events(spark, sfDir).withColumn("op",
      when(col("event_type") === "signup", Envelope.OpCreate)
        .when(col("event_type") === "error", Envelope.OpDelete)
        .otherwise(Envelope.OpUpdate))
    val envelopes = chg.select(Envelope.encode(col("op"),
      (col("ts").cast("double") * 1000).cast("long"),
      Seq(col("event_id"), col("user_id"), col("value")), "testdb", "events").as("value"))
    val n = envelopes.count()
    envelopes.coalesce(8).write.mode("overwrite").text(s"$work/input")

    val payload = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("value", DoubleType)))
    val t0 = System.nanoTime()
    val states = CdcStream.upsertStates(CdcStream.unwrap(
      CdcStream.fileSource(spark, s"$work/input"), "json", payload,
      keyField = "user_id", seqField = "event_id"))
    val q = states.writeStream.format("noop")
      .outputMode("update")
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9
    (n, secs)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt, maxPartitionBytes = "4m").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (n, secs) = run(spark, sfDir)
    println(s"""{"metric":"stream_cdc_rows_per_sec","value":${(n / secs).toLong},"unit":"rows/sec","rows":$n,"secs":$secs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
