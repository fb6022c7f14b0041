package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the test-corpus tables (TPC-H-ish star schema plus an
  * `events` changelog-ish table, `documents`, and `embeddings`).
  *
  * All reads are plain parquet scans: Catalyst pushes filters and
  * prunes columns at the scan, so callers should select/filter on the
  * returned frame rather than pre-materializing.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.ts arrives in corpus-dependent physical types: older corpora
    * store TIMESTAMP(NANOS) parquet (surfaced as long nanos via
    * `spark.sql.legacy.parquet.nanosAsLong`; values are µs-aligned so
    * integer `div` to micros is lossless — double division would not be:
    * epoch-nanos exceed 2^53), newer ones plain TIMESTAMP(MICROS)
    * (surfaced as TIMESTAMP_NTZ under default NTZ inference). Branch on
    * the type actually read so both load to one session-zone TIMESTAMP.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType      => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      // TIMESTAMP_NTZ: session zone is UTC, so the NTZ wall time IS the
      // instant; cast keeps downstream window/date_format behavior
      case _             => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
