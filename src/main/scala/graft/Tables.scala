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
  /** events.ts is TIMESTAMP(NANOS) parquet, surfaced as long nanos via
    * `spark.sql.legacy.parquet.nanosAsLong`; values are µs-aligned so
    * integer `div` to micros is lossless (double division would not be:
    * epoch-nanos exceed 2^53).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    load(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
