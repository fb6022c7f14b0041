package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic CDC workload generator — the library's
  * `continuous-ingest.sh` (the reference's insert/update/delete
  * driver with configurable rates). Ops are derived from md5 of the
  * sequence number, so any run with the same parameters produces the
  * same changelog — reproducible load tests, no RNG state.
  *
  * Distribution: seq maps to insert/update/delete by thresholding
  * md5(seq||":op") mod 100 against the configured percentages; keys
  * concentrate in [0, keySpace) with updates/deletes hitting earlier
  * keys (hot-key-ish, like the reference generator updating random
  * existing rows).
  */
object CdcGenerator {

  /** Generate `n` envelope JSON lines (column `json`) with the given
    * op percentages (must sum to ≤ 100; remainder becomes inserts).
    */
  def envelopes(spark: SparkSession, n: Long, insertPct: Int = 60,
                updatePct: Int = 30, deletePct: Int = 10,
                keySpace: Long = 1000L): DataFrame = {
    require(insertPct + updatePct + deletePct <= 100)
    val seq = spark.range(0, n).toDF("seq")
    val roll = conv(substring(md5(concat(col("seq"), lit(":op"))), 1, 8), 16, 10)
      .cast("long") % 100
    val op = when(roll < deletePct, Envelope.OpDelete)
      .when(roll < deletePct + updatePct, Envelope.OpUpdate)
      .otherwise(Envelope.OpCreate)
    val key = conv(substring(md5(concat(col("seq"), lit(":key"))), 1, 8), 16, 10)
      .cast("long") % keySpace
    val value = (conv(substring(md5(concat(col("seq"), lit(":val"))), 1, 8), 16, 10)
      .cast("long") % 100000L).cast("double") / 100
    seq
      .withColumn("op", op)
      .withColumn("key", key)
      .withColumn("value", value)
      .select(Envelope.encode(col("op"), col("seq"),
        Seq(col("key").as("id"), col("seq").as("seq"), col("value").as("value")),
        "testdb", "generated").as("json"))
  }
}
