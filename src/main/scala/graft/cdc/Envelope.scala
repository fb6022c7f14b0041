package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium-style change-event envelope, Spark-first.
  *
  * The reference pipeline emits MySQL binlog rows as Debezium JSON
  * envelopes (`{"before":…,"after":…,"source":…,"op":"c|u|d|r","ts_ms":…}`)
  * and unwraps them with `io.debezium.transforms.ExtractNewRecordState`
  * configured with `delete.handling.mode=rewrite` (see
  * /root/reference/debezium-connector.json:21-24), which flattens the
  * after-image and adds a `__deleted` marker column.
  *
  * Here both directions are pure Catalyst column expressions
  * (`to_json` / `from_json`) so encode/parse/unwrap stay inside
  * whole-stage codegen — no UDFs, no per-row JVM object churn.
  */
object Envelope {

  val OpCreate = "c"; val OpUpdate = "u"; val OpDelete = "d"; val OpRead = "r"

  /** Envelope schema for a given row payload schema. */
  def schemaFor(payload: StructType): StructType = StructType(Seq(
    StructField("before", payload, nullable = true),
    StructField("after", payload, nullable = true),
    StructField("source", StructType(Seq(
      StructField("connector", StringType),
      StructField("db", StringType),
      StructField("table", StringType))), nullable = true),
    StructField("op", StringType),
    StructField("ts_ms", LongType)))

  /** Encode payload columns into a Debezium-style JSON envelope column.
    *
    * @param op     column holding the op code (c/u/d/r)
    * @param tsMs   event timestamp in epoch millis
    * @param cols   the row-image columns; used as `after` for c/u/r and
    *               as `before` for d (after is null on deletes, matching
    *               Debezium's delete events)
    */
  def encode(op: Column, tsMs: Column, cols: Seq[Column], db: String, table: String): Column = {
    val image = struct(cols: _*)
    to_json(struct(
      when(op === OpDelete, image).otherwise(lit(null)).as("before"),
      when(op =!= OpDelete, image).otherwise(lit(null)).as("after"),
      struct(lit("mysql").as("connector"), lit(db).as("db"), lit(table).as("table")).as("source"),
      op.as("op"),
      tsMs.as("ts_ms")))
  }

  /** Parse a JSON envelope string column into a typed envelope struct.
    * PERMISSIVE mode: unknown fields ignored, missing fields null — this
    * is what absorbs connector-restart schema drift (SURVEY §2 A7).
    */
  def parse(json: Column, payload: StructType): Column =
    from_json(json, schemaFor(payload))

  /** Kafka-Connect-style full message: `{"schema": {...}, "payload":
    * <row image>}` — the wire shape the reference's Routine Load jobs
    * consume with `$.payload.<col>` jsonpaths (see
    * /root/reference/benchmark.sh, `jsonpaths=["$.payload.id", …]`).
    * The schema block is a static type descriptor, as Connect's
    * JsonConverter emits with schemas.enable=true.
    */
  def encodeConnectMessage(cols: Seq[Column], db: String, table: String): Column =
    to_json(struct(
      struct(lit("struct").as("type"), lit(s"$db.$table").as("name")).as("schema"),
      struct(cols: _*).as("payload")))

  /** ExtractNewRecordState with `delete.handling.mode=rewrite`:
    * flatten the record image (after, or before for deletes) and append
    * a `__deleted` string marker ("true"/"false"), Debezium-style.
    * Tombstones (null envelope / null op) are dropped.
    *
    * The envelope expression is evaluated exactly once per row: it is
    * wrapped in the [[graft.functions.Opaque]] barrier, so the
    * optimizer may not substitute it into the tombstone filter and
    * push the (expensive) JSON parse below this projection — which
    * would re-run the full codec up to two extra times per row at
    * raw-scan parallelism (measured 4x wall-clock on the roundtrip
    * bench at sf0.1).
    */
  def extractNewRecordState(df: DataFrame, envelope: Column, payload: StructType): DataFrame = {
    val parsed = df.select(call_function("opaque", envelope).as("env"))
    val flat = parsed
      .where(col("env").isNotNull && col("env.op").isNotNull)
      .select(
        when(col("env.op") === OpDelete, col("env.before")).otherwise(col("env.after")).as("image"),
        when(col("env.op") === OpDelete, lit("true")).otherwise(lit("false")).as("__deleted"),
        col("env.op").as("__op"),
        col("env.ts_ms").as("__ts_ms"))
    val payloadCols = payload.fields.map(f => col(s"image.${f.name}").as(f.name))
    flat.select(payloadCols.toIndexedSeq ++ Seq(col("__deleted"), col("__op"), col("__ts_ms")): _*)
  }

  /** Parse + unwrap in one call: JSON envelope strings → flattened
    * rewrite-mode rows. Single `from_json` per row (see
    * [[extractNewRecordState]] for the one-pass guarantee).
    */
  def unwrap(df: DataFrame, json: Column, payload: StructType): DataFrame =
    extractNewRecordState(df.select(json.as("__json")), parse(col("__json"), payload), payload)
}
