package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType
import graft.cdc.Envelope

/** Structured-Streaming CDC: the streaming half of the reference
  * pipeline (Debezium topic → unwrap → primary-key upsert), expressed
  * as `readStream → from_json unwrap → flatMapGroupsWithState`.
  *
  * Keyed state holds only (version, payload, deleted) per key — the
  * cluster-scale footprint is the live key set, partitioned by key
  * hash across executors, exactly like StarRocks' primary-key index.
  * Late/out-of-order events are resolved by the version ordering, not
  * arrival order, so at-least-once upstream delivery is safe
  * (idempotent upsert).
  */
object CdcStream {

  /** One keyed change record after unwrap: generic string payload map
    * keeps this schema-agnostic for the state operator. */
  final case class Change(key: Long, versionMs: Long, seq: Long,
                          deleted: Boolean, payload: String)

  /** Current materialized row for a key. */
  final case class KeyState(key: Long, versionMs: Long, seq: Long,
                            deleted: Boolean, payload: String)

  /** Parse a stream of Debezium-style envelope JSON into unwrapped
    * change records (ExtractNewRecordState semantics, rewrite mode).
    *
    * @param keyField payload field holding the primary key (long)
    * @param seqField payload field holding a tiebreaker sequence (long)
    */
  def unwrap(envelopes: DataFrame, jsonCol: String, payload: StructType,
             keyField: String, seqField: String): Dataset[Change] = {
    val parsed = envelopes
      .select(from_json(col(jsonCol), Envelope.schemaFor(payload)).as("env"))
      .where(col("env").isNotNull && col("env.op").isNotNull)
    val image = when(col("env.op") === Envelope.OpDelete, col("env.before"))
      .otherwise(col("env.after"))
    parsed.select(
      image.getField(keyField).cast("long").as("key"),
      col("env.ts_ms").cast("long").as("versionMs"),
      image.getField(seqField).cast("long").as("seq"),
      (col("env.op") === Envelope.OpDelete).as("deleted"),
      to_json(image).as("payload"))
      .as[Change](Encoders.product[Change])
  }

  /** Latest-wins keyed upsert state: emits the key's new materialized
    * state for every micro-batch in which it changed. Deletes emit a
    * tombstoned state (deleted=true) so downstream sinks can apply
    * removal — mirroring Debezium's rewrite mode.
    */
  def upsertStates(changes: Dataset[Change]): Dataset[KeyState] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.key)
      .flatMapGroupsWithState[KeyState, KeyState](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[Change], state: GroupState[KeyState]) =>
          val incoming = rows.toSeq
          if (incoming.isEmpty) Iterator.empty
          else {
            val candidates = state.getOption.toSeq.map(s =>
              Change(s.key, s.versionMs, s.seq, s.deleted, s.payload)) ++ incoming
            val latest = candidates.maxBy(c => (c.versionMs, c.seq))
            val next = KeyState(key, latest.versionMs, latest.seq, latest.deleted, latest.payload)
            val changed = !state.getOption.contains(next)
            state.update(next)
            if (changed) Iterator.single(next) else Iterator.empty
          }
      }
  }

  /** [[unwrap]] with Routine-Load-style error accounting on the
    * stream: unparseable lines (null envelope/op after PERMISSIVE
    * parse) are counted per micro-batch via `Dataset.observe` — the
    * streaming counterpart of `cdc_error_rows`' `max_error_number`
    * counters; read them from
    * [[Monitor.status]]`.errorRows` / `goodRows` (or any
    * StreamingQueryListener) instead of a second pass. Good rows flow
    * on as unwrapped [[Change]] records; error rows are dropped after
    * counting (quarantining them is a sink concern — route the raw
    * frame to a dead-letter sink alongside if needed).
    */
  def unwrapWithErrors(envelopes: DataFrame, jsonCol: String, payload: StructType,
                       keyField: String, seqField: String): Dataset[Change] = {
    val tagged = envelopes
      .select(col(jsonCol).as("__raw"),
        from_json(col(jsonCol), Envelope.schemaFor(payload)).as("env"))
      .withColumn("__error", col("env").isNull || col("env.op").isNull)
      .observe("graft_cdc",
        sum(when(col("__error"), 1L).otherwise(0L)).as("error_rows"),
        sum(when(col("__error"), 0L).otherwise(1L)).as("good_rows"))
    val good = tagged.where(!col("__error"))
    val image = when(col("env.op") === Envelope.OpDelete, col("env.before"))
      .otherwise(col("env.after"))
    good.select(
      image.getField(keyField).cast("long").as("key"),
      col("env.ts_ms").cast("long").as("versionMs"),
      image.getField(seqField).cast("long").as("seq"),
      (col("env.op") === Envelope.OpDelete).as("deleted"),
      to_json(image).as("payload"))
      .as[Change](Encoders.product[Change])
  }

  /** Split a mixed multi-table envelope feed by `source.table` — the
    * connector's `table.include.list` routing (one Debezium connector
    * feeds one topic per table; with a single mixed feed this is the
    * same fan-out). Returns the per-table envelope frame, to be
    * unwrapped with that table's payload schema.
    */
  def routeTable(envelopes: DataFrame, jsonCol: String, table: String): DataFrame =
    envelopes.where(
      get_json_object(col(jsonCol), "$.source.table") === table)

  /** File-based CDC source (SURVEY §2 D4): a directory of Debezium
    * JSON line files consumed as a stream — the zero-egress stand-in
    * for the Kafka topic, same downstream pipeline.
    */
  def fileSource(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(StructType(Seq(
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.StringType)))).text(dir)
      .withColumnRenamed("value", "json")
}
