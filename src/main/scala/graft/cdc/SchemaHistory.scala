package graft.cdc

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sinks.{PkTableSink, TxLog}

/** Durable, REPLAYABLE schema-change (DDL) feed — the lake analogue of
  * the reference's `schemahistory.testdb` Kafka topic
  * (docs/ARCHITECTURE.md:113): Debezium records every source DDL so a
  * restarted connector (or any downstream consumer) can reconstruct
  * the table schema AS OF any changelog position instead of guessing
  * from the latest data. The repo already handles drift permissively
  * (A7) and widens the lake end-to-end (A20/D30); this closes the
  * remaining gap — an event feed a consumer can REPLAY.
  *
  * Model: per-table, a monotonically-sequenced log of column-level
  * events derived by DIFFING consecutive schema OBSERVATIONS (the
  * shape CDC actually gives you — Debezium parses DDL text; a lake
  * pipeline observes each batch's schema):
  *
  *  - `add`    — column appeared (`to_type` set)
  *  - `widen`  — column's type widened (`from_type` → `to_type`,
  *               [[SchemaEvolution.canWiden]] semantics)
  *  - `drop`   — column disappeared from observations (recorded, but
  *               REPLAY keeps it nullable — the lake never unlearns a
  *               column, matching D30's manifest widening; consumers
  *               that want strict views filter on the event)
  *
  * [[record]] appends the diff events + a schema snapshot in ONE
  * transactional commit (the same manifest-flip envelope as every
  * sink here — a crash never half-records a DDL); observing an
  * UNCHANGED schema is a zero-event no-op. [[replay]] folds the
  * events up to any sequence back into a StructType and is proven
  * (spec) to reconstruct every intermediate schema bit-exactly;
  * [[events]] is the consumable feed. Scale: commits are
  * event-count-sized (DDL is rare and tiny); replay reads a
  * |events|-row table — O(columns × changes), corpus-free.
  */
object SchemaHistory {

  val Table = "ddl"
  private val WmSeq = "wm.schemahistory"

  private def eventsSchemaOf(spark: SparkSession): DataFrame = {
    val st = StructType(Seq(
      StructField("table", StringType), StructField("seq", LongType),
      StructField("col", StringType), StructField("kind", StringType),
      StructField("from_type", StringType), StructField("to_type", StringType),
      StructField("observed_ms", LongType)))
    spark.createDataFrame(new java.util.ArrayList[Row](), st)
  }

  /** Latest recorded sequence for `table` (None before first record). */
  def lastSeq(spark: SparkSession, root: String, table: String): Option[Long] =
    TxLog.current(spark, root).flatMap(_.meta.get(s"$WmSeq.$table")).map(_.toLong)

  /** The replayable DDL feed for `table`, sequence-ordered. */
  def events(spark: SparkSession, root: String, table: String): DataFrame =
    PkTableSink.readTxGroup(spark, root, Table, eventsSchemaOf(spark))
      .where(col("table") === table)
      .orderBy(col("seq"), col("col"))

  /** Record one schema OBSERVATION: diff vs the last replayed schema,
    * append the column events (if any) in one transactional commit.
    * Returns the events appended (empty = schema unchanged, zero
    * commits). Idempotence: re-observing the same schema is a no-op,
    * so crash-redelivered batches re-record nothing. */
  def record(spark: SparkSession, root: String, table: String,
             observed: StructType, observedMs: Long = 0L,
             writer: String = "schemahistory"): Seq[(String, String)] = {
    // diff against the STRICT replay (the source's literal shape): a
    // dropped column must record ONE drop event, not one per
    // subsequent observation (the non-strict view keeps it forever)
    val prev = replay(spark, root, table, strict = true)
    val prevMap = prev.map(f => f.name -> f.dataType).toMap
    val obsMap = observed.fields.map(f => f.name -> f.dataType).toMap
    val adds = observed.fields.filterNot(f => prevMap.contains(f.name))
      .map(f => (f.name, "add", null: String, f.dataType.sql))
    val widens = observed.fields.flatMap { f =>
      prevMap.get(f.name) match {
        case Some(old) if old != f.dataType =>
          require(SchemaEvolution.canWiden(old, f.dataType),
            s"schema history $table.${f.name}: ${old.sql} -> " +
              s"${f.dataType.sql} is not a widening - reject, don't record")
          Some((f.name, "widen", old.sql, f.dataType.sql))
        case _ => None
      }
    }
    val drops = prev.fields.filterNot(f => obsMap.contains(f.name))
      .map(f => (f.name, "drop", f.dataType.sql, null: String))
    val evs = (adds ++ widens ++ drops).toSeq
    if (evs.isEmpty) return Nil
    val seq = lastSeq(spark, root, table).getOrElse(-1L) + 1
    import spark.implicits._
    val batch = evs.toDF("col", "kind", "from_type", "to_type")
      .withColumn("table", lit(table)).withColumn("seq", lit(seq))
      .withColumn("observed_ms", lit(observedMs))
      .withColumn("__del", lit(false))
    PkTableSink.mergeTxGroup(spark, root, Map(Table -> PkTableSink.TableBatch(
      batch, keyCols = Seq("table", "seq", "col"), versionCols = Seq("seq"),
      deleteFlag = "__del")),
      writer = writer, extraMeta = Map(s"$WmSeq.$table" -> seq.toString))
    evs.map(e => e._1 -> e._2)
  }

  /** Reconstruct `table`'s schema as of sequence `upTo` (inclusive;
    * MaxValue = current) by folding the event log. Dropped columns
    * stay, nullable — the lake never unlearns a column (D30
    * semantics); `strict = true` removes them instead (the consumer
    * view that wants the source's literal shape). */
  def replay(spark: SparkSession, root: String, table: String,
             upTo: Long = Long.MaxValue, strict: Boolean = false): StructType = {
    val evs = events(spark, root, table).where(col("seq") <= upTo)
      .select(col("seq"), col("col"), col("kind"), col("to_type"))
      .collect().sortBy(r => (r.getLong(0), r.getString(1)))
    evs.foldLeft(StructType(Nil)) { (schema, r) =>
      val (name, kind) = (r.getString(1), r.getString(2))
      kind match {
        case "add" | "widen" =>
          val dt = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
            .parseDataType(r.getString(3))
          StructType(schema.fields.filterNot(_.name == name) :+
            StructField(name, dt, nullable = true))
        case "drop" =>
          if (strict) StructType(schema.fields.filterNot(_.name == name))
          else schema
        case other => throw new IllegalStateException(s"unknown DDL kind $other")
      }
    }
  }
}
