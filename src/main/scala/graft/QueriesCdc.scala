package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Rounding
import org.apache.spark.sql.types._
import graft.cdc.{Envelope, MaterializedAgg, MaterializedJoin, MaterializedTopK, PkTable, RoutineLoad, SchemaEvolution, Scd2}

/** CDC / pipeline-core query surface (SURVEY §2 section A).
  *
  * The `events` table doubles as a deterministic CDC changelog:
  * key = user_id, version = (ts, event_id), and the op code derives
  * from event_type (signup→c, error→d, else u) — mirroring the
  * insert/update/delete stream `continuous-ingest.sh` drives through
  * the reference pipeline.
  */
object QueriesCdc {

  private val TsFmt = "yyyy-MM-dd HH:mm:ss"

  /** Recursively delete a gate query's temp root — best-effort (a
    * failed delete must not fail the gate; the OS tmp reaper is the
    * backstop), deepest-first via reverse-sorted walk. */
  private def deleteTree(p: java.nio.file.Path): Unit =
    try {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
      finally walk.close()
    } catch { case _: java.io.IOException => () }

  /** The iterative-MV gates call [[Ckpt.free]] on every SUPERSEDED
    * state inside their round loops — without it each run pins 8
    * corpus-scale checkpoint sets until process exit (the r13 ±2.24×
    * same-code bench swing). Safe only once every consumer of the
    * frame has MATERIALIZED. */
  private def freeCkpt(df: DataFrame): Unit = Ckpt.free(df)

  private def opCol: Column =
    when(col("event_type") === "signup", Envelope.OpCreate)
      .when(col("event_type") === "error", Envelope.OpDelete)
      .otherwise(Envelope.OpUpdate)

  /** events with the derived CDC op column. */
  private def changelog(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).withColumn("op", opCol)

  private val ordersPayload = StructType(Seq(
    StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType), StructField("o_orderpriority", StringType)))

  private val eventsPayload = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("value", DoubleType)))

  /** Deterministic DECIMAL(10,2) money amount derived from an integer
    * key — built via an exact string cast (never double→decimal, whose
    * half-value rounding differs between engines). Mirrors the
    * reference's `amount DECIMAL(10,2)` money columns
    * (mysql/init/01-init.sql:8).
    */
  private def decimalAmount(key: Column): Column =
    concat((key % 10000000).cast("string"), lit("."),
      lpad(((key * 7919) % 100).cast("string"), 2, "0")).cast(DecimalType(10, 2))

  private def decimalAmountSql(key: String): String =
    s"CAST(($key % 10000000) || '.' || lpad(CAST(($key * 7919) % 100 AS VARCHAR), 2, '0') AS DECIMAL(10,2))"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1: initial snapshot read (snapshot.mode=initial)
    "cdc_snapshot_read" -> ((s, dir) => Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        date_format(col("o_orderdate"), TsFmt).as("o_orderdate"),
        col("o_orderpriority"))
      .orderBy(col("o_orderkey"))),

    // A2: envelope encode → parse → ExtractNewRecordState roundtrip
    "cdc_envelope_roundtrip" -> { (s, dir) =>
      // repartition: the corpus parquet is one row group (one scan
      // task); real envelope feeds arrive partitioned (Kafka), so
      // spread the JSON codec work the same way
      val o = Tables.orders(s, dir).repartition(s.sparkContext.defaultParallelism)
      val payloadCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority").map(col)
      val enveloped = o.select(Envelope.encode(lit(Envelope.OpRead),
        (unix_timestamp(col("o_orderdate")) * 1000).as("tsms"),
        payloadCols, "testdb", "orders").as("json"))
      val parsed = enveloped.select(Envelope.parse(col("json"), ordersPayload).as("env"))
      Envelope.extractNewRecordState(parsed, col("env"), ordersPayload)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"),
          date_format(col("o_orderdate"), TsFmt).as("o_orderdate"),
          col("o_orderpriority"), col("__deleted"))
        .orderBy(col("o_orderkey"))
    },

    // A3: unwrap with delete.handling.mode=rewrite over the changelog
    "cdc_unwrap_rewrite" -> { (s, dir) =>
      val chg = changelog(s, dir).repartition(s.sparkContext.defaultParallelism)
      val payloadCols = Seq(col("event_id"), col("user_id"), col("value"))
      val enveloped = chg.select(Envelope.encode(col("op"),
        (col("ts").cast("double") * 1000).cast("long"),
        payloadCols, "testdb", "events").as("json"))
      val parsed = enveloped.select(Envelope.parse(col("json"), eventsPayload).as("env"))
      Envelope.extractNewRecordState(parsed, col("env"), eventsPayload)
        .select(col("event_id"), col("user_id"),
          Rounding.r(col("value"), 4).as("value"), col("__deleted"), col("__op"))
        .orderBy(col("event_id"))
    },

    // A4: primary-key table compaction (StarRocks PK upsert semantics)
    "cdc_upsert_latest" -> { (s, dir) =>
      val chg = changelog(s, dir)
      PkTable.compact(chg, Seq("user_id"),
        Seq(col("ts"), col("event_id")), col("op") === Envelope.OpDelete)
        .select(col("user_id"), col("event_type").as("last_type"),
          Rounding.r(col("value"), 4).as("last_value"),
          date_format(col("ts"), TsFmt).as("last_ts"))
        .orderBy(col("user_id"))
    },

    // A5: live vs soft-deleted key accounting (pipeline reconciliation)
    "cdc_delete_stats" -> { (s, dir) =>
      val chg = changelog(s, dir)
      val latest = chg.groupBy(col("user_id"))
        .agg(max_by(col("op"), struct(col("ts"), col("event_id"))).as("last_op"))
      latest.agg(
        count(lit(1)).as("n_keys"),
        sum(when(col("last_op") === Envelope.OpDelete, 1L).otherwise(0L)).as("n_deleted"),
        sum(when(col("last_op") =!= Envelope.OpDelete, 1L).otherwise(0L)).as("n_live"))
    },

    // A6: Routine-Load-style JSON-lines ingestion via jsonpaths
    "cdc_routine_load" -> { (s, dir) =>
      val o = Tables.orders(s, dir).repartition(s.sparkContext.defaultParallelism)
      val jsonLines = o.select(to_json(struct(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        date_format(col("o_orderdate"), TsFmt).as("o_orderdate"),
        col("o_orderpriority"))).as("line"))
      RoutineLoad.map(jsonLines, col("line"), Seq(
        RoutineLoad.ColumnSpec("o_orderkey", "$.o_orderkey", LongType),
        RoutineLoad.ColumnSpec("o_custkey", "$.o_custkey", LongType),
        RoutineLoad.ColumnSpec("o_orderstatus", "$.o_orderstatus", StringType),
        RoutineLoad.ColumnSpec("o_totalprice", "$.o_totalprice", DoubleType),
        RoutineLoad.ColumnSpec("o_orderdate", "$.o_orderdate", StringType),
        RoutineLoad.ColumnSpec("o_orderpriority", "$.o_orderpriority", StringType)))
        .orderBy(col("o_orderkey"))
    },

    // A7: schema drift tolerance — new column absent from old messages
    "cdc_schema_evolution" -> { (s, dir) =>
      val o = Tables.orders(s, dir).repartition(s.sparkContext.defaultParallelism)
      val oldMessages = o.select(to_json(struct(
        col("o_orderkey"), col("o_orderstatus"),
        lit("ignored-unknown-field").as("o_legacy"))).as("line"))
      val evolved = StructType(Seq(
        StructField("o_orderkey", LongType), StructField("o_orderstatus", StringType),
        StructField("o_channel", StringType)))
      RoutineLoad.fromJsonTyped(oldMessages, col("line"), evolved)
        .select(col("o_orderkey"), col("o_orderstatus"),
          coalesce(col("o_channel"), lit("unknown")).as("o_channel"))
        .orderBy(col("o_orderkey"))
    },

    // A11: Kafka-Connect schema+payload message shape — the exact wire
    // format the reference's Routine Load consumes ($.payload.* paths)
    "cdc_kafka_message" -> { (s, dir) =>
      val o = Tables.orders(s, dir).repartition(s.sparkContext.defaultParallelism)
      val messages = o.select(Envelope.encodeConnectMessage(Seq(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        date_format(col("o_orderdate"), TsFmt).as("o_orderdate"),
        col("o_orderpriority")), "testdb", "orders").as("line"))
      RoutineLoad.map(messages, col("line"), Seq(
        RoutineLoad.ColumnSpec("o_orderkey", "$.payload.o_orderkey", LongType),
        RoutineLoad.ColumnSpec("o_custkey", "$.payload.o_custkey", LongType),
        RoutineLoad.ColumnSpec("o_orderstatus", "$.payload.o_orderstatus", StringType),
        RoutineLoad.ColumnSpec("o_totalprice", "$.payload.o_totalprice", DoubleType),
        RoutineLoad.ColumnSpec("o_orderdate", "$.payload.o_orderdate", StringType),
        RoutineLoad.ColumnSpec("o_orderpriority", "$.payload.o_orderpriority", StringType)))
        .orderBy(col("o_orderkey"))
    },

    // A12: salted two-phase compaction — identical result to A4 by
    // associativity of max_by; the skew path for hot keys
    "cdc_upsert_salted" -> { (s, dir) =>
      val chg = changelog(s, dir)
      PkTable.compactSalted(chg, Seq("user_id"),
        Seq(col("ts"), col("event_id")), col("op") === Envelope.OpDelete, salts = 8)
        .select(col("user_id"), col("event_type").as("last_type"),
          Rounding.r(col("value"), 4).as("last_value"),
          date_format(col("ts"), TsFmt).as("last_ts"))
        .orderBy(col("user_id"))
    },

    // A13: error-row accounting — Routine Load's max_error_number
    // counters: corrupt lines are detected in the same parse pass and
    // routed/counted, never silently dropped
    "cdc_error_rows" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      // deterministically corrupt ~10% of the feed
      val lines = o.select(
        when(col("o_orderkey") % 10 === 7,
          concat(lit("CORRUPT{"), col("o_orderkey")))
          .otherwise(to_json(struct(col("o_orderkey"), col("o_totalprice"))))
          .as("line"))
      val schema = StructType(Seq(
        StructField("o_orderkey", LongType), StructField("o_totalprice", DoubleType)))
      val parsed = RoutineLoad.mapWithErrors(lines, col("line"), schema, "o_orderkey")
      parsed.agg(
        sum(when(col("__error"), 0L).otherwise(1L)).as("n_good"),
        sum(when(col("__error"), 1L).otherwise(0L)).as("n_error"),
        sum(when(col("__error"), 0L).otherwise(col("o_orderkey"))).as("good_key_sum"))
    },

    // A18: DECIMAL money round-trip — DECIMAL(10,2) survives envelope
    // encode → JSON → parse → unwrap bit-exactly (no double rounding
    // dance), then feeds an exact ledger aggregate. CDC engines that
    // store money as double mis-sum real ledgers; this is the typed
    // path the reference's DECIMAL(10,2) columns require.
    "cdc_decimal_roundtrip" -> { (s, dir) =>
      val o = Tables.orders(s, dir).repartition(s.sparkContext.defaultParallelism)
        .withColumn("amount", decimalAmount(col("o_orderkey")))
      val payload = StructType(Seq(
        StructField("o_orderkey", LongType), StructField("o_orderstatus", StringType),
        StructField("amount", DecimalType(10, 2))))
      val enveloped = o.select(Envelope.encode(lit(Envelope.OpRead),
        (unix_timestamp(col("o_orderdate")) * 1000).as("tsms"),
        Seq(col("o_orderkey"), col("o_orderstatus"), col("amount")),
        "testdb", "orders").as("json"))
      Envelope.unwrap(enveloped, col("json"), payload)
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("amount")).cast(DecimalType(18, 2)).as("total_amount"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    },

    // A19: DECIMAL through PK compaction — latest-wins upsert keeps the
    // decimal column exact end-to-end. The DECIMAL(10,2) flows through
    // the compaction untouched; the EXPORT is integer cents (decimal
    // parquet physical encodings differ across engines and defeated
    // value-level hash comparison twice — integers are
    // representation-unambiguous).
    "cdc_decimal_upsert" -> { (s, dir) =>
      val chg = changelog(s, dir).withColumn("amount", decimalAmount(col("event_id")))
      PkTable.compact(chg, Seq("user_id"),
        Seq(col("ts"), col("event_id")), col("op") === Envelope.OpDelete)
        .select(col("user_id"),
          (col("amount") * 100).cast("long").as("last_amount_cents"))
        .orderBy(col("user_id"))
    },

    // A20: type-widening schema evolution — the stored snapshot has
    // INT key / FLOAT balance, the changelog arrives BIGINT/DOUBLE;
    // widenMerge evolves the schema losslessly (narrowing throws) and
    // runs the latest-wins merge over the widened frames
    "cdc_schema_widening" -> { (s, dir) =>
      val snap = Tables.customer(s, dir).select(
        col("c_custkey").cast("int").as("k"),
        col("c_acctbal").cast("float").as("bal"),
        lit("1970-01-01 00:00:00").cast("timestamp").as("ver_ts"),
        lit(-1L).as("ver_seq"))
      val chg = changelog(s, dir).select(
        col("user_id").as("k"), col("value").as("bal"),
        col("ts").as("ver_ts"), col("event_id").as("ver_seq"),
        (col("op") === Envelope.OpDelete).as("del"))
      SchemaEvolution.widenMerge(snap, chg, Seq("k"), Seq("ver_ts", "ver_seq"), "del")
        .select(col("k"), Rounding.r(col("bal"), 4).as("bal"))
        .orderBy(col("k"))
    },

    // A21: SCD2 temporal view of the changelog — every change becomes
    // a version with a half-open [valid_from, valid_to) interval (one
    // window pass; cdc/Scd2.scala). The binlog IS this history; here
    // it's materialized queryably.
    "cdc_scd2_intervals" -> { (s, dir) =>
      val cap = lit("2024-12-31 00:00:00").cast("timestamp")
      Scd2.intervals(Tables.events(s, dir).select(
          col("user_id"), col("event_id"), col("ts"), col("value")),
          keyCol = col("user_id"), tsCol = col("ts"),
          tiebreak = col("event_id"), cap = cap)
        .select(col("user_id"), col("event_id"),
          date_format(col("valid_from"), TsFmt).as("valid_from"),
          date_format(col("valid_to"), TsFmt).as("valid_to"),
          graft.functions.Rounding.r(col("value"), 4).as("value"))
        .orderBy(col("event_id"))
    },

    // A22: point-in-time lookup ("state AS OF t") — every 7th event is
    // a probe into the same user's SCD2 timeline; the join runs as the
    // bucketed range equi-join in exact epoch microseconds.
    "cdc_scd2_lookup" -> { (s, dir) =>
      val e = Tables.events(s, dir)
      val cap = lit("2024-12-31 00:00:00").cast("timestamp")
      val iv = Scd2.intervals(e.select(
          col("user_id").as("i_user"), col("event_id").as("s_event"),
          col("ts").as("i_ts"), col("value")),
          keyCol = col("i_user"), tsCol = col("i_ts"),
          tiebreak = col("s_event"), cap = cap)
      val pts = e.where(col("event_id") % 7 === 0)
        .select(col("event_id").as("p_event"), col("user_id"), col("ts").as("p_ts"))
      Scd2.asOfLookup(iv, col("i_user"), pts, col("user_id"), col("p_ts"),
          bucketWidthUs = 86400L * 1000000L)
        .select(col("p_event"), col("user_id"), col("s_event"),
          graft.functions.Rounding.r(col("value"), 4).as("value"))
        .orderBy(col("p_event"))
    },

    // A23: validity-interval OVERLAP join over versioned rows — for
    // every gap-based session (30-min, as in B12), each SCD2 version
    // of the same user whose validity intersects the session: "which
    // states was this user in during this session". Plans as the
    // bucketed interval-overlap equi-join (RangeJoin.intervalOverlap),
    // never a per-key nested loop.
    "cdc_interval_overlap" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val e = Tables.events(s, dir)
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val sess = e.select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1).otherwise(0))
        .withColumn("sess",
          sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("sess"))
        .agg(min(col("ts")).as("s_start"), max(col("ts")).as("s_end"))
      val cap = lit("2024-12-31 00:00:00").cast("timestamp")
      val iv = Scd2.intervals(e.select(
          col("user_id").as("i_user"), col("event_id").as("s_event"),
          col("ts").as("i_ts")),
          keyCol = col("i_user"), tsCol = col("i_ts"),
          tiebreak = col("s_event"), cap = cap)
      Scd2.overlappingVersions(iv, col("i_user"),
          sess, col("user_id"), col("s_start"), col("s_end"),
          bucketWidthUs = 86400L * 1000000L)
        .select(col("user_id"), col("sess"), col("s_event"))
        .orderBy(col("user_id"), col("sess"), col("s_event"))
    },

    // A24: incremental materialized aggregate view (StarRocks MV
    // analogue): per-event_type count + sum(value) over the LIVE
    // latest state of every user, maintained across 4 interleaved
    // changelog batches with sign-based retraction deltas — never a
    // full recompute. Batching by event_id % 4 deliberately delivers
    // versions out of order across batches: the state-diff delta
    // construction must absorb stale versions (they lose
    // latestPerKey and cancel). Oracle computes the final state
    // aggregate directly — equality proves incremental == recompute.
    // A31: incremental JOIN materialized view — the StarRocks
    // multi-table sync MV, maintained by the signed bilinear delta
    // (MaterializedJoin) across four interleaved CDC rounds on BOTH
    // tables. The round split stresses every arrival order: orders
    // land before their customer exists (caught later by L_old ⋈ ΔR),
    // customers die before/after referencing orders arrive, and the
    // oracle is simply the live join — four rounds of deltas must
    // reproduce it exactly.
    "cdc_mv_join" -> { (s, dir) =>
      val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"),
        lit(1L).as("ov"), (col("o_orderkey") % 13 === 3).as("odel"))
      val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_name"),
        lit(1L).as("cv"), (col("c_custkey") % 17 === 5).as("cdel"))
      val outCols = Seq("o_orderkey", "o_custkey", "c_name")
      var sl = MaterializedJoin.emptyState(o, col("odel"))
      var sr = MaterializedJoin.emptyState(c, col("cdel"))
      // states checkpoint per round (each is read twice by the next
      // step); the signed deltas are only Σ'd, so ONE associative
      // mergeMv over the union replaces four checkpointed merges —
      // same result by sign additivity, 4 fewer jobs. Deltas stay
      // LAZY (checkpointing them would re-run each round's join work
      // as an extra eager job — measured +2.5 s), so the superseded
      // states can only be freed AFTER the result materializes; the
      // point of the freeing is cross-suite hygiene (a bench pass
      // runs this 4× and previously left 8 corpus-scale checkpoint
      // sets pinned per run — the r13 ±2.24× same-code swing), and
      // end-of-query freeing delivers exactly that for zero extra
      // jobs.
      var states: Seq[DataFrame] = Nil
      var deltas: Seq[DataFrame] = Nil
      (0 until 4).foreach { i =>
        val st = MaterializedJoin.step(
          sl, o.where(pmod(col("o_orderkey"), lit(4)) === i),
          Seq("o_orderkey"), Seq(col("ov")), col("odel"),
          sr, c.where(pmod(col("c_custkey"), lit(4)) === i),
          Seq("c_custkey"), Seq(col("cv")), col("cdel"),
          joinL = Seq("o_custkey"), joinR = Seq("c_custkey"), outCols = outCols)
        // the two state materializations are independent jobs —
        // overlapped (guide §2.6), identical results
        val Seq(nsl, nsr) =
          Par.map(Seq(st.stateL, st.stateR))(_.localCheckpoint(true))
        sl = nsl; sr = nsr
        states = states ++ Seq(sl, sr)
        deltas = deltas :+ st.delta
      }
      val out = MaterializedJoin
        .mergeMv(None, deltas.reduce(_ unionByName _), outCols)
        .drop("__mult").orderBy(col("o_orderkey"))
        .localCheckpoint(true) // result-sized; all deltas consumed here
      states.foreach(freeCkpt)
      out
    },

    // A32: JOIN + AGGREGATE materialized view — the full StarRocks MV
    // shape (SELECT c_name, count(*), sum(price) FROM orders JOIN
    // customer GROUP BY c_name), maintained compositionally: the
    // signed JOIN delta (A31) IS a retract stream, so MaterializedAgg
    // .groupDelta folds it into per-group adjustments with zero new
    // machinery — the bilinear and the linear operators compose.
    // Money rides as integer CENTS (floor(x·100+0.5)) so retract
    // arithmetic is exact under any delta order; groups whose count
    // reaches zero vanish (inner-join + agg semantics)
    "cdc_mv_join_agg" -> { (s, dir) =>
      val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
        lit(1L).as("ov"), (col("o_orderkey") % 13 === 3).as("odel"))
      val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_name"),
        lit(1L).as("cv"), (col("c_custkey") % 17 === 5).as("cdel"))
      var sl = MaterializedJoin.emptyState(o, col("odel"))
      var sr = MaterializedJoin.emptyState(c, col("cdel"))
      // lazy deltas + end-of-query state freeing — cdc_mv_join's
      // discipline (see the note there)
      var states: Seq[DataFrame] = Nil
      var gds: Seq[DataFrame] = Nil
      (0 until 4).foreach { i =>
        val st = MaterializedJoin.step(
          sl, o.where(pmod(col("o_orderkey"), lit(4)) === i),
          Seq("o_orderkey"), Seq(col("ov")), col("odel"),
          sr, c.where(pmod(col("c_custkey"), lit(4)) === i),
          Seq("c_custkey"), Seq(col("cv")), col("cdel"),
          joinL = Seq("o_custkey"), joinR = Seq("c_custkey"),
          outCols = Seq("o_orderkey", "cents", "c_name"))
        // the two state materializations are independent jobs —
        // overlapped (guide §2.6), identical results
        val Seq(nsl, nsr) =
          Par.map(Seq(st.stateL, st.stateR))(_.localCheckpoint(true))
        sl = nsl; sr = nsr
        states = states ++ Seq(sl, sr)
        gds = gds :+ MaterializedAgg.groupDelta(st.delta, Seq("c_name"),
          Seq("cents" -> col("cents")))
      }
      val out = MaterializedAgg.mergeMv(None, gds.reduce(_ unionByName _),
          Seq("c_name"), Seq("cents"))
        .select(col("c_name"), col("n"),
          Rounding.r(col("cents").cast("double") / 100, 2).as("revenue"))
        .orderBy(col("c_name"))
        .localCheckpoint(true) // view-sized; all group deltas consumed here
      states.foreach(freeCkpt)
      out
    },

    "cdc_mv_incremental" -> { (s, dir) =>
      val chg = changelog(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), col("value"), col("op"))
      val batches = (0 until 4).map(i =>
        chg.where(pmod(col("event_id"), lit(4)) === i))
      MaterializedAgg.maintain(batches,
          keyCols = Seq("user_id"), version = Seq(col("ts"), col("event_id")),
          deleteFlag = col("op") === Envelope.OpDelete,
          groupCols = Seq("event_type"), sums = Seq("total" -> col("value")))
        .select(col("event_type"), col("n"),
          Rounding.r(col("total"), 4).as("total"))
        .orderBy(col("event_type"))
    },

    // A39: MIN/MAX incremental MV — the canonical NON-self-maintainable
    // aggregates (StarRocks sync MVs support min/max agg columns;
    // create-starrocks-tables.sh's aggregate tables). Sums absorb a
    // retraction as −v; retracting the row that WAS the minimum says
    // nothing about the new minimum, so MaterializedAgg.mergeMvMinMax
    // rescans ONLY groups whose retracted value tied the stored
    // extremum, reading the live key-state restricted to those groups
    // — per-batch work ∝ batch + affected-group sizes, never corpus.
    // 4 interleaved CDC rounds (updates, deletes, group migration via
    // users whose latest event_type changes) then compared value-exact
    // to the oracle's full recompute over latest-per-key state.
    "cdc_mv_minmax" -> { (s, dir) =>
      val chg = changelog(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), col("value"), col("op"))
      val batches = (0 until 4).map(i =>
        chg.where(pmod(col("event_id"), lit(4)) === i))
      MaterializedAgg.maintainMinMax(batches,
          keyCols = Seq("user_id"), version = Seq(col("ts"), col("event_id")),
          deleteFlag = col("op") === Envelope.OpDelete,
          groupCols = Seq("event_type"), sums = Seq("total" -> col("value")),
          exts = Seq(
            MaterializedAgg.Extremum("vmin", col("value"), isMin = true),
            MaterializedAgg.Extremum("vmax", col("value"), isMin = false)))
        .select(col("event_type"), col("n"),
          Rounding.r(col("total"), 4).as("total"),
          Rounding.r(col("vmin"), 4).as("vmin"),
          Rounding.r(col("vmax"), 4).as("vmax"))
        .orderBy(col("event_type"))
    },

    // A40: TOP-K-PER-GROUP incremental MV — the materialized TOPN the
    // reference keeps warm as a hand-run ranking query (monitor.sh's
    // top-customers checks), generalizing A39's k=1 treatment: inserts
    // never rescan (new top-k ⊆ stored ∪ inserts, one bounded rank),
    // only retracting a STORED MEMBER rescans its group from the live
    // key-state (below-k retractions cannot change membership). 4
    // interleaved CDC rounds, then the ranked view value-exact vs the
    // oracle's row_number over the full latest-per-key recompute.
    "cdc_mv_topk" -> { (s, dir) =>
      val chg = changelog(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), col("value"), col("op"))
      val batches = (0 until 4).map(i =>
        chg.where(pmod(col("event_id"), lit(4)) === i))
      MaterializedTopK.maintain(batches,
          keyCols = Seq("user_id"), version = Seq(col("ts"), col("event_id")),
          deleteFlag = col("op") === Envelope.OpDelete,
          groupCols = Seq("event_type"), value = col("value"), k = 3)
        .select(col("event_type"), col("rank"), col("user_id"),
          Rounding.r(col("value"), 4).as("value"))
        .orderBy(col("event_type"), col("rank"))
    },

    // A41 (r16): MIN/MAX on the JOIN-MV path — the r15 verdict's #6
    // ask: A39's non-self-maintainable extremum rule (Gupta & Mumick
    // insert-merge / retraction-rescan) composed with the N-way
    // transactional join maintenance (MaterializedJoin
    // .maintainAggMinMaxTx): the rescan reads the live JOIN of
    // affected groups (group-keyed semi pushed below the join by
    // Catalyst), never corpus ⋈ corpus. 4 interleaved 2-table CDC
    // rounds with TWO delete channels — tombstones at first sight
    // (odel/cdel) plus a SECOND-WAVE kill of live orders in the price
    // TAILS (top/bottom ~2% of every segment, version 2, delete round
    // decoupled from the insert round): exactly the extremum
    // retractions that cannot be absorbed monotonically. One stale
    // replay is re-applied and must be watermark-skipped. Final view
    // hash-exact vs the oracle's live join over the final states.
    "mv_join_minmax" -> { (s, dir) =>
      import graft.cdc.MaterializedJoin.BatchIn
      import graft.cdc.MaterializedAgg.Extremum
      import graft.sinks.PkTableSink
      val tmp = TmpSweep.gateTempDir("mvjm_gate")
      try {
        val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
          lit(1L).as("ov"), (col("o_orderkey") % 13 === 3).as("odel"))
        val c = Tables.customer(s, dir).select(col("c_custkey"),
          col("c_mktsegment"), lit(1L).as("cv"),
          (col("c_custkey") % 17 === 5).as("cdel"))
        // second-wave EXTREMUM deletes: live orders in the price tails
        // killed at version 2 in a round decoupled from the insert
        // round (3·key+1 mod 4 — some tombstones arrive BEFORE their
        // insert and must defeat it by version)
        val delWave = o.where(!col("odel") &&
            (col("cents") > 49000000L || col("cents") < 1100000L))
          .select(col("o_orderkey"), col("o_custkey"), col("cents"),
            lit(2L).as("ov"), lit(true).as("odel"))
        def oBatch(i: Int): DataFrame =
          o.where(pmod(col("o_orderkey"), lit(4)) === i)
            .unionByName(delWave.where(pmod(col("o_orderkey") * 3 + 1, lit(4)) === i))
        val root = tmp.toString + "/jmv/g"
        def round(i: Int): Boolean =
          MaterializedJoin.maintainAggMinMaxTx(root, Seq(
            BatchIn("o", oBatch(i), Seq("o_orderkey"), Seq("ov"), col("odel")),
            BatchIn("c", c.where(pmod(col("c_custkey"), lit(4)) === i),
              Seq("c_custkey"), Seq("cv"), col("cdel"))),
            Seq("o_custkey" -> "c_custkey"),
            outCols = Seq("cents", "c_mktsegment"),
            groupCols = Seq("c_mktsegment"), sums = Seq("cents" -> col("cents")),
            exts = Seq(Extremum("min_cents", col("cents"), isMin = true),
              Extremum("max_cents", col("cents"), isMin = false)),
            batchId = i, writer = "gate")
        (0 until 4).foreach(i => require(round(i), s"round $i must apply"))
        require(!round(2), "stale replay must be watermark-skipped (zero jobs)")
        val schemaOf = {
          import s.implicits._
          Seq.empty[(String, Long, Long, Long, Long, Long)]
            .toDF("c_mktsegment", "n", "cents", "min_cents", "max_cents",
              "batch_id")
        }
        PkTableSink.readTxGroup(s, root, "mv", schemaOf)
          .select(col("c_mktsegment"), col("n"), col("cents"),
            col("min_cents"), col("max_cents"))
          .orderBy(col("c_mktsegment"))
          .localCheckpoint(true)
      } finally deleteTree(tmp)
    },

    // A42 (r17): TOP-K on the JOIN-MV path — the r16 verdict's #4 ask
    // (the one spec-only MV-maintenance kind left): MaterializedTopK's
    // member-retraction-only rescan rule composed with the N-way
    // signed join delta (MaterializedJoin.maintainTopKTx), in the A41
    // gate's two-delete-channel shape. 4 interleaved 2-table CDC
    // rounds: first-sight tombstones (odel/cdel) PLUS a second-wave
    // kill of live orders in the price TAILS at version 2 in a
    // decoupled round (3·key+1 mod 4 — some tombstones precede their
    // insert and must defeat it by version). The TOP-tail kills are
    // exactly stored-MEMBER retractions (group rescans over the live
    // join of affected groups, semi pushed below the join); the
    // BOTTOM-tail kills are below-k retractions that must NOT change
    // membership. One stale replay is watermark-skipped. The ranked
    // view (k=3 per segment, ties broken by o_orderkey — identical
    // total order in both engines) is hash-exact vs the oracle's
    // row_number over the live join of the final states. Reference
    // shape: monitor.sh's top-customers ranking kept warm.
    "mv_join_topk" -> { (s, dir) =>
      import graft.cdc.MaterializedJoin.BatchIn
      import graft.cdc.MaterializedTopK
      import graft.sinks.PkTableSink
      val tmp = TmpSweep.gateTempDir("mvjtk_gate")
      try {
        val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
          lit(1L).as("ov"), (col("o_orderkey") % 13 === 3).as("odel"))
        val c = Tables.customer(s, dir).select(col("c_custkey"),
          col("c_mktsegment"), lit(1L).as("cv"),
          (col("c_custkey") % 17 === 5).as("cdel"))
        val delWave = o.where(!col("odel") &&
            (col("cents") > 49000000L || col("cents") < 1100000L))
          .select(col("o_orderkey"), col("o_custkey"), col("cents"),
            lit(2L).as("ov"), lit(true).as("odel"))
        def oBatch(i: Int): DataFrame =
          o.where(pmod(col("o_orderkey"), lit(4)) === i)
            .unionByName(delWave.where(pmod(col("o_orderkey") * 3 + 1, lit(4)) === i))
        val root = tmp.toString + "/jtk/g"
        def round(i: Int): Boolean =
          MaterializedJoin.maintainTopKTx(root, Seq(
            BatchIn("o", oBatch(i), Seq("o_orderkey"), Seq("ov"), col("odel")),
            BatchIn("c", c.where(pmod(col("c_custkey"), lit(4)) === i),
              Seq("c_custkey"), Seq("cv"), col("cdel"))),
            Seq("o_custkey" -> "c_custkey"),
            outCols = Seq("o_orderkey", "cents", "c_mktsegment"),
            groupCols = Seq("c_mktsegment"), keyCols = Seq("o_orderkey"),
            value = col("cents"), k = 3, batchId = i, writer = "gate")
        (0 until 4).foreach(i => require(round(i), s"round $i must apply"))
        require(!round(2), "stale replay must be watermark-skipped (zero jobs)")
        val schemaOf = {
          import s.implicits._
          Seq.empty[(String, Long, Long, Long)]
            .toDF("c_mktsegment", "o_orderkey", "__topk_v", "batch_id")
        }
        MaterializedTopK.rank(
            PkTableSink.readTxGroup(s, root, "mv", schemaOf),
            Seq("c_mktsegment"), Seq("o_orderkey"), "cents")
          .select(col("c_mktsegment"), col("rank").as("rnk"),
            col("o_orderkey"), col("cents"))
          .orderBy(col("c_mktsegment"), col("rnk"))
          .localCheckpoint(true)
      } finally deleteTree(tmp)
    },

    // A10: initial snapshot + changelog tail merged into one view
    "cdc_snapshot_then_merge" -> { (s, dir) =>
      val snap = Tables.customer(s, dir).select(
        col("c_custkey").as("k"), col("c_name").as("name"),
        col("c_acctbal").as("bal"), col("c_mktsegment").as("seg"),
        lit("1970-01-01 00:00:00").cast("timestamp").as("ver_ts"),
        lit(-1L).as("ver_seq"), lit("x").as("event_type"))
      val chg = changelog(s, dir).select(
        col("user_id").as("k"), concat(lit("user_"), col("user_id")).as("name"),
        col("value").as("bal"), lit("EVENT").as("seg"),
        col("ts").as("ver_ts"), col("event_id").as("ver_seq"), col("event_type"))
      PkTable.snapshotMerge(snap, chg, Seq("k"),
        Seq(col("ver_ts"), col("ver_seq")), col("event_type") === "error")
        .select(col("k"), col("name"), Rounding.r(col("bal"), 4).as("bal"), col("seg"))
        .orderBy(col("k"))
    },

    // A43 (r17): DBLog-style INCREMENTAL (chunked) RE-SNAPSHOT
    // interleaved with a live changelog — the r16 verdict's #8 ask
    // (the reference pins snapshot.mode=initial; Debezium 3's ad-hoc
    // incremental snapshot is the watermark-chunked re-snapshot a
    // production user needs for backfill/new-table onboarding). Four
    // changelog batches (updates +$1000 on k%3==1 spread by k%4;
    // deletes on k%7==2 spread by (3k+1)%4 — DECOUPLED, so a delete
    // may precede or follow its key's chunk, and a key both updated
    // and deleted resolves by APPEND ORDER) interleave with four
    // PK-range chunks of the customer table. Every chunk read is
    // deliberately TORN for its in-flight batch: even keys already
    // show the batch's effect, odd keys don't, and in-flight deleted
    // rows still linger in the read — exactly the ambiguity the
    // window suppression must cover (order is the authority, so an
    // unsuppressed stale row appended after its event would WIN and
    // hash-mismatch). Replays of an applied batch and a completed
    // chunk are proven watermark-skipped (the restart guard). Final
    // converged state is hash-exact vs the oracle's closed form.
    "cdc_snapshot_incremental" -> { (s, dir) =>
      import graft.cdc.IncrementalSnapshot
      val tmp = TmpSweep.gateTempDir("snapchunk_gate")
      try {
        val root = tmp.toString + "/snap/g"
        val cust = Tables.customer(s, dir).select(col("c_custkey"), col("c_name"),
          floor(col("c_acctbal") * 100 + 0.5).cast("long").as("bal_cents"),
          col("c_mktsegment"))
        val upd = cust.where(col("c_custkey") % 3 === 1)
          .withColumn("bal_cents", col("bal_cents") + 100000L)
          .withColumn("del", lit(false))
        val dels = cust.where(col("c_custkey") % 7 === 2)
          .withColumn("del", lit(true))
        def batch(i: Int): DataFrame =
          upd.where(pmod(col("c_custkey"), lit(4)) === i)
            .unionByName(dels.where(pmod(col("c_custkey") * 3 + 1, lit(4)) === i))
        // the source state a chunk read at position i observes: batches
        // < i fully applied; batch i (in flight) applied only for EVEN
        // keys — the torn read
        def sourceAt(i: Int): DataFrame = {
          val updApplied = upd.where(
            pmod(col("c_custkey"), lit(4)) < i ||
              (pmod(col("c_custkey"), lit(4)) === i && col("c_custkey") % 2 === 0))
            .drop("del")
          val delApplied = dels.where(
            pmod(col("c_custkey") * 3 + 1, lit(4)) < i ||
              (pmod(col("c_custkey") * 3 + 1, lit(4)) === i && col("c_custkey") % 2 === 0))
          cust.join(updApplied.select("c_custkey"), Seq("c_custkey"), "left_anti")
            .unionByName(updApplied)
            .join(delApplied.select("c_custkey"), Seq("c_custkey"), "left_anti")
        }
        val bounds = cust.agg(min(col("c_custkey")).as("lo"),
          max(col("c_custkey")).as("hi")).head()
        val chunks = IncrementalSnapshot.planChunks(
          bounds.getLong(0), bounds.getLong(1), 4)
        (0 until 4).foreach { i =>
          require(IncrementalSnapshot.appendBatch(root, batch(i),
            Seq("c_custkey"), col("del"), seq = 2L * i), s"batch $i must apply")
          val ch = chunks(i)
          val chunkRows = sourceAt(i)
            .where(col("c_custkey") >= ch.lo && col("c_custkey") < ch.hi)
          require(IncrementalSnapshot.appendChunk(root, chunkRows,
            Seq("c_custkey"), windowKeys = batch(i), chunkId = i,
            seq = 2L * i + 1), s"chunk $i must apply")
        }
        // restart guards: an applied batch and a completed chunk replay
        // as no-ops (zero jobs), so a killed-and-restarted snapshot
        // resumes instead of double-appending
        require(!IncrementalSnapshot.appendBatch(root, batch(1),
          Seq("c_custkey"), col("del"), seq = 2L),
          "replayed batch must be watermark-skipped")
        require(!IncrementalSnapshot.appendChunk(root,
          sourceAt(1), Seq("c_custkey"), batch(1), chunkId = 1, seq = 3L),
          "completed chunk must be watermark-skipped")
        require(IncrementalSnapshot.completedChunk(s, root).contains(3),
          "all four chunks must be recorded complete")
        val schemaOf = {
          import s.implicits._
          Seq.empty[(Long, String, Long, String, Long)]
            .toDF("c_custkey", "c_name", "bal_cents", "c_mktsegment",
              IncrementalSnapshot.SeqCol)
        }
        IncrementalSnapshot.state(s, root, schemaOf)
          .select(col("c_custkey"), col("c_name"), col("bal_cents"),
            col("c_mktsegment"))
          .orderBy(col("c_custkey"))
          .localCheckpoint(true)
      } finally deleteTree(tmp)
    },

    // D37 in the GATE (r12): the QskMv transactional percentile-sketch
    // MV driven end-to-end inside a driver-checked query — three
    // deterministic event batches maintained through maintainTx (one
    // manifest commit per batch, plus one REPLAYED batch id proving
    // the per-writer watermark skips it without running jobs), then a
    // B69-shape rollup served from the COMMITTED sketch column, never
    // from raw event history. Sketch estimates are engine-internal →
    // output is the B69 bound-flag construction: exact counts the
    // oracle recomputes plus 5% rank flags it expects TRUE, via a
    // per-type broadcast rank recount.
    "qsk_mv_rollup" -> { (s, dir) =>
      import graft.streaming.QskMv
      val tmp = TmpSweep.gateTempDir("qskmv_gate")
      val root = tmp.toString + "/mv"
      // the rollup is MATERIALIZED (a handful of per-type rows) before
      // the finally deletes the gate's committed roots — bench drives
      // this query dozens of times per round and each run must leave
      // /tmp clean, not accumulate orphaned sketch-MV parquet
      val rolled = try {
        val ev = Tables.events(s, dir).select(col("event_type"),
          to_date(col("ts")).as("day"), col("value"), col("event_id"))
        (0 until 3).foreach { i =>
          def run() = QskMv.maintainTx(root,
            ev.where(pmod(col("event_id"), lit(3)) === i), i,
            Seq("event_type", "day"), col("value"), writer = "gate")
          require(run(), s"qsk_mv_rollup: batch $i must apply")
          if (i == 1) require(!run(),
            "qsk_mv_rollup: replayed batch must be watermark-skipped")
        }
        val schemaOf = {
          import s.implicits._
          Seq.empty[(String, java.sql.Date, graft.functions.Qsk.Sk, Long, Long)]
            .toDF("event_type", "day", "sk", "n", "batch_id")
        }
        QskMv.rollup(QskMv.readMv(s, root, schemaOf),
          Seq("event_type"), Seq(0.5, 0.9)).localCheckpoint(true)
      } finally deleteTree(tmp)
      def ok(r: String, q: Double) =
        abs(col(r) - lit(q) * col("n_events")) <=
          lit(0.05) * col("n_events") + lit(1.0)
      Tables.events(s, dir)
        .join(broadcast(rolled), "event_type")
        .groupBy(col("event_type"), col("n_events"),
          col("n_keys").as("n_days"))
        .agg(sum((col("value") <= col("p50_est")).cast("long")).as("r50"),
          sum((col("value") <= col("p90_est")).cast("long")).as("r90"))
        .select(col("event_type"), col("n_events"), col("n_days"),
          ok("r50", 0.5).as("p50_ok"), ok("r90", 0.9).as("p90_ok"))
        .orderBy(col("event_type"))
    },

    // D38 in the GATE (r12): the KmvMv transactional DISTINCT-COUNT
    // sketch MV (the StarRocks HLL aggregate-column workflow on the
    // KMV bottom-k sketch) driven end-to-end — qsk_mv_rollup's
    // construction: three deterministic event batches through
    // maintainTx plus one REPLAYED id the per-writer watermark must
    // skip, then a distinct-users-per-type rollup served from the
    // COMMITTED sketch column, never from raw event history. Output
    // is exact counts the oracle recomputes plus an estimator flag it
    // expects TRUE (KMV estimates are hash-deterministic — the flag
    // cannot flap run to run; a sketch regression turns the row red).
    "kmv_mv_rollup" -> { (s, dir) =>
      import graft.streaming.KmvMv
      val tmp = TmpSweep.gateTempDir("kmvmv_gate")
      val root = tmp.toString + "/mv"
      // materialize-then-delete, same as qsk_mv_rollup above
      val rolled = try {
        val ev = Tables.events(s, dir).select(col("event_type"),
          to_date(col("ts")).as("day"), col("user_id"), col("event_id"))
        (0 until 3).foreach { i =>
          def run() = KmvMv.maintainTx(root,
            ev.where(pmod(col("event_id"), lit(3)) === i), i,
            Seq("event_type", "day"), col("user_id"), writer = "gate")
          require(run(), s"kmv_mv_rollup: batch $i must apply")
          if (i == 1) require(!run(),
            "kmv_mv_rollup: replayed batch must be watermark-skipped")
        }
        val schemaOf = {
          import s.implicits._
          Seq.empty[(String, java.sql.Date, Array[Long], Long, Long)]
            .toDF("event_type", "day", "sk", "n", "batch_id")
        }
        KmvMv.rollup(KmvMv.readMv(s, root, schemaOf),
          Seq("event_type")).localCheckpoint(true)
      } finally deleteTree(tmp)
      val exact = Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"))
      rolled.join(broadcast(exact), "event_type")
        .select(col("event_type"), col("n_events"),
          col("n_keys").as("n_days"), col("n_users"),
          (abs(col("du_est") - col("n_users")) <=
            lit(0.10) * col("n_users") + lit(32)).as("du_ok"))
        .orderBy(col("event_type"))
    },

    // D39 in the GATE (r13): TRANSPARENT sketch-MV rewrite end to
    // end — the read-side completion of D37/D38 and the StarRocks
    // promise those MVs mimic: a user's literal
    // `approx_count_distinct` / `percentile_approx` SQL over the
    // SOURCE is optimizer-rewritten (plans.MvRewrite sketch path) to
    // scan the PUBLISHED snapshot of a committed KmvMv/QskMv root,
    // never the raw history. The gate maintains both MVs over a flat
    // copy of events, publishes them (registerSketchSnapshot), runs
    // the two user queries through spark.sql, and require()-asserts
    // ON THE PLAN that each scans its sketch snapshot and NOT the
    // source. Output is the est-flag construction: exact recounts the
    // oracle replays + bound flags it expects TRUE (count(*) rolls up
    // EXACTLY via sum of the MV's n column — hash-equal to the
    // oracle's count, so a silently-broken rewrite that still
    // estimated well could not hide).
    "mv_sketch_rewrite" -> { (s, dir) =>
      import graft.streaming.{KmvMv, QskMv}
      import graft.plans.MvRewrite
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      val tmp = TmpSweep.gateTempDir("mvrw_gate")
      val src = tmp.toString + "/events_flat"
      val out = try {
        Tables.events(s, dir).select(col("event_type"),
            to_date(col("ts")).as("day"), col("user_id"), col("value"))
          .write.mode("overwrite").parquet(src)
        val flat = s.read.parquet(src)
        val kroot = tmp.toString + "/kmv/mv"
        val qroot = tmp.toString + "/qsk/mv"
        require(KmvMv.maintainTx(kroot, flat, 0L, Seq("event_type", "day"),
          col("user_id"), writer = "gate"), "kmv maintain must apply")
        require(QskMv.maintainTx(qroot, flat, 0L, Seq("event_type", "day"),
          col("value"), writer = "gate"), "qsk maintain must apply")
        val kpub = tmp.toString + "/kmv_pub"
        val qpub = tmp.toString + "/qsk_pub"
        val kschema = {
          import s.implicits._
          Seq.empty[(String, java.sql.Date, Array[Long], Long, Long)]
            .toDF("event_type", "day", "sk", "n", "batch_id")
        }
        val qschema = {
          import s.implicits._
          Seq.empty[(String, java.sql.Date, graft.functions.Qsk.Sk, Long, Long)]
            .toDF("event_type", "day", "sk", "n", "batch_id")
        }
        MvRewrite.registerSketchSnapshot(s, src,
          KmvMv.readMv(s, kroot, kschema)
            .select(col("event_type"), col("day"), col("sk"), col("n")),
          kpub, Seq("event_type", "day"),
          Map("sk" -> MvRewrite.KmvSketchOf("user_id"),
            "n" -> MvRewrite.CountStar), mvRoot = Some(kroot))
        MvRewrite.registerSketchSnapshot(s, src,
          QskMv.readMv(s, qroot, qschema)
            .select(col("event_type"), col("day"), col("sk"), col("n")),
          qpub, Seq("event_type", "day"),
          Map("sk" -> MvRewrite.QskSketchOf("value"),
            "n" -> MvRewrite.CountStar), mvRoot = Some(qroot))
        flat.createOrReplaceTempView("events_mvr")
        val qd = s.sql("""SELECT event_type, count(*) AS n_events,
          approx_count_distinct(user_id) AS du_est
          FROM events_mvr GROUP BY event_type""")
        val qp = s.sql("""SELECT event_type,
          percentile_approx(value, 0.5D) AS p50_est
          FROM events_mvr GROUP BY event_type""")
        // the whole point: the plans must read the sketch snapshots,
        // never the source — asserted on the ACTUAL scan relations
        def scanRoots(df: DataFrame): Seq[String] =
          df.queryExecution.optimizedPlan.collect {
            case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
              fs.location.rootPaths.map(_.toUri.getPath)
          }.flatten
        def assertScans(df: DataFrame, wantUnder: String, q: String): Unit = {
          val roots = scanRoots(df)
          val want = new org.apache.hadoop.fs.Path(wantUnder).toUri.getPath
          val bad = new org.apache.hadoop.fs.Path(src).toUri.getPath
          require(roots.exists(_.startsWith(want)),
            s"$q must scan the sketch snapshot $want; scans: $roots")
          require(!roots.exists(_.startsWith(bad)),
            s"$q must NOT rescan the source; scans: $roots")
        }
        assertScans(qd, kpub, "approx_count_distinct")
        assertScans(qp, qpub, "percentile_approx")
        qd.join(qp, "event_type").localCheckpoint(true)
      } finally {
        MvRewrite.deregister(src)
        deleteTree(tmp)
      }
      val exact = Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      Tables.events(s, dir)
        .join(broadcast(out.join(broadcast(exact), "event_type")),
          "event_type")
        .groupBy(col("event_type"), col("n_events"), col("n_exact"),
          col("du_est"), col("p50_est"))
        .agg(sum((col("value") <= col("p50_est")).cast("long")).as("r50"))
        .select(col("event_type"), col("n_events"), col("n_exact"),
          (abs(col("du_est") - col("n_exact")) <=
            lit(0.10) * col("n_exact") + lit(32)).as("du_ok"),
          (abs(col("r50") - lit(0.5) * col("n_events")) <=
            lit(0.05) * col("n_events") + lit(1.0)).as("p50_ok"))
        .orderBy(col("event_type"))
    },

    // D40 in the GATE (r13): transparent BITMAP-MV rewrite — the
    // EXACT member of the sketch-rewrite family (StarRocks BITMAP
    // aggregate column: to_bitmap on load, bitmap_union_count on
    // read): a committed RbmMv holds per-(type, day) exact id
    // bitmaps; a user's literal `count(DISTINCT user_id)` SQL is
    // optimizer-rewritten to bitmap-union the published snapshot.
    // Exactness upgrades the gate from bound FLAGS to VALUE-IDENTITY:
    // the output counts are compared hash-for-hash with the oracle's
    // raw count(DISTINCT) — zero tolerance anywhere. A replayed batch
    // id is proven watermark-skipped in-query, and the plan assertion
    // (snapshot scanned, source not) matches mv_sketch_rewrite's.
    "mv_bitmap_rewrite" -> { (s, dir) =>
      import graft.streaming.RbmMv
      import graft.plans.MvRewrite
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      val tmp = TmpSweep.gateTempDir("bmrw_gate")
      val src = tmp.toString + "/events_flat"
      try {
        Tables.events(s, dir).select(col("event_type"),
            to_date(col("ts")).as("day"), col("user_id"))
          .write.mode("overwrite").parquet(src)
        val flat = s.read.parquet(src)
        val root = tmp.toString + "/rbm/mv"
        (0 until 2).foreach { i =>
          def run() = RbmMv.maintainTx(root,
            flat.where(pmod(col("user_id"), lit(2)) === i), i,
            Seq("event_type", "day"), col("user_id"), writer = "gate")
          require(run(), s"mv_bitmap_rewrite: batch $i must apply")
          if (i == 1) require(!run(),
            "mv_bitmap_rewrite: replayed batch must be watermark-skipped")
        }
        val schemaOf = {
          import s.implicits._
          Seq.empty[(String, java.sql.Date, Map[Long, Array[Long]], Long, Long)]
            .toDF("event_type", "day", "sk", "n", "batch_id")
        }
        val pub = tmp.toString + "/rbm_pub"
        MvRewrite.registerSketchSnapshot(s, src,
          RbmMv.readMv(s, root, schemaOf)
            .select(col("event_type"), col("day"), col("sk"), col("n")),
          pub, Seq("event_type", "day"),
          Map("sk" -> MvRewrite.RbmSketchOf("user_id"),
            "n" -> MvRewrite.CountStar), mvRoot = Some(root))
        flat.createOrReplaceTempView("events_bmr")
        val q = s.sql("""SELECT event_type, count(*) AS n_events,
          count(DISTINCT user_id) AS n_users
          FROM events_bmr GROUP BY event_type ORDER BY event_type""")
        val roots = q.queryExecution.optimizedPlan.collect {
          case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
            fs.location.rootPaths.map(_.toUri.getPath)
        }.flatten
        val want = new org.apache.hadoop.fs.Path(pub).toUri.getPath
        val bad = new org.apache.hadoop.fs.Path(src).toUri.getPath
        require(roots.exists(_.startsWith(want)),
          s"count(DISTINCT) must scan the bitmap snapshot; scans: $roots")
        require(!roots.exists(_.startsWith(bad)),
          s"count(DISTINCT) must NOT rescan the source; scans: $roots")
        q.localCheckpoint(true)
      } finally {
        MvRewrite.deregister(src)
        deleteTree(tmp)
      }
    },

    // D41 in the GATE (r14): TRANSPARENT JOIN+AGG MV rewrite — the
    // read side of A31/A32's multi-table sync MV and the last leg of
    // the transparent-acceleration story (exact aggs → sketch MVs →
    // joins): a user's literal `SELECT g…, count(*), sum(x) FROM
    // orders JOIN customer ON keys GROUP BY g…` is optimizer-rewritten
    // (plans.MvRewrite.registerJoin path) to scan a registered join-MV
    // snapshot and NEITHER source. The MV itself is maintained
    // INCREMENTALLY here through four interleaved CDC rounds on both
    // tables — the A32 bilinear-delta kernel, deletes included — so
    // the gate proves write side and read side against one oracle:
    // DuckDB's live join over the final states, value-identical
    // (counts + integer-cents sums, zero tolerance). Both the exact
    // group-set match (a Project over the MV) and the coarser rollup
    // (re-aggregating MV rows) are plan-asserted and emitted.
    "mv_join_rewrite" -> { (s, dir) =>
      import graft.plans.MvRewrite
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      val tmp = TmpSweep.gateTempDir("mvjr_gate")
      val oPath = tmp.toString + "/orders_flat"
      val cPath = tmp.toString + "/customer_flat"
      try {
        // CDC inputs: versioned rows with the A31/A32 delete pattern
        val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
          lit(1L).as("ov"), (col("o_orderkey") % 13 === 3).as("odel"))
        val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_name"),
          col("c_mktsegment"), lit(1L).as("cv"),
          (col("c_custkey") % 17 === 5).as("cdel"))
        // the flat lake tables the USER queries = final live states
        // independent writes to distinct dirs — overlapped (guide §2.6)
        Par.run(
          () => o.where(!col("odel")).select(col("o_orderkey"), col("o_custkey"),
            col("cents")).write.mode("overwrite").parquet(oPath),
          () => c.where(!col("cdel")).select(col("c_custkey"), col("c_name"),
            col("c_mktsegment")).write.mode("overwrite").parquet(cPath))
        // write side: the A32 kernel — 4 interleaved rounds of signed
        // join deltas folded to per-group (n, Σcents) adjustments
        var sl = MaterializedJoin.emptyState(o, col("odel"))
        var sr = MaterializedJoin.emptyState(c, col("cdel"))
        var states: Seq[DataFrame] = Nil
        var gds: Seq[DataFrame] = Nil
        (0 until 4).foreach { i =>
          val st = MaterializedJoin.step(
            sl, o.where(pmod(col("o_orderkey"), lit(4)) === i),
            Seq("o_orderkey"), Seq(col("ov")), col("odel"),
            sr, c.where(pmod(col("c_custkey"), lit(4)) === i),
            Seq("c_custkey"), Seq(col("cv")), col("cdel"),
            joinL = Seq("o_custkey"), joinR = Seq("c_custkey"),
            outCols = Seq("o_orderkey", "cents", "c_mktsegment", "c_name"))
          val Seq(nsl, nsr) =
            Par.map(Seq(st.stateL, st.stateR))(_.localCheckpoint(true))
          sl = nsl; sr = nsr
          states = states ++ Seq(sl, sr)
          gds = gds :+ MaterializedAgg.groupDelta(st.delta,
            Seq("c_mktsegment", "c_name"), Seq("cents" -> col("cents")))
        }
        val mvPath = tmp.toString + "/mv"
        MaterializedAgg.mergeMv(None, gds.reduce(_ unionByName _),
            Seq("c_mktsegment", "c_name"), Seq("cents"))
          .write.mode("overwrite").parquet(mvPath)
        states.foreach(freeCkpt) // all consumed by the MV write
        // read side: register + run the user's LITERAL join SQL
        MvRewrite.registerJoin(s, oPath, cPath,
          Seq("o_custkey" -> "c_custkey"), mvPath,
          groupCols = Seq("c_mktsegment", "c_name"),
          aggs = Map("n" -> MvRewrite.CountStar,
            "cents" -> MvRewrite.SumOf("cents")))
        s.read.parquet(oPath).createOrReplaceTempView("o_jmv")
        s.read.parquet(cPath).createOrReplaceTempView("c_jmv")
        val q1 = s.sql("""SELECT c_mktsegment, c_name,
          count(*) AS n_orders, sum(cents) AS sum_cents
          FROM o_jmv JOIN c_jmv ON o_custkey = c_custkey
          GROUP BY c_mktsegment, c_name""")
        val q2 = s.sql("""SELECT c_mktsegment,
          count(*) AS seg_orders, sum(cents) AS seg_cents
          FROM o_jmv JOIN c_jmv ON o_custkey = c_custkey
          GROUP BY c_mktsegment""")
        // the whole point: both plans read ONLY the MV snapshot
        def scanRoots(df: DataFrame): Seq[String] =
          df.queryExecution.optimizedPlan.collect {
            case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
              fs.location.rootPaths.map(_.toUri.getPath)
          }.flatten
        def assertScans(df: DataFrame, q: String): Unit = {
          val roots = scanRoots(df)
          val want = new org.apache.hadoop.fs.Path(mvPath).toUri.getPath
          require(roots.exists(_.startsWith(want)),
            s"$q must scan the join MV $want; scans: $roots")
          Seq(oPath, cPath).foreach { p =>
            val bad = new org.apache.hadoop.fs.Path(p).toUri.getPath
            require(!roots.exists(_.startsWith(bad)),
              s"$q must NOT rescan source $bad; scans: $roots")
          }
        }
        assertScans(q1, "exact join query")
        assertScans(q2, "rollup join query")
        q1.join(q2, "c_mktsegment")
          .orderBy(col("c_mktsegment"), col("c_name"))
          .localCheckpoint(true)
      } finally {
        MvRewrite.deregisterJoin(oPath, cPath)
        deleteTree(tmp)
      }
    },

    // D47: MIN/MAX MV served TRANSPARENTLY — A39's incremental
    // maintenance composed with the D41-class rewrite. The MV stores
    // (n, Σcents, min cents, max cents) per (status, priority),
    // maintained through 4 interleaved CDC rounds whose deletes land
    // on group extrema (the rescan leg), then the user's LITERAL
    // count/sum/min/max SQL over the flat lake table is plan-asserted
    // to read ONLY the MV — at the exact grain (a Project) AND the
    // rollup grain, where min/max re-aggregate as min-of-mins /
    // max-of-maxes (sum/count re-sum; the rewrite's rollup rule).
    "mv_minmax_rewrite" -> { (s, dir) =>
      import graft.plans.MvRewrite
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      val tmp = TmpSweep.gateTempDir("mvmm_gate")
      val flatPath = tmp.toString + "/orders_flat"
      val mvPath = tmp.toString + "/mv"
      try {
        val o = Tables.orders(s, dir).select(col("o_orderkey"),
          col("o_orderstatus"), col("o_orderpriority"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
          (col("o_orderkey") % 13 === 3).as("odel"))
        // the flat lake table the USER queries = the final live state
        o.where(!col("odel")).drop("odel")
          .write.mode("overwrite").parquet(flatPath)
        // write side: A39's kernel, deletes hitting extrema included
        val batches = (0 until 4).map(i =>
          o.where(pmod(col("o_orderkey"), lit(4)) === i))
        MaterializedAgg.maintainMinMax(batches,
            keyCols = Seq("o_orderkey"), version = Seq(lit(1L)),
            deleteFlag = col("odel"),
            groupCols = Seq("o_orderstatus", "o_orderpriority"),
            sums = Seq("sum_cents" -> col("cents")),
            exts = Seq(
              MaterializedAgg.Extremum("min_cents", col("cents"), isMin = true),
              MaterializedAgg.Extremum("max_cents", col("cents"), isMin = false)))
          .write.mode("overwrite").parquet(mvPath)
        // read side: register + the user's literal SQL at both grains
        MvRewrite.register(s, flatPath, mvPath,
          groupCols = Seq("o_orderstatus", "o_orderpriority"),
          aggs = Map("n" -> MvRewrite.CountStar,
            "sum_cents" -> MvRewrite.SumOf("cents"),
            "min_cents" -> MvRewrite.MinOf("cents"),
            "max_cents" -> MvRewrite.MaxOf("cents")))
        s.read.parquet(flatPath).createOrReplaceTempView("o_mmv")
        val q1 = s.sql("""SELECT o_orderstatus, o_orderpriority,
          count(*) AS n, sum(cents) AS sum_cents,
          min(cents) AS min_cents, max(cents) AS max_cents
          FROM o_mmv GROUP BY o_orderstatus, o_orderpriority""")
        val q2 = s.sql("""SELECT o_orderstatus,
          count(*) AS n2, sum(cents) AS s2,
          min(cents) AS mn2, max(cents) AS mx2
          FROM o_mmv GROUP BY o_orderstatus""")
        def scanRoots(df: DataFrame): Seq[String] =
          df.queryExecution.optimizedPlan.collect {
            case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
              fs.location.rootPaths.map(_.toUri.getPath)
          }.flatten
        Seq(q1 -> "exact-grain min/max query", q2 -> "rollup min/max query")
          .foreach { case (df, q) =>
            val roots = scanRoots(df)
            val want = new org.apache.hadoop.fs.Path(mvPath).toUri.getPath
            require(roots.exists(_.startsWith(want)),
              s"$q must scan the min/max MV $want; scans: $roots")
            val bad = new org.apache.hadoop.fs.Path(flatPath).toUri.getPath
            require(!roots.exists(_.startsWith(bad)),
              s"$q must NOT rescan source $bad; scans: $roots")
          }
        q1.join(q2, "o_orderstatus")
          .orderBy(col("o_orderstatus"), col("o_orderpriority"))
          .localCheckpoint(true)
      } finally {
        MvRewrite.deregister(flatPath, mvPath)
        deleteTree(tmp)
      }
    },

    // D48: materialized TOPN served TRANSPARENTLY — A40's top-k MV
    // composed with a WINDOW-shape rewrite (beyond the Aggregate
    // matcher): the user's literal `row_number() OVER (PARTITION BY g
    // ORDER BY v DESC, key) ≤ c` SQL is re-anchored on the MV snapshot
    // whenever c ≤ k — the MV stores exactly the source's top-k per
    // group in that order, so every rank ≤ k gets the same row and the
    // window runs over k·|groups| rows instead of the corpus. Both a
    // full-k and a tighter-bound query are plan-asserted to read ONLY
    // the MV, values hash-exact vs the oracle's live ranking.
    "mv_topk_rewrite" -> { (s, dir) =>
      import graft.plans.MvRewrite
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      val tmp = TmpSweep.gateTempDir("mvtk_gate")
      val flatPath = tmp.toString + "/events_flat"
      val mvPath = tmp.toString + "/mv"
      try {
        val chg = changelog(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"), col("value"), col("op"))
        // the flat lake table the USER queries = the live latest state
        PkTable.compact(chg, Seq("user_id"),
            Seq(col("ts"), col("event_id")), col("op") === Envelope.OpDelete)
          .select(col("user_id"), col("event_type"), col("value"))
          .write.mode("overwrite").parquet(flatPath)
        // write side: A40's kernel through 4 interleaved rounds
        val batches = (0 until 4).map(i =>
          chg.where(pmod(col("event_id"), lit(4)) === i))
        MaterializedTopK.maintain(batches,
            keyCols = Seq("user_id"), version = Seq(col("ts"), col("event_id")),
            deleteFlag = col("op") === Envelope.OpDelete,
            groupCols = Seq("event_type"), value = col("value"), k = 3)
          .select(col("event_type"), col("user_id"), col("value"))
          .write.mode("overwrite").parquet(mvPath)
        // read side: register + the user's literal TOPN SQL
        MvRewrite.registerTopK(s, flatPath, mvPath,
          groupCols = Seq("event_type"), keyCols = Seq("user_id"),
          valueCol = "value", k = 3)
        s.read.parquet(flatPath).createOrReplaceTempView("ev_tkv")
        def topn(c: Int) = s.sql(s"""SELECT event_type, CAST(rnk AS BIGINT) AS rnk,
          user_id, value FROM (
            SELECT event_type, user_id, value,
              row_number() OVER (PARTITION BY event_type
                ORDER BY value DESC, user_id) AS rnk
            FROM ev_tkv) WHERE rnk <= $c""")
        val q1 = topn(3)
        val q2 = topn(2) // a TIGHTER bound than the registered k
        // rank() over the SAME full registered order (value DESC,
        // user_id ASC — a total order over the group's unique keys,
        // so rank ≡ row_number): the r15 verdict's tie-safe TOPN ask.
        // rank() over value ONLY would be tie-unsafe (> k rows on
        // boundary ties) and is NOT rewritten — MvRewriteSpec pins it.
        val q3 = s.sql("""SELECT event_type, CAST(rnk AS BIGINT) AS rnk,
          user_id, value FROM (
            SELECT event_type, user_id, value,
              rank() OVER (PARTITION BY event_type
                ORDER BY value DESC, user_id) AS rnk
            FROM ev_tkv) WHERE rnk <= 3""")
        def scanRoots(df: DataFrame): Seq[String] =
          df.queryExecution.optimizedPlan.collect {
            case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
              fs.location.rootPaths.map(_.toUri.getPath)
          }.flatten
        Seq(q1 -> "full-k TOPN query", q2 -> "tighter-bound TOPN query",
            q3 -> "rank()-form TOPN query")
          .foreach { case (df, q) =>
            val roots = scanRoots(df)
            val want = new org.apache.hadoop.fs.Path(mvPath).toUri.getPath
            require(roots.exists(_.startsWith(want)),
              s"$q must scan the top-k MV $want; scans: $roots")
            val bad = new org.apache.hadoop.fs.Path(flatPath).toUri.getPath
            require(!roots.exists(_.startsWith(bad)),
              s"$q must NOT rescan source $bad; scans: $roots")
          }
        q1.withColumn("cut", lit(3L))
          .unionByName(q2.withColumn("cut", lit(2L)))
          .unionByName(q3.withColumn("cut", lit(13L))) // 13 = rank form
          .select(col("cut"), col("event_type"), col("rnk"), col("user_id"),
            Rounding.r(col("value"), 4).as("value"))
          .orderBy(col("cut"), col("event_type"), col("rnk"))
          .localCheckpoint(true)
      } finally {
        MvRewrite.deregisterTopK(flatPath)
        deleteTree(tmp)
      }
    },

    // r14: the async MV refresh loop as a GATE — mv_bitmap_rewrite's
    // construction extended across a REFRESH: commit batch A, publish,
    // serve (plan-asserted + recorded); commit batch B, require
    // publishStale()=true, re-publish (the refresh worker's move —
    // landing in a fresh versioned snapshot dir), require staleness
    // cleared, and require the SAME literal SQL now serves the updated
    // counts from the NEW snapshot. Rbm exactness makes every output
    // value hash-comparable to the oracle's recounts over the A and
    // A∪B slices — zero tolerance; a refresh loop that silently kept
    // serving the old snapshot could not pass.
    "mv_refresh_loop" -> { (s, dir) =>
      import graft.streaming.RbmMv
      import graft.plans.MvRewrite
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      val tmp = TmpSweep.gateTempDir("mvloop_gate")
      val src = tmp.toString + "/events_flat"
      try {
        val ev = Tables.events(s, dir).select(col("event_type"),
          to_date(col("ts")).as("day"), col("user_id"))
        val bA = ev.where(pmod(col("user_id"), lit(2)) === 0)
        val bB = ev.where(pmod(col("user_id"), lit(2)) === 1)
        val root = tmp.toString + "/rbm/mv"
        val pub = tmp.toString + "/pub"
        val schemaOf = {
          import s.implicits._
          Seq.empty[(String, java.sql.Date, Map[Long, Array[Long]], Long, Long)]
            .toDF("event_type", "day", "sk", "n", "batch_id")
        }
        def publish(): Unit = MvRewrite.registerSketchSnapshot(s, src,
          RbmMv.readMv(s, root, schemaOf)
            .select(col("event_type"), col("day"), col("sk"), col("n")),
          pub, Seq("event_type", "day"),
          Map("sk" -> MvRewrite.RbmSketchOf("user_id"),
            "n" -> MvRewrite.CountStar), mvRoot = Some(root))
        def userQ(): DataFrame = {
          s.read.parquet(src).createOrReplaceTempView("events_loop")
          s.sql("""SELECT event_type, count(*) AS n_events,
            count(DISTINCT user_id) AS n_users
            FROM events_loop GROUP BY event_type""")
        }
        def assertScans(df: DataFrame, when: String): Unit = {
          val roots = df.queryExecution.optimizedPlan.collect {
            case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
              fs.location.rootPaths.map(_.toUri.getPath)
          }.flatten
          val want = new org.apache.hadoop.fs.Path(pub).toUri.getPath
          val bad = new org.apache.hadoop.fs.Path(src).toUri.getPath
          require(roots.exists(_.startsWith(want)),
            s"$when: must scan the published snapshot; scans: $roots")
          require(!roots.exists(_.startsWith(bad)),
            s"$when: must NOT rescan the source; scans: $roots")
        }
        // the SHIPPED refresh worker (streaming.MvRefresher, r16 —
        // the r15 verdict's #5 ask): the gate registers the MV once
        // and the worker's poll decides whether to re-publish
        val regs = Seq(graft.streaming.MvRefresher.Refreshable(
          "loop", pub, publish = () => publish()))
        // ---- serve generation 1 (batch A only)
        bA.write.mode("overwrite").parquet(src)
        require(RbmMv.maintainTx(root, bA, 0L, Seq("event_type", "day"),
          col("user_id"), writer = "gate"), "batch A must apply")
        publish()
        require(graft.streaming.MvRefresher.runOnce(s, regs).isEmpty,
          "fresh publish must not read stale (worker no-op)")
        val q1 = userQ()
        assertScans(q1, "before refresh")
        val r1 = q1.select(col("event_type"), col("n_events").as("n1"),
          col("n_users").as("d1")).localCheckpoint(true)
        // ---- batch B lands; the started WORKER DAEMON (r17, the r16
        // verdict's #5 ask: the thing a production deployment actually
        // runs, not a test-driven runOnce) polls, finds the publish
        // stale, and re-publishes — the gate only AWAITS it
        bB.write.mode("append").parquet(src)
        require(RbmMv.maintainTx(root, bB, 1L, Seq("event_type", "day"),
          col("user_id"), writer = "gate"), "batch B must apply")
        require(MvRewrite.publishStale(s, pub),
          "a commit after publish must read stale")
        val daemon = new graft.streaming.MvRefresher.Worker(s, regs,
          pollIntervalMs = 100L).start()
        try
          require(daemon.awaitRefreshed(1L, 120000L),
            s"the worker daemon must refresh the stale publish " +
              s"(refreshed=${daemon.refreshedCount}, errors=${daemon.errors})")
        finally daemon.stop()
        require(daemon.refreshedCount >= 1L, "daemon refresh count")
        require(!MvRewrite.publishStale(s, pub),
          "staleness cleared by the daemon, not the test")
        // simulated restart: the refreshed registration must survive a
        // registry wipe via the on-disk manifest (r14 verdict #3 —
        // StarRocks MVs are catalog objects, not session state)
        MvRewrite.clear()
        require(MvRewrite.registerAll(s, pub).nonEmpty,
          "registerAll must recover the published sketch MV")
        val q2 = userQ()
        assertScans(q2, "after refresh + restart recovery")
        val r2 = q2.select(col("event_type"), col("n_events").as("n2"),
          col("n_users").as("d2")).localCheckpoint(true)
        r1.join(r2, "event_type").orderBy(col("event_type"))
          .localCheckpoint(true)
      } finally {
        MvRewrite.deregister(src)
        deleteTree(tmp)
      }
    },

    // D43 in the GATE (r14): N-WAY (star) transparent join rewrite —
    // D41 generalized past two tables, the fact ⋈ dim ⋈ dim shape
    // real StarRocks MVs take: the matcher FLATTENS an arbitrary tree
    // of inner equi-joins, identifies the join by (path set,
    // unordered-key-pair set) — inner joins commute and associate, so
    // the user's literal SQL may order/parenthesize the three tables
    // ANY way (this gate deliberately writes customer JOIN orders
    // JOIN lineitem where the MV was registered lineitem-first) — and
    // serves the exact grain as a Project and a coarser grain (+ a
    // group-column filter) as a re-aggregation of MV rows, both
    // plan-asserted to read ONLY the MV snapshot. The MV here is a
    // REFRESH-shape snapshot (built from the live 3-way join at
    // register time — the StarRocks async-MV build; the INCREMENTAL
    // write side is D41's proof); values are counts + integer-cents
    // sums, hash-identical to the oracle's replayed star join.
    "mv_star_rewrite" -> { (s, dir) =>
      import graft.plans.MvRewrite
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      val tmp = TmpSweep.gateTempDir("mvsr_gate")
      val liPath = tmp.toString + "/li_flat"
      val oPath = tmp.toString + "/o_flat"
      val cPath = tmp.toString + "/c_flat"
      try {
        // independent writes to distinct dirs — overlapped (guide §2.6)
        Par.run(
          () => Tables.lineitem(s, dir).select(col("l_orderkey"),
              floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
            .write.mode("overwrite").parquet(liPath),
          () => Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"),
              col("o_orderstatus"))
            .write.mode("overwrite").parquet(oPath),
          () => Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment"))
            .write.mode("overwrite").parquet(cPath))
        val li = s.read.parquet(liPath)
        val o = s.read.parquet(oPath)
        val c = s.read.parquet(cPath)
        val mvPath = tmp.toString + "/mv"
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
          .write.mode("overwrite").parquet(mvPath)
        MvRewrite.registerJoin(s, Seq(liPath, oPath, cPath),
          Seq("l_orderkey" -> "o_orderkey", "o_custkey" -> "c_custkey"),
          mvPath, groupCols = Seq("c_mktsegment", "o_orderstatus"),
          aggs = Map("n" -> MvRewrite.CountStar,
            "cents" -> MvRewrite.SumOf("cents")))
        li.createOrReplaceTempView("li_smv")
        o.createOrReplaceTempView("o_smv")
        c.createOrReplaceTempView("c_smv")
        // the OPPOSITE join order from registration, on purpose
        val q1 = s.sql("""SELECT c_mktsegment, o_orderstatus,
          count(*) AS n_items, sum(cents) AS sum_cents
          FROM c_smv JOIN o_smv ON o_custkey = c_custkey
                     JOIN li_smv ON l_orderkey = o_orderkey
          GROUP BY c_mktsegment, o_orderstatus""")
        val q2 = s.sql("""SELECT o_orderstatus,
          count(*) AS b_items, sum(cents) AS b_cents
          FROM li_smv JOIN o_smv ON l_orderkey = o_orderkey
                      JOIN c_smv ON o_custkey = c_custkey
          WHERE c_mktsegment = 'BUILDING'
          GROUP BY o_orderstatus""")
        def scanRoots(df: DataFrame): Seq[String] =
          df.queryExecution.optimizedPlan.collect {
            case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
              fs.location.rootPaths.map(_.toUri.getPath)
          }.flatten
        def assertScans(df: DataFrame, q: String): Unit = {
          val roots = scanRoots(df)
          val want = new org.apache.hadoop.fs.Path(mvPath).toUri.getPath
          require(roots.exists(_.startsWith(want)),
            s"$q must scan the star MV $want; scans: $roots")
          Seq(liPath, oPath, cPath).foreach { p =>
            val bad = new org.apache.hadoop.fs.Path(p).toUri.getPath
            require(!roots.exists(_.startsWith(bad)),
              s"$q must NOT rescan source $bad; scans: $roots")
          }
        }
        assertScans(q1, "exact star query")
        assertScans(q2, "filtered rollup star query")
        q1.join(q2, "o_orderstatus")
          .orderBy(col("c_mktsegment"), col("o_orderstatus"))
          .localCheckpoint(true)
      } finally {
        MvRewrite.deregisterJoin(liPath, oPath, cPath)
        deleteTree(tmp)
      }
    },

    // D44 (r15): the END-TO-END multi-table async-MV lifecycle — the
    // r14 verdict's #1 ask, composing D41's join-MV read side, D42's
    // versioned refresh loop, and the NEW one-manifest transactional
    // write side (MaterializedJoin.maintainAggTx). One CDC round
    // commits through the N-way join+agg kernel (the round advances
    // BOTH tables atomically, deletes included); the view is
    // PUBLISHED as a versioned join snapshot (registerJoinSnapshot:
    // pub/v1, freshness stamp, durable registration manifest) and the
    // user's literal join SQL is plan-asserted to serve v1. A SECOND
    // round lands → publishStale flips → the refresh worker
    // re-publishes (fresh pub/v2; v1 retained for in-flight readers —
    // require()d) → the registry is CLEARED (simulated restart) and
    // recovered from the on-disk manifest (registerAll) → the SAME
    // SQL serves the updated aggregates from v2. Counts +
    // integer-cents sums at both generations — hash-identical to the
    // oracle's live joins over each generation's states, zero
    // tolerance; a loop that silently kept serving v1, lost the
    // registration across the restart, or mis-maintained the view
    // under deletes cannot pass. Gate scope (r16, the r15 verdict's
    // budget finding): ONE round per generation — D46's documented
    // shape; the multi-round interleaving depth is A37's job, and
    // MvRewriteSpec pins the serve plans at the spec layer.
    "mv_join_refresh" -> { (s, dir) =>
      import graft.plans.MvRewrite
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      val tmp = TmpSweep.gateTempDir("mvjf_gate")
      val oPath = tmp.toString + "/orders_flat"
      val cPath = tmp.toString + "/customer_flat"
      try {
        val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
          lit(1L).as("ov"), (col("o_orderkey") % 13 === 3).as("odel"))
        val c = Tables.customer(s, dir).select(col("c_custkey"),
          col("c_mktsegment"), lit(1L).as("cv"),
          (col("c_custkey") % 17 === 5).as("cdel"))
        val root = tmp.toString + "/jmv/g"
        val pub = tmp.toString + "/pub"
        def round(i: Int): Unit =
          require(MaterializedJoin.maintainAggTx(root, Seq(
            MaterializedJoin.BatchIn("o",
              o.where(pmod(col("o_orderkey"), lit(2)) === i),
              Seq("o_orderkey"), Seq("ov"), col("odel")),
            MaterializedJoin.BatchIn("c",
              c.where(pmod(col("c_custkey"), lit(2)) === i),
              Seq("c_custkey"), Seq("cv"), col("cdel"))),
            Seq("o_custkey" -> "c_custkey"),
            outCols = Seq("cents", "c_mktsegment"),
            groupCols = Seq("c_mktsegment"), sums = Seq("cents" -> col("cents")),
            batchId = i, writer = "gate"), s"round $i must apply")
        def publish(): Unit = {
          val schemaOf = {
            import s.implicits._
            Seq.empty[(String, Long, Long, Long)]
              .toDF("c_mktsegment", "n", "cents", "batch_id")
          }
          MvRewrite.registerJoinSnapshot(s, Seq(oPath, cPath),
            Seq("o_custkey" -> "c_custkey"),
            graft.sinks.PkTableSink.readTxGroup(s, root, "mv", schemaOf)
              .select(col("c_mktsegment"), col("n"), col("cents")),
            pub, groupCols = Seq("c_mktsegment"),
            aggs = Map("n" -> MvRewrite.CountStar,
              "cents" -> MvRewrite.SumOf("cents")),
            mvRoot = Some(root))
        }
        // the flat lake tables the USER queries = the live states of
        // rounds ≤ maxRound (what the CDC stream has delivered so far)
        def writeUserTables(maxRound: Int): Unit = Par.run(
          () => o.where(pmod(col("o_orderkey"), lit(2)) <= maxRound && !col("odel"))
            .select(col("o_orderkey"), col("o_custkey"), col("cents"))
            .write.mode("overwrite").parquet(oPath),
          () => c.where(pmod(col("c_custkey"), lit(2)) <= maxRound && !col("cdel"))
            .select(col("c_custkey"), col("c_mktsegment"))
            .write.mode("overwrite").parquet(cPath))
        def userQ(): DataFrame = {
          s.read.parquet(oPath).createOrReplaceTempView("o_jrf")
          s.read.parquet(cPath).createOrReplaceTempView("c_jrf")
          s.sql("""SELECT c_mktsegment, count(*) AS n_orders,
            sum(cents) AS sum_cents
            FROM o_jrf JOIN c_jrf ON o_custkey = c_custkey
            GROUP BY c_mktsegment""")
        }
        def assertScans(df: DataFrame, when: String): Unit = {
          val roots = df.queryExecution.optimizedPlan.collect {
            case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
              fs.location.rootPaths.map(_.toUri.getPath)
          }.flatten
          val want = new org.apache.hadoop.fs.Path(pub).toUri.getPath
          require(roots.exists(_.startsWith(want)),
            s"$when: must scan the published join snapshot; scans: $roots")
          Seq(oPath, cPath).foreach { p =>
            val bad = new org.apache.hadoop.fs.Path(p).toUri.getPath
            require(!roots.exists(_.startsWith(bad)),
              s"$when: must NOT rescan source $bad; scans: $roots")
          }
        }
        // the SHIPPED refresh worker (streaming.MvRefresher, r16)
        val worker = Seq(graft.streaming.MvRefresher.Refreshable(
          "jmv", pub, publish = () => publish()))
        // ---- generation 1: round 0 committed, published, served
        round(0)
        writeUserTables(0)
        publish()
        require(graft.streaming.MvRefresher.runOnce(s, worker).isEmpty,
          "fresh publish must not read stale (worker no-op)")
        val q1 = userQ()
        assertScans(q1, "before refresh")
        val r1 = q1.select(col("c_mktsegment"), col("n_orders").as("n1"),
          col("sum_cents").as("s1")).localCheckpoint(true)
        // ---- round 1 lands; the refresh worker polls + re-publishes
        round(1)
        writeUserTables(1)
        require(graft.streaming.MvRefresher.runOnce(s, worker) == Seq("jmv"),
          "a maintenance commit after publish must read stale; the worker refreshes it")
        val base = new org.apache.hadoop.fs.Path(pub)
        val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
        val gens = fs.listStatus(base).filter(_.isDirectory)
          .map(_.getPath.getName).toSet
        require(gens == Set("v1", "v2"),
          s"expected v2 serving with v1 retained for in-flight readers, got $gens")
        // ---- simulated restart: recover the registration from disk
        MvRewrite.clear()
        require(MvRewrite.registerAll(s, pub).nonEmpty,
          "registerAll must recover the published join MV")
        val q2 = userQ()
        assertScans(q2, "after refresh + restart recovery")
        val r2 = q2.select(col("c_mktsegment"), col("n_orders").as("n2"),
          col("sum_cents").as("s2")).localCheckpoint(true)
        r1.join(r2, "c_mktsegment").orderBy(col("c_mktsegment"))
          .localCheckpoint(true)
      } finally {
        MvRewrite.deregisterJoin(oPath, cPath)
        deleteTree(tmp)
      }
    },

    // D46 (r15): the STAR async-MV lifecycle — D44's end-to-end
    // refresh composition at N = 3 (the fact ⋈ dim ⋈ dim shape real
    // StarRocks multi-table MVs take): each CDC round advances ALL
    // THREE tables atomically through maintainAggTx's one-manifest
    // commit, the view publishes as a versioned join snapshot, the
    // user's literal customer-first star SQL serves v1 plan-asserted,
    // a second round flips publishStale, the re-publish lands in v2
    // (v1 retained), the registry restart-recovers from the manifest,
    // and the SAME SQL serves the updated star aggregates — both
    // generations hash-exact vs the oracle's live 3-way joins.
    // Gate scope: this is the LIFECYCLE gate (its cost is commit/
    // publish JOB COUNT, corpus-size-free), so it runs one round per
    // generation on a deterministic 1/5 lineitem slice — the
    // full-corpus 4-round N-way MAINTENANCE proof is A37, and the
    // full 2+2-round lifecycle at N=2 is D44.
    "mv_star_refresh" -> { (s, dir) =>
      import graft.plans.MvRewrite
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      val tmp = TmpSweep.gateTempDir("mvsf_gate")
      val liPath = tmp.toString + "/li_flat"
      val oPath = tmp.toString + "/o_flat"
      val cPath = tmp.toString + "/c_flat"
      try {
        // per-lkey cents rollup — A37's unique-PK construction
        // the rollup is referenced by every round's batch slice and
        // both user-table writes — checkpoint it once (freed in
        // finally), not recomputed 6×
        val li = Tables.lineitem(s, dir).select(
            (col("l_orderkey") * 8 + col("l_linenumber").cast("long")).as("lkey"),
            floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
          .groupBy(col("lkey")).agg(sum(col("cents")).as("cents"))
          .where(col("lkey") % 5 === 0) // the documented lifecycle slice
          .select(col("lkey"), expr("lkey div 8").as("l_orderkey"),
            col("cents"), lit(1L).as("lv"),
            (col("lkey") % 19 === 7).as("ldel"))
          .localCheckpoint(true)
        val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), lit(1L).as("ov"),
          (col("o_orderkey") % 13 === 3).as("odel"))
        val c = Tables.customer(s, dir).select(col("c_custkey"),
          col("c_mktsegment"), lit(1L).as("cv"),
          (col("c_custkey") % 17 === 5).as("cdel"))
        val starPairs = Seq("l_orderkey" -> "o_orderkey",
          "o_custkey" -> "c_custkey")
        val groupCols = Seq("c_mktsegment", "o_orderstatus")
        val root = tmp.toString + "/smv/g"
        val pub = tmp.toString + "/pub"
        def round(i: Int): Unit =
          require(MaterializedJoin.maintainAggTx(root, Seq(
            MaterializedJoin.BatchIn("li",
              li.where(pmod(col("lkey"), lit(2)) === i),
              Seq("lkey"), Seq("lv"), col("ldel")),
            MaterializedJoin.BatchIn("o",
              o.where(pmod(col("o_orderkey"), lit(2)) === i),
              Seq("o_orderkey"), Seq("ov"), col("odel")),
            MaterializedJoin.BatchIn("c",
              c.where(pmod(col("c_custkey"), lit(2)) === i),
              Seq("c_custkey"), Seq("cv"), col("cdel"))),
            starPairs, outCols = Seq("cents") ++ groupCols,
            groupCols = groupCols, sums = Seq("cents" -> col("cents")),
            batchId = i, writer = "gate"), s"round $i must apply")
        def publish(): Unit = {
          val schemaOf = {
            import s.implicits._
            Seq.empty[(String, String, Long, Long, Long)]
              .toDF("c_mktsegment", "o_orderstatus", "n", "cents", "batch_id")
          }
          MvRewrite.registerJoinSnapshot(s, Seq(liPath, oPath, cPath),
            starPairs,
            graft.sinks.PkTableSink.readTxGroup(s, root, "mv", schemaOf)
              .select(col("c_mktsegment"), col("o_orderstatus"),
                col("n"), col("cents")),
            pub, groupCols = groupCols,
            aggs = Map("n" -> MvRewrite.CountStar,
              "cents" -> MvRewrite.SumOf("cents")),
            mvRoot = Some(root))
        }
        def writeUserTables(maxRound: Int): Unit = Par.run(
          () => li.where(pmod(col("lkey"), lit(2)) <= maxRound && !col("ldel"))
            .select(col("l_orderkey"), col("cents"))
            .write.mode("overwrite").parquet(liPath),
          () => o.where(pmod(col("o_orderkey"), lit(2)) <= maxRound && !col("odel"))
            .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
            .write.mode("overwrite").parquet(oPath),
          () => c.where(pmod(col("c_custkey"), lit(2)) <= maxRound && !col("cdel"))
            .select(col("c_custkey"), col("c_mktsegment"))
            .write.mode("overwrite").parquet(cPath))
        def userQ(): DataFrame = {
          s.read.parquet(liPath).createOrReplaceTempView("li_smr")
          s.read.parquet(oPath).createOrReplaceTempView("o_smr")
          s.read.parquet(cPath).createOrReplaceTempView("c_smr")
          // customer-first — the opposite order from registration
          s.sql("""SELECT c_mktsegment, o_orderstatus,
            count(*) AS n_items, sum(cents) AS sum_cents
            FROM c_smr JOIN o_smr ON o_custkey = c_custkey
                       JOIN li_smr ON l_orderkey = o_orderkey
            GROUP BY c_mktsegment, o_orderstatus""")
        }
        def assertScans(df: DataFrame, when: String): Unit = {
          val roots = df.queryExecution.optimizedPlan.collect {
            case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
              fs.location.rootPaths.map(_.toUri.getPath)
          }.flatten
          val want = new org.apache.hadoop.fs.Path(pub).toUri.getPath
          require(roots.exists(_.startsWith(want)),
            s"$when: must scan the published star snapshot; scans: $roots")
          Seq(liPath, oPath, cPath).foreach { p =>
            val bad = new org.apache.hadoop.fs.Path(p).toUri.getPath
            require(!roots.exists(_.startsWith(bad)),
              s"$when: must NOT rescan source $bad; scans: $roots")
          }
        }
        // the SHIPPED refresh worker (streaming.MvRefresher, r16)
        val worker = Seq(graft.streaming.MvRefresher.Refreshable(
          "smv", pub, publish = () => publish()))
        round(0)
        writeUserTables(0)
        publish()
        require(graft.streaming.MvRefresher.runOnce(s, worker).isEmpty,
          "fresh publish must not read stale (worker no-op)")
        val q1 = userQ()
        assertScans(q1, "before refresh")
        val r1 = q1.select(col("c_mktsegment"), col("o_orderstatus"),
          col("n_items").as("n1"), col("sum_cents").as("s1"))
          .localCheckpoint(true)
        round(1)
        writeUserTables(1)
        require(graft.streaming.MvRefresher.runOnce(s, worker) == Seq("smv"),
          "a maintenance commit after publish must read stale; the worker refreshes it")
        val base = new org.apache.hadoop.fs.Path(pub)
        val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
        val gens = fs.listStatus(base).filter(_.isDirectory)
          .map(_.getPath.getName).toSet
        require(gens == Set("v1", "v2"),
          s"expected v2 serving with v1 retained, got $gens")
        MvRewrite.clear()
        require(MvRewrite.registerAll(s, pub).nonEmpty,
          "registerAll must recover the published star MV")
        val q2 = userQ()
        assertScans(q2, "after refresh + restart recovery")
        val r2 = q2.select(col("c_mktsegment"), col("o_orderstatus"),
          col("n_items").as("n2"), col("sum_cents").as("s2"))
          .localCheckpoint(true)
        val out = r1.join(r2, Seq("c_mktsegment", "o_orderstatus"))
          .orderBy(col("c_mktsegment"), col("o_orderstatus"))
          .localCheckpoint(true)
        freeCkpt(li) // all consumers materialized above
        out
      } finally {
        MvRewrite.deregisterJoin(liPath, oPath, cPath)
        deleteTree(tmp)
      }
    },

    // A37 (r15): N-way INCREMENTAL star-MV maintenance — the r14
    // verdict's #3 ask: D43 proved the 3-table star SERVES from a
    // refresh-shape snapshot; this gate proves it can be MAINTAINED.
    // Three tables advance through 4 interleaved CDC rounds via
    // stepN's telescoped multilinear delta (Δ(T₁⋈T₂⋈T₃) = Σᵢ
    // new-prefix ⋈ ΔTᵢ ⋈ old-suffix, each term folded delta-outward),
    // with TWO delete channels: tombstones at first sight (the
    // A31/A32 pattern) plus a SECOND-WAVE delete of already-live
    // lineitems whose delete round may precede or follow the insert
    // round — the out-of-order case where the higher-version
    // tombstone must defeat a stale insert. The final MV is
    // registered and the user's literal customer-first star SQL is
    // plan-asserted to read ONLY the MV; counts + integer-cents sums
    // hash-identical to the oracle's live 3-way join over the final
    // states, zero tolerance.
    "mv_star_incremental" -> { (s, dir) =>
      import graft.plans.MvRewrite
      import graft.cdc.MaterializedJoin.TableIn
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      val tmp = TmpSweep.gateTempDir("mvsi_gate")
      val liPath = tmp.toString + "/li_flat"
      val oPath = tmp.toString + "/o_flat"
      val cPath = tmp.toString + "/c_flat"
      try {
        // item PK: lkey = l_orderkey·8 + l_linenumber is NOT unique in
        // the synthetic lineitem (duplicate (orderkey, linenumber)
        // pairs exist), and a PK changelog needs unique keys — so the
        // gate's item table is the per-lkey integer-cents rollup:
        // deterministic, unique by construction, and the oracle
        // replays the same GROUP BY exactly (l_orderkey = lkey div 8,
        // since linenumber ∈ 1..7)
        val li = Tables.lineitem(s, dir).select(
            (col("l_orderkey") * 8 + col("l_linenumber").cast("long")).as("lkey"),
            floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
          .groupBy(col("lkey")).agg(sum(col("cents")).as("cents"))
          .select(col("lkey"), expr("lkey div 8").as("l_orderkey"),
            col("cents"), lit(1L).as("lv"),
            (col("lkey") % 19 === 7).as("ldel"))
          // referenced by every round's batch slice (×2: insert +
          // delete wave) and the user-table write — checkpoint once,
          // freed with the states after the MV write
          .localCheckpoint(true)
        val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), lit(1L).as("ov"),
          (col("o_orderkey") % 13 === 3).as("odel"))
        val c = Tables.customer(s, dir).select(col("c_custkey"),
          col("c_mktsegment"), lit(1L).as("cv"),
          (col("c_custkey") % 17 === 5).as("cdel"))
        // second-wave deletes: live lineitems killed at version 2 in a
        // round DECOUPLED from their insert round (3·lkey+1 mod 4) —
        // some deletes arrive before their insert, which must then
        // lose latestPerKey to the tombstone
        val delWave = li.where(col("lkey") % 23 === 11 && !col("ldel"))
          .select(col("lkey"), col("l_orderkey"), col("cents"),
            lit(2L).as("lv"), lit(true).as("ldel"))
        def liBatch(i: Int): DataFrame =
          li.where(pmod(col("lkey"), lit(4)) === i)
            .unionByName(delWave.where(pmod(col("lkey") * 3 + 1, lit(4)) === i))
        val starPairs = Seq("l_orderkey" -> "o_orderkey",
          "o_custkey" -> "c_custkey")
        val groupCols = Seq("c_mktsegment", "o_orderstatus")
        var states = Seq(
          MaterializedJoin.emptyState(li, col("ldel")),
          MaterializedJoin.emptyState(o, col("odel")),
          MaterializedJoin.emptyState(c, col("cdel")))
        var allStates: Seq[DataFrame] = Nil
        var gds: Seq[DataFrame] = Nil
        (0 until 4).foreach { i =>
          val st = MaterializedJoin.stepN(Seq(
            TableIn(states(0), liBatch(i), Seq("lkey"), Seq(col("lv")), col("ldel")),
            TableIn(states(1), o.where(pmod(col("o_orderkey"), lit(4)) === i),
              Seq("o_orderkey"), Seq(col("ov")), col("odel")),
            TableIn(states(2), c.where(pmod(col("c_custkey"), lit(4)) === i),
              Seq("c_custkey"), Seq(col("cv")), col("cdel"))),
            starPairs, outCols = Seq("cents") ++ groupCols)
          states = st.states // stepN checkpoints them (do not re-pin)
          allStates = allStates ++ states
          gds = gds :+ MaterializedAgg.groupDelta(st.delta, groupCols,
            Seq("cents" -> col("cents")))
        }
        val mvPath = tmp.toString + "/mv"
        MaterializedAgg.mergeMv(None, gds.reduce(_ unionByName _),
            groupCols, Seq("cents"))
          .write.mode("overwrite").parquet(mvPath)
        allStates.foreach(freeCkpt) // all consumed by the MV write
        // the flat lake tables the USER queries = final live states
        // independent writes to distinct dirs — overlapped (guide §2.6)
        Par.run(
          () => li.where(!col("ldel") && !(col("lkey") % 23 === 11))
            .select(col("l_orderkey"), col("cents"))
            .write.mode("overwrite").parquet(liPath),
          () => o.where(!col("odel")).select(col("o_orderkey"), col("o_custkey"),
            col("o_orderstatus")).write.mode("overwrite").parquet(oPath),
          () => c.where(!col("cdel")).select(col("c_custkey"), col("c_mktsegment"))
            .write.mode("overwrite").parquet(cPath))
        MvRewrite.registerJoin(s, Seq(liPath, oPath, cPath), starPairs,
          mvPath, groupCols = groupCols,
          aggs = Map("n" -> MvRewrite.CountStar,
            "cents" -> MvRewrite.SumOf("cents")))
        s.read.parquet(liPath).createOrReplaceTempView("li_smi")
        s.read.parquet(oPath).createOrReplaceTempView("o_smi")
        s.read.parquet(cPath).createOrReplaceTempView("c_smi")
        // customer-first, the OPPOSITE order from registration
        val q = s.sql("""SELECT c_mktsegment, o_orderstatus,
          count(*) AS n_items, sum(cents) AS sum_cents
          FROM c_smi JOIN o_smi ON o_custkey = c_custkey
                     JOIN li_smi ON l_orderkey = o_orderkey
          GROUP BY c_mktsegment, o_orderstatus""")
        val roots = q.queryExecution.optimizedPlan.collect {
          case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
            fs.location.rootPaths.map(_.toUri.getPath)
        }.flatten
        val want = new org.apache.hadoop.fs.Path(mvPath).toUri.getPath
        require(roots.exists(_.startsWith(want)),
          s"star query must scan the maintained MV $want; scans: $roots")
        Seq(liPath, oPath, cPath).foreach { p =>
          val bad = new org.apache.hadoop.fs.Path(p).toUri.getPath
          require(!roots.exists(_.startsWith(bad)),
            s"star query must NOT rescan source $bad; scans: $roots")
        }
        val out = q.orderBy(col("c_mktsegment"), col("o_orderstatus"))
          .localCheckpoint(true)
        freeCkpt(li) // last consumer (the user-table write) is done
        out
      } finally {
        MvRewrite.deregisterJoin(liPath, oPath, cPath)
        deleteTree(tmp)
      }
    })

  val oracleSql: Map[String, String] = Map(
    // A41: the join-MV's min/max columns are EXACT — the oracle
    // replays the live join over the final post-delete states
    // (first-sight tombstones AND the second-wave tail kills), zero
    // tolerance; a rescan that missed an affected group would leave a
    // stale extremum and hash-mismatch
    "mv_join_minmax" ->
      """WITH o AS (SELECT o_custkey,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey % 13 <> 3
        |    AND CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) <= 49000000
        |    AND CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) >= 1100000),
        |c AS (SELECT c_custkey, c_mktsegment FROM customer
        |  WHERE c_custkey % 17 <> 5)
        |SELECT c_mktsegment, count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents,
        |  min(cents) AS min_cents, max(cents) AS max_cents
        |FROM o JOIN c ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // A42: the join-MV's ranked members are EXACT — the oracle replays
    // row_number over the live join of the final post-delete states
    // (first-sight tombstones AND both second-wave tail kills); a
    // rescan that missed a member retraction would serve a demoted or
    // dead member and hash-mismatch
    "mv_join_topk" ->
      """WITH o AS (SELECT o_orderkey, o_custkey,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey % 13 <> 3
        |    AND CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) <= 49000000
        |    AND CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) >= 1100000),
        |c AS (SELECT c_custkey, c_mktsegment FROM customer
        |  WHERE c_custkey % 17 <> 5)
        |SELECT c_mktsegment, rnk, o_orderkey, cents FROM (
        |  SELECT c_mktsegment, o_orderkey, cents,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY cents DESC, o_orderkey) AS rnk
        |  FROM o JOIN c ON o_custkey = c_custkey)
        |WHERE rnk <= 3 ORDER BY c_mktsegment, rnk""".stripMargin,
    // A43: the interleaved chunk/changelog log converges to a CLOSED
    // FORM the oracle states directly — last-append-wins means a key
    // is finally dead iff it was deleted and NOT resurrected by a
    // later-appended update (update batch k%4 > delete batch
    // (3k+1)%4); balances carry the update iff the key has one. Any
    // suppression or resume bug leaks a torn/stale chunk row appended
    // after its event and hash-mismatches.
    "cdc_snapshot_incremental" ->
      """SELECT c_custkey, c_name,
        |  CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
        |    + CASE WHEN c_custkey % 3 = 1 THEN 100000 ELSE 0 END AS bal_cents,
        |  c_mktsegment
        |FROM customer
        |WHERE c_custkey % 7 <> 2
        |   OR (c_custkey % 3 = 1 AND c_custkey % 4 > (3 * c_custkey + 1) % 4)
        |ORDER BY c_custkey""".stripMargin,
    "mv_sketch_rewrite" ->
      """SELECT event_type, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_exact,
        |  true AS du_ok, true AS p50_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // D40: the bitmap-served counts are EXACT — the oracle compares
    // values directly, no flags
    "mv_bitmap_rewrite" ->
      """SELECT event_type, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // D41: the MV-served join aggregates are EXACT (counts +
    // integer-cents sums) — the oracle replays the live join over the
    // final post-delete states at both grains, zero tolerance
    "mv_topk_rewrite" ->
      """WITH flat AS (SELECT user_id, event_type, value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn FROM events)
        |  WHERE rn = 1 AND event_type <> 'error'),
        |r AS (SELECT event_type, user_id, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value DESC, user_id) AS rnk
        |  FROM flat),
        |r2 AS (SELECT event_type, user_id, value,
        |    rank() OVER (PARTITION BY event_type ORDER BY value DESC, user_id) AS rnk
        |  FROM flat)
        |SELECT CAST(3 AS BIGINT) AS cut, event_type, rnk, user_id, round(value, 4) AS value
        |FROM r WHERE rnk <= 3
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), event_type, rnk, user_id, round(value, 4)
        |FROM r WHERE rnk <= 2
        |UNION ALL
        |SELECT CAST(13 AS BIGINT), event_type, rnk, user_id, round(value, 4)
        |FROM r2 WHERE rnk <= 3
        |ORDER BY cut, event_type, rnk""".stripMargin,
    "mv_minmax_rewrite" ->
      """WITH flat AS (SELECT o_orderstatus, o_orderpriority,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey % 13 <> 3),
        |q1 AS (SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |    CAST(sum(cents) AS BIGINT) AS sum_cents,
        |    min(cents) AS min_cents, max(cents) AS max_cents
        |  FROM flat GROUP BY 1, 2),
        |q2 AS (SELECT o_orderstatus, count(*) AS n2,
        |    CAST(sum(cents) AS BIGINT) AS s2,
        |    min(cents) AS mn2, max(cents) AS mx2
        |  FROM flat GROUP BY 1)
        |SELECT q1.o_orderstatus, o_orderpriority, n, sum_cents, min_cents,
        |  max_cents, n2, s2, mn2, mx2
        |FROM q1 JOIN q2 ON q1.o_orderstatus = q2.o_orderstatus
        |ORDER BY q1.o_orderstatus, o_orderpriority""".stripMargin,
    "mv_join_rewrite" ->
      """WITH o AS (SELECT o_custkey,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey % 13 <> 3),
        |c AS (SELECT c_custkey, c_name, c_mktsegment FROM customer
        |  WHERE c_custkey % 17 <> 5),
        |q1 AS (SELECT c_mktsegment, c_name, count(*) AS n_orders,
        |    CAST(sum(cents) AS BIGINT) AS sum_cents
        |  FROM o JOIN c ON o_custkey = c_custkey GROUP BY 1, 2),
        |q2 AS (SELECT c_mktsegment, count(*) AS seg_orders,
        |    CAST(sum(cents) AS BIGINT) AS seg_cents
        |  FROM o JOIN c ON o_custkey = c_custkey GROUP BY 1)
        |SELECT q1.c_mktsegment, c_name, n_orders, sum_cents,
        |  seg_orders, seg_cents
        |FROM q1 JOIN q2 ON q1.c_mktsegment = q2.c_mktsegment
        |ORDER BY q1.c_mktsegment, c_name""".stripMargin,
    // D43: the star-served aggregates are EXACT — the oracle replays
    // the live 3-way join at both grains, zero tolerance
    "mv_star_rewrite" ->
      """WITH li AS (SELECT l_orderkey,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM lineitem),
        |j AS (SELECT c_mktsegment, o_orderstatus, cents
        |  FROM li JOIN orders ON l_orderkey = o_orderkey
        |          JOIN customer ON o_custkey = c_custkey),
        |q1 AS (SELECT c_mktsegment, o_orderstatus, count(*) AS n_items,
        |    CAST(sum(cents) AS BIGINT) AS sum_cents
        |  FROM j GROUP BY 1, 2),
        |q2 AS (SELECT o_orderstatus, count(*) AS b_items,
        |    CAST(sum(cents) AS BIGINT) AS b_cents
        |  FROM j WHERE c_mktsegment = 'BUILDING' GROUP BY 1)
        |SELECT q1.o_orderstatus, c_mktsegment, n_items, sum_cents,
        |  b_items, b_cents
        |FROM q1 JOIN q2 ON q1.o_orderstatus = q2.o_orderstatus
        |ORDER BY c_mktsegment, q1.o_orderstatus""".stripMargin,
    // D44: both generations of the join-MV refresh are EXACT — the
    // oracle replays the live join over each generation's states
    // (gen 1 = CDC rounds 0-1, gen 2 = all four rounds), zero tolerance
    "mv_join_refresh" ->
      """WITH oa AS (SELECT o_custkey,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey % 13 <> 3),
        |ca AS (SELECT c_custkey, c_mktsegment FROM customer
        |  WHERE c_custkey % 2 = 0 AND c_custkey % 17 <> 5),
        |a AS (SELECT c_mktsegment, count(*) AS n1,
        |    CAST(sum(cents) AS BIGINT) AS s1
        |  FROM oa JOIN ca ON o_custkey = c_custkey GROUP BY 1),
        |ob AS (SELECT o_custkey,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey % 13 <> 3),
        |cb AS (SELECT c_custkey, c_mktsegment FROM customer
        |  WHERE c_custkey % 17 <> 5),
        |b AS (SELECT c_mktsegment, count(*) AS n2,
        |    CAST(sum(cents) AS BIGINT) AS s2
        |  FROM ob JOIN cb ON o_custkey = c_custkey GROUP BY 1)
        |SELECT a.c_mktsegment, n1, s1, n2, s2
        |FROM a JOIN b ON a.c_mktsegment = b.c_mktsegment
        |ORDER BY a.c_mktsegment""".stripMargin,
    // D46: both generations of the star-MV refresh are EXACT — the
    // oracle replays the live 3-way join over each generation's
    // states (gen 1 = rounds 0-1, gen 2 = all four), zero tolerance
    "mv_star_refresh" ->
      """WITH li0 AS (SELECT l_orderkey * 8 + l_linenumber AS lkey,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM lineitem),
        |lis AS (SELECT lkey, lkey // 8 AS l_orderkey, cents FROM (
        |    SELECT lkey, CAST(sum(cents) AS BIGINT) AS cents
        |    FROM li0 GROUP BY lkey)
        |  WHERE lkey % 5 = 0 AND lkey % 19 <> 7),
        |lia AS (SELECT * FROM lis WHERE lkey % 2 = 0),
        |lib AS (SELECT * FROM lis),
        |oa AS (SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |  WHERE o_orderkey % 13 <> 3 AND o_orderkey % 2 = 0),
        |ob AS (SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |  WHERE o_orderkey % 13 <> 3),
        |ca AS (SELECT c_custkey, c_mktsegment FROM customer
        |  WHERE c_custkey % 17 <> 5 AND c_custkey % 2 = 0),
        |cb AS (SELECT c_custkey, c_mktsegment FROM customer
        |  WHERE c_custkey % 17 <> 5),
        |a AS (SELECT c_mktsegment, o_orderstatus, count(*) AS n1,
        |    CAST(sum(cents) AS BIGINT) AS s1
        |  FROM lia JOIN oa ON l_orderkey = o_orderkey
        |           JOIN ca ON o_custkey = c_custkey GROUP BY 1, 2),
        |b AS (SELECT c_mktsegment, o_orderstatus, count(*) AS n2,
        |    CAST(sum(cents) AS BIGINT) AS s2
        |  FROM lib JOIN ob ON l_orderkey = o_orderkey
        |           JOIN cb ON o_custkey = c_custkey GROUP BY 1, 2)
        |SELECT a.c_mktsegment, a.o_orderstatus, n1, s1, n2, s2
        |FROM a JOIN b ON a.c_mktsegment = b.c_mktsegment
        |  AND a.o_orderstatus = b.o_orderstatus
        |ORDER BY a.c_mktsegment, a.o_orderstatus""".stripMargin,
    // A37: the incrementally-maintained star MV serves values EXACT
    // vs the oracle's live 3-way join over the final states (both
    // delete channels applied), zero tolerance
    "mv_star_incremental" ->
      """WITH li0 AS (SELECT l_orderkey * 8 + l_linenumber AS lkey,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM lineitem),
        |li AS (SELECT lkey, lkey // 8 AS l_orderkey,
        |    CAST(sum(cents) AS BIGINT) AS cents
        |  FROM li0
        |  WHERE lkey % 19 <> 7 AND lkey % 23 <> 11
        |  GROUP BY lkey),
        |o AS (SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |  WHERE o_orderkey % 13 <> 3),
        |c AS (SELECT c_custkey, c_mktsegment FROM customer
        |  WHERE c_custkey % 17 <> 5)
        |SELECT c_mktsegment, o_orderstatus, count(*) AS n_items,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM li JOIN o ON l_orderkey = o_orderkey
        |        JOIN c ON o_custkey = c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // r14: refresh-loop counts are EXACT at both generations — n1/d1
    // recount the first slice, n2/d2 the full stream
    "mv_refresh_loop" ->
      """WITH a AS (SELECT event_type, count(*) AS n1,
        |    count(DISTINCT user_id) AS d1
        |  FROM events WHERE user_id % 2 = 0 GROUP BY event_type),
        |b AS (SELECT event_type, count(*) AS n2,
        |    count(DISTINCT user_id) AS d2
        |  FROM events GROUP BY event_type)
        |SELECT a.event_type, n1, d1, n2, d2
        |FROM a JOIN b ON a.event_type = b.event_type
        |ORDER BY a.event_type""".stripMargin,
    "cdc_scd2_intervals" ->
      """WITH iv AS (SELECT user_id, event_id, value, ts AS valid_from,
        |  coalesce(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
        |           TIMESTAMP '2024-12-31 00:00:00') AS valid_to
        |  FROM events)
        |SELECT user_id, event_id,
        |  strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
        |  strftime(valid_to, '%Y-%m-%d %H:%M:%S') AS valid_to,
        |  round(value, 4) AS value
        |FROM iv ORDER BY event_id""".stripMargin,
    "cdc_scd2_lookup" ->
      """WITH iv AS (SELECT user_id AS i_user, event_id AS s_event, value,
        |  epoch_us(ts) AS f_us,
        |  epoch_us(coalesce(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
        |           TIMESTAMP '2024-12-31 00:00:00')) AS t_us
        |  FROM events),
        |p AS (SELECT event_id AS p_event, user_id, epoch_us(ts) AS p_us
        |      FROM events WHERE event_id % 7 = 0)
        |SELECT p.p_event, p.user_id, iv.s_event, round(iv.value, 4) AS value
        |FROM p JOIN iv ON p.user_id = iv.i_user
        | AND p.p_us >= iv.f_us AND p.p_us < iv.t_us
        |ORDER BY p_event""".stripMargin,
    "cdc_interval_overlap" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |numbered AS (
        |  SELECT user_id, ts,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM flagged),
        |sessions AS (
        |  SELECT user_id, sess, min(ts) AS s_start, max(ts) AS s_end
        |  FROM numbered GROUP BY user_id, sess),
        |iv AS (
        |  SELECT user_id AS i_user, event_id AS s_event, ts AS valid_from,
        |    coalesce(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
        |             TIMESTAMP '2024-12-31 00:00:00') AS valid_to
        |  FROM events)
        |SELECT s.user_id, CAST(s.sess AS BIGINT) AS sess, iv.s_event
        |FROM sessions s JOIN iv ON iv.i_user = s.user_id
        |  AND iv.valid_from < iv.valid_to
        |  AND iv.valid_from <= s.s_end
        |  AND iv.valid_to > s.s_start
        |ORDER BY s.user_id, sess, s_event""".stripMargin,
    "cdc_snapshot_read" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate, o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "cdc_envelope_roundtrip" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate, o_orderpriority,
        |'false' AS __deleted FROM orders ORDER BY o_orderkey""".stripMargin,
    "cdc_unwrap_rewrite" ->
      """SELECT event_id, user_id, round(value, 4) AS value,
        |CASE WHEN event_type = 'error' THEN 'true' ELSE 'false' END AS __deleted,
        |CASE WHEN event_type = 'signup' THEN 'c' WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS __op
        |FROM events ORDER BY event_id""".stripMargin,
    "cdc_upsert_latest" ->
      """SELECT user_id, event_type AS last_type, round(value, 4) AS last_value,
        |strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn FROM events)
        |WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id""".stripMargin,
    "cdc_delete_stats" ->
      """SELECT count(*) AS n_keys,
        |CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted,
        |CAST(sum(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_live
        |FROM (SELECT user_id, event_type, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn FROM events)
        |WHERE rn = 1""".stripMargin,
    // final-state aggregate computed directly (no increments): the MV
    // invariant is incremental maintenance == recompute
    "cdc_mv_join" ->
      """SELECT o.o_orderkey, o.o_custkey, c.c_name
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE o.o_orderkey % 13 <> 3 AND c.c_custkey % 17 <> 5
        |ORDER BY o_orderkey""".stripMargin,
    "cdc_mv_join_agg" ->
      """SELECT c.c_name, count(*) AS n,
        |  round(CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100, 2) AS revenue
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE o.o_orderkey % 13 <> 3 AND c.c_custkey % 17 <> 5
        |GROUP BY c.c_name ORDER BY c_name""".stripMargin,
    "cdc_mv_incremental" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS total
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn FROM events)
        |WHERE rn = 1 AND event_type <> 'error'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "cdc_mv_topk" ->
      """SELECT event_type, rank, user_id, round(value, 4) AS value FROM (
        |  SELECT event_type, user_id, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value DESC, user_id) AS rank
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn FROM events)
        |  WHERE rn = 1 AND event_type <> 'error')
        |WHERE rank <= 3 ORDER BY event_type, rank""".stripMargin,
    "cdc_mv_minmax" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS total,
        |  round(min(value), 4) AS vmin, round(max(value), 4) AS vmax
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn FROM events)
        |WHERE rn = 1 AND event_type <> 'error'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "cdc_routine_load" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate, o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "cdc_schema_evolution" ->
      """SELECT o_orderkey, o_orderstatus, 'unknown' AS o_channel
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "cdc_kafka_message" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate, o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "cdc_error_rows" ->
      """SELECT CAST(sum(CASE WHEN o_orderkey % 10 = 7 THEN 0 ELSE 1 END) AS BIGINT) AS n_good,
        |CAST(sum(CASE WHEN o_orderkey % 10 = 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
        |CAST(sum(CASE WHEN o_orderkey % 10 = 7 THEN 0 ELSE o_orderkey END) AS BIGINT) AS good_key_sum
        |FROM orders""".stripMargin,
    "cdc_upsert_salted" ->
      """SELECT user_id, event_type AS last_type, round(value, 4) AS last_value,
        |strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn FROM events)
        |WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id""".stripMargin,
    "cdc_schema_widening" ->
      """WITH latest AS (
        |  SELECT user_id, event_type, value FROM (
        |    SELECT user_id, event_type, value,
        |           row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
        |    FROM events) WHERE rn = 1)
        |SELECT COALESCE(l.user_id, c.c_custkey) AS k,
        |  round(CASE WHEN l.user_id IS NOT NULL THEN l.value
        |             ELSE CAST(CAST(c.c_acctbal AS REAL) AS DOUBLE) END, 4) AS bal
        |FROM customer c FULL JOIN latest l ON c.c_custkey = l.user_id
        |WHERE l.user_id IS NULL OR l.event_type <> 'error'
        |ORDER BY k""".stripMargin,
    "cdc_decimal_roundtrip" ->
      s"""SELECT o_orderstatus,
         |CAST(sum(${decimalAmountSql("o_orderkey")}) AS DECIMAL(18,2)) AS total_amount,
         |count(*) AS n
         |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "cdc_decimal_upsert" ->
      s"""SELECT user_id, CAST(${decimalAmountSql("event_id")} * 100 AS BIGINT) AS last_amount_cents
         |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn FROM events)
         |WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id""".stripMargin,
    "cdc_snapshot_then_merge" ->
      """WITH latest AS (
        |  SELECT user_id, event_type, value FROM (
        |    SELECT user_id, event_type, value,
        |           row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
        |    FROM events) WHERE rn = 1)
        |SELECT COALESCE(l.user_id, c.c_custkey) AS k,
        |  CASE WHEN l.user_id IS NOT NULL THEN 'user_' || l.user_id ELSE c.c_name END AS name,
        |  round(CASE WHEN l.user_id IS NOT NULL THEN l.value ELSE c.c_acctbal END, 4) AS bal,
        |  CASE WHEN l.user_id IS NOT NULL THEN 'EVENT' ELSE c.c_mktsegment END AS seg
        |FROM customer c FULL JOIN latest l ON c.c_custkey = l.user_id
        |WHERE l.user_id IS NULL OR l.event_type <> 'error'
        |ORDER BY k""".stripMargin,

    // D37 gate: the committed-sketch rollup's exact counts recomputed
    // from raw events; the 5% rank flags are expected TRUE (the B69
    // est_ok construction — a sketch drifting past its bound turns
    // this row red)
    "qsk_mv_rollup" ->
      """SELECT event_type, count(*) AS n_events,
        |  count(DISTINCT CAST(ts AS DATE)) AS n_days,
        |  true AS p50_ok, true AS p90_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // D38 gate: the committed distinct-count MV's exact counts
    // recomputed from raw events; the estimator flag is expected TRUE
    // (hash-deterministic, cannot flap — the B22 est_ok construction)
    "kmv_mv_rollup" ->
      """SELECT event_type, count(*) AS n_events,
        |  count(DISTINCT CAST(ts AS DATE)) AS n_days,
        |  count(DISTINCT user_id) AS n_users, true AS du_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
}
