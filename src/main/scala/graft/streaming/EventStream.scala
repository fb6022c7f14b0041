package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermarked windowed aggregation over an event stream — the
  * monitoring/metrics queries the reference pipeline serves
  * continuously (rates per type over time; see the counters in
  * /root/reference/monitor.sh and continuous-ingest.sh).
  */
object EventStream {

  /** Tumbling-window counts/sums per event type with a watermark.
    * Emits (window_start, window_end, event_type, n, sum_value).
    *
    * At scale: the pre-shuffle partial aggregation collapses each
    * executor's slice of a window before the exchange, and the
    * watermark bounds state to (watermark horizon / window) rows per
    * type — no unbounded state.
    */
  def windowedCounts(events: DataFrame, tsCol: String, typeCol: String,
                     valueCol: String, window: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window), col(typeCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col(typeCol), col("n"), col("sum_value"))

  /** Tumbling-window EXACT distinct users per type via the compressed
    * bitmap aggregate — the realtime StarRocks BITMAP rollup
    * (`bitmap_union_count` in a materialized view over a stream):
    * streaming `count(DISTINCT …)` is unsupported by design (per-key
    * value state is unbounded), `approx_count_distinct` trades
    * exactness, and the bitmap aggregator closes the gap — its state
    * per (window, type) is one roaring-shaped bitmap ∝ distinct ids
    * in compressed form (dense 2¹⁶ blocks cap at 8 KB each), it
    * merges associatively across partials/batches, and the watermark
    * expires whole windows. Emits exact distincts continuously.
    *
    * `slide` < window turns the tumbling windows into SLIDING ones
    * (the streaming twin of the batch q_sliding_distinct): each event
    * folds into window/slide overlapping bitmaps, state stays ONE
    * bitmap per (window, type) — the overlap multiplies compressed
    * bitmap state, never raw-event state — and the watermark still
    * expires whole windows.
    */
  def bitmapDistinctStream(events: DataFrame, tsCol: String, typeCol: String,
                           idCol: String, window: String = "1 hour",
                           watermark: String = "2 hours",
                           slide: Option[String] = None): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(slide.fold(
        org.apache.spark.sql.functions.window(col(tsCol), window))(sl =>
        org.apache.spark.sql.functions.window(col(tsCol), window, sl)), col(typeCol))
      .agg(graft.functions.Rbm.rbmDistinct(col(idCol)).as("n_distinct"),
        count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col(typeCol), col("n_distinct"), col("n"))

  /** Continuously-maintained windowed PERCENTILES — the streaming
    * twin of the batch q_percentile_rollup (B69) and the third
    * sketch-state kernel beside the bitmap-distinct and heavy-hitter
    * streams: per (window, type) the state is ONE bounded Qsk
    * compactor sketch (≤ k values/level — never the raw value
    * stream), partials merge associatively across micro-batches, the
    * watermark expires whole windows, and each trigger emits the
    * window's current quantile estimate (rank error ≤ the QskSpec
    * bound at any partitioning/arrival order).
    */
  def percentileStream(events: DataFrame, tsCol: String, typeCol: String,
                       valueCol: String, q: Double = 0.5,
                       window: String = "1 hour",
                       watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window),
        col(typeCol))
      .agg(graft.functions.Qsk.qskQuantileAgg(col(valueCol), q).as("p_est"),
        count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col(typeCol), col("p_est"), col("n"))

  /** Gap-based session windows per key (the streaming twin of the
    * batch sessionization query): a session closes after `gap` of
    * inactivity; state is bounded by the watermark.
    */
  def sessionCounts(events: DataFrame, tsCol: String, keyCol: String,
                    gap: String = "30 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col(keyCol), col("n_events"))

  /** Streaming ingest dedup — the training-data front door: a crawl /
    * CDC feed re-delivers documents (at-least-once transport, repeated
    * crawls), and only the first arrival of each id within the
    * watermark horizon should flow downstream.
    * `dropDuplicatesWithinWatermark` keeps one state row per id ONLY
    * until the watermark passes it (exact dedup with bounded state) —
    * unlike a bare dropDuplicates whose state grows forever. Re-keyed
    * content dedup = pass a content hash (e.g. md5(text)) as `idCol`.
    */
  def dedupStream(events: DataFrame, idCol: String, tsCol: String,
                  watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCol)

  /** Stream-stream inner join within a time bound: each left event
    * joins right events of the same key within `bound` after it.
    * Watermarks on both sides let Spark expire join state — the
    * pattern for correlating two CDC/event feeds at scale.
    */
  def timeBoundJoin(left: DataFrame, right: DataFrame, keyCol: String,
                    leftTs: String, rightTs: String, bound: String,
                    watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      l(keyCol) === r(keyCol) &&
        r(rightTs) >= l(leftTs) &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $bound"))
      .drop(r(keyCol))
  }

  /** Per-key step events kept by the streaming funnel (sorted by
    * (ts, type)); `depth` is the last emitted value, kept to suppress
    * no-change re-emits. */
  case class FunnelState(ts: Seq[Long], ets: Seq[String], depth: Long)
  case class SeqCountState(ts: Seq[Long], ties: Seq[Long], steps: Seq[Int],
                           cnt: Long)

  /** Streaming window_funnel: incremental per-key funnel depth over an
    * event stream, exactly the batch semantics of
    * [[graft.ops.Funnel.depth]] / `depthFirst` (value-based FIRST-anchor
    * chain) under ANY arrival order — late or out-of-order events
    * re-evaluate the chain because the state keeps the key's step-typed
    * events, not just the chain tips (a late-arriving earlier signup
    * legitimately moves the anchor and can change every later step).
    * Emits (key, depth) in Update mode whenever a batch changes a
    * key's depth.
    *
    * State shape mirrors the batch operator's working set: only
    * STEP-TYPED events are stored (filtered before the shuffle) and
    * `maxEventsPerKey` hard-caps a key at its EARLIEST n step events —
    * the same deterministic bound as the batch twin, so bot-grade keys
    * cannot grow state without limit PER KEY. Total state is still
    * ∝ distinct key cardinality: with no TTL, a key seen once is
    * retained forever (user-id domains are unbounded). For bounded
    * total state pass `stateTtlMs > 0` — keys idle longer than the TTL
    * are evicted; a key that reappears after eviction restarts its
    * funnel from the post-eviction events, the standard retention
    * trade-off.
    *
    * TTL clock: with `eventTimeWatermark = None` the TTL is PROCESSING
    * time — right for a live feed, wrong for a backfill (replaying
    * years of history in hours would never expire anything, or a
    * paused query would expire everything). Passing
    * `eventTimeWatermark = Some("10 minutes")` sets a watermark of
    * that delay on `tsCol` and switches the TTL to EVENT time: a key
    * is evicted once the watermark (max observed event time − delay)
    * passes its newest event + `stateTtlMs` — the same clock the data
    * itself advances, so a multi-year backfill replayed in an hour
    * expires state exactly as the live run would have
    * (dropDuplicatesWithinWatermark's semantics, applied to the
    * funnel's state). Depth evaluation is the shared native kernel
    * ([[graft.functions.WindowFunnelImpl.depthArrays]]).
    *
    * Input columns: key (long), ts (timestamp), et (string).
    */
  def funnelDepthStream(events: DataFrame, keyCol: String, tsCol: String,
                        typeCol: String, steps: Seq[String], windowMicros: Long,
                        dedup: Boolean = false,
                        maxEventsPerKey: Int = 10000,
                        stateTtlMs: Long = 0L,
                        eventTimeWatermark: Option[String] = None): org.apache.spark.sql.Dataset[(Long, Long)] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val stepArr = steps.toArray
    val eventTtl = eventTimeWatermark.isDefined && stateTtlMs > 0
    val src = eventTimeWatermark.fold(events)(d => events.withWatermark(tsCol, d))
    // the watermarked timestamp column must reach the stateful
    // operator's input for EventTimeTimeout (the checker tracks the
    // marked attribute) — carried alongside its micros rendering
    src
      .select(col(keyCol).cast("long").as("k"),
        unix_micros(col(tsCol)).as("t"), col(typeCol).as("et"),
        col(tsCol).as("wm"))
      .where(col("et").isin(steps: _*))
      .as[(Long, Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, (Long, Long)](
        OutputMode.Update(),
        if (eventTtl) GroupStateTimeout.EventTimeTimeout()
        else if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
        else GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[(Long, Long, String, java.sql.Timestamp)],
         state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(FunnelState(Nil, Nil, -1L))
            val merged = (prev.ts.zip(prev.ets) ++ rows.map(r => (r._2, r._3)))
              .sorted.take(maxEventsPerKey)
            val ts = merged.map(_._1).toArray
            val ets = merged.map(_._2).toArray
            val depth = graft.functions.WindowFunnelImpl.depthArrays(
              ts, ets, ts.length, stepArr, windowMicros, dedup,
              firstAnchorOnly = true)
            state.update(FunnelState(ts.toSeq, ets.toSeq, depth))
            if (eventTtl)
              // newest event (micros→ms) + TTL, clamped past the current
              // watermark — Spark rejects a timeout at/behind it
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs + 1, ts.last / 1000 + stateTtlMs))
            else if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
            if (depth != prev.depth) Iterator.single((key, depth)) else Iterator.empty
          }
      }
  }

  /** Streaming non-overlapping sequence count — the incremental twin
    * of [[graft.ops.Funnel.sequenceCount]] (greedy open→close state
    * machine), exact batch parity under ANY arrival order: the state
    * keeps the key's pattern-typed events (a late-arriving open can
    * re-pair every later close, so chain-tail-only state would be
    * wrong) and the machine re-folds over the (ts, tie)-sorted buffer
    * each batch. Emits (key, count) in Update mode when a batch
    * changes a key's count.
    *
    * Same state bounds as [[funnelDepthStream]]: only open/close-typed
    * events are stored, `maxEventsPerKey` caps a key at its EARLIEST n
    * events, and `stateTtlMs > 0` adds a TTL for unbounded key
    * cardinality — processing-time by default, EVENT-time (watermark
    * eviction, backfill-correct) when `eventTimeWatermark` is set, as
    * documented on [[funnelDepthStream]].
    */
  def sequenceCountStream(events: DataFrame, keyCol: String, tsCol: String,
                          tieCol: String, typeCol: String,
                          openType: String, closeType: String,
                          maxEventsPerKey: Int = 10000,
                          stateTtlMs: Long = 0L,
                          eventTimeWatermark: Option[String] = None): org.apache.spark.sql.Dataset[(Long, Long)] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val eventTtl = eventTimeWatermark.isDefined && stateTtlMs > 0
    val src = eventTimeWatermark.fold(events)(d => events.withWatermark(tsCol, d))
    src
      .select(col(keyCol).cast("long").as("k"),
        unix_micros(col(tsCol)).as("t"), col(tieCol).cast("long").as("tie"),
        col(typeCol).as("et"), col(tsCol).as("wm"))
      .where(col("et").isin(openType, closeType))
      .as[(Long, Long, Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SeqCountState, (Long, Long)](
        OutputMode.Update(),
        if (eventTtl) GroupStateTimeout.EventTimeTimeout()
        else if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
        else GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[(Long, Long, Long, String, java.sql.Timestamp)],
         state: GroupState[SeqCountState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(SeqCountState(Nil, Nil, Nil, -1L))
            val prevEvs = prev.ts.indices.map(i =>
              (prev.ts(i), prev.ties(i), prev.steps(i)))
            val merged = (prevEvs ++ rows.map(r =>
                (r._2, r._3, if (r._4 == openType) 1 else 2)))
              .sorted.take(maxEventsPerKey)
            var open = false
            var cnt = 0L
            merged.foreach { case (_, _, s) =>
              if (s == 1) open = true
              else if (open) { cnt += 1; open = false }
            }
            state.update(SeqCountState(merged.map(_._1), merged.map(_._2),
              merged.map(_._3), cnt))
            if (eventTtl)
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs + 1,
                merged.last._1 / 1000 + stateTtlMs))
            else if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
            if (cnt != prev.cnt) Iterator.single((key, cnt)) else Iterator.empty
          }
      }
  }

  /** Per-shard Misra–Gries state: the ≤ k counters plus the shard's
    * total item count (the undercount bound's n). */
  case class MgState(counters: Map[String, Long], n: Long)

  /** Streaming heavy hitters — a continuously-maintained
    * `approx_top_k` (the StarRocks/ClickHouse realtime top-N tile):
    * each micro-batch folds into per-shard Misra–Gries sketches held
    * in `mapGroupsWithState`, emitting every shard's (counters, n)
    * each batch it receives rows.
    *
    * Sharding is BY ITEM HASH, so all occurrences of an item live in
    * exactly one shard: every item with true count > n_shard/(k+1) is
    * guaranteed present in its shard's sketch, and each kept counter
    * undercounts by ≤ n_shard/(k+1) (see [[graft.functions.HeavyHitters]]).
    * The reader unions shard outputs (≤ shards·k counters — tiny) and
    * ranks; the exact-verify twin (q_heavy_hitters' prune-then-count)
    * applies downstream unchanged. State is shards × k counters —
    * bounded regardless of item cardinality, no TTL needed; `shards`
    * also caps the kernel's parallelism, so size it to the cluster,
    * not the data.
    */
  def heavyHittersStream(events: DataFrame, itemCol: String, k: Int,
                         shards: Int = 32): org.apache.spark.sql.Dataset[(Int, Map[String, Long], Long)] = {
    import org.apache.spark.sql.streaming.GroupState
    require(shards > 0, "shards must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val mg = new graft.functions.HeavyHitters(k)
    events
      .select(col(itemCol).cast("string").as("item"),
        pmod(hash(col(itemCol)), lit(shards)).cast("int").as("shard"))
      .as[(String, Int)]
      .groupByKey(_._2)
      .mapGroupsWithState[MgState, (Int, Map[String, Long], Long)] {
        (shard: Int, rows: Iterator[(String, Int)], state: GroupState[MgState]) =>
          val prev = state.getOption.getOrElse(MgState(Map.empty, 0L))
          var buf = prev.counters
          var n = prev.n
          rows.foreach { r => buf = mg.reduce(buf, r._1); n += 1 }
          state.update(MgState(buf, n))
          (shard, buf, n)
      }
  }
}
