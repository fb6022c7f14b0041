package graft

import org.apache.spark.sql.functions._
import graft.ops.Funnel

/** One-pass funnel semantics: anchor choice, window bound, strict
  * ordering, dedup-mode kills (incl. same-timestamp ties), and
  * equivalence with the staged-join formulation on the corpus. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private val steps = Seq("signup", "click", "purchase")
  private val day = expr("INTERVAL 1 DAY")

  private def depths(rows: Seq[(Long, java.sql.Timestamp, String)],
                     dedup: Boolean): Map[Long, Long] =
    Funnel.depth(rows.toDF("u", "t", "et"),
        keyCol = col("u"), tsCol = col("t"), typeCol = col("et"),
        steps = steps, window = day, dedup = dedup)
      .select(col("key"), col("depth")).as[(Long, Long)].collect().toMap

  test("full funnel, window bound, and strict ordering") {
    val rows = Seq(
      // u1: clean signup → click → purchase inside the window
      (1L, ts("2024-01-01 00:00:00"), "signup"),
      (1L, ts("2024-01-01 01:00:00"), "click"),
      (1L, ts("2024-01-01 02:00:00"), "purchase"),
      // u2: purchase lands past the 1-day window from the anchor
      (2L, ts("2024-01-01 00:00:00"), "signup"),
      (2L, ts("2024-01-01 01:00:00"), "click"),
      (2L, ts("2024-01-02 00:00:01"), "purchase"),
      // u3: click BEFORE signup does not count; none after
      (3L, ts("2024-01-01 00:00:00"), "click"),
      (3L, ts("2024-01-01 01:00:00"), "signup"),
      // u4: no signup at all → depth 0
      (4L, ts("2024-01-01 00:00:00"), "purchase"),
      // u5: window is anchored at the FIRST signup, so a click 2 days
      // later is out even though a second signup is nearer to it
      (5L, ts("2024-01-01 00:00:00"), "signup"),
      (5L, ts("2024-01-02 12:00:00"), "signup"),
      (5L, ts("2024-01-02 13:00:00"), "click"))
    val got = depths(rows, dedup = false)
    assert(got == Map(1L -> 3L, 2L -> 2L, 3L -> 1L, 4L -> 0L, 5L -> 1L))
  }

  test("window boundary is inclusive; same-ts step does not satisfy strict order") {
    val rows = Seq(
      // click exactly at anchor + 1 day: included (<=)
      (1L, ts("2024-01-01 00:00:00"), "signup"),
      (1L, ts("2024-01-02 00:00:00"), "click"),
      // click at the same instant as signup: ts > s0 fails
      (2L, ts("2024-01-01 00:00:00"), "signup"),
      (2L, ts("2024-01-01 00:00:00"), "click"))
    val got = depths(rows, dedup = false)
    assert(got == Map(1L -> 2L, 2L -> 1L))
  }

  test("dedup mode: repeats between matched steps break the funnel") {
    val rows = Seq(
      // u1: second signup between signup and click → stuck at 1
      (1L, ts("2024-01-01 00:00:00"), "signup"),
      (1L, ts("2024-01-01 00:30:00"), "signup"),
      (1L, ts("2024-01-01 01:00:00"), "click"),
      // u2: second click between click and purchase → stuck at 2
      (2L, ts("2024-01-01 00:00:00"), "signup"),
      (2L, ts("2024-01-01 01:00:00"), "click"),
      (2L, ts("2024-01-01 02:00:00"), "click"),
      (2L, ts("2024-01-01 03:00:00"), "purchase"),
      // u3: repeat AFTER completion is irrelevant
      (3L, ts("2024-01-01 00:00:00"), "signup"),
      (3L, ts("2024-01-01 01:00:00"), "click"),
      (3L, ts("2024-01-01 02:00:00"), "purchase"),
      (3L, ts("2024-01-01 03:00:00"), "signup"),
      // u4: tie — click and a second signup at the same instant: the
      // candidate is not strictly earlier than the repeat → killed
      (4L, ts("2024-01-01 00:00:00"), "signup"),
      (4L, ts("2024-01-01 01:00:00"), "signup"),
      (4L, ts("2024-01-01 01:00:00"), "click"),
      // u5: repeat outside the window cannot kill
      (5L, ts("2024-01-01 00:00:00"), "signup"),
      (5L, ts("2024-01-01 01:00:00"), "click"),
      (5L, ts("2024-01-03 00:00:00"), "signup"))
    val got = depths(rows, dedup = true)
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 1L, 5L -> 2L))
    // without dedup, u1/u2/u4 complete further
    val plain = depths(rows, dedup = false)
    assert(plain == Map(1L -> 2L, 2L -> 3L, 3L -> 3L, 4L -> 2L, 5L -> 2L))
  }

  private def depthsMax(rows: Seq[(Long, java.sql.Timestamp, String)],
                        dedup: Boolean): Map[Long, Long] =
    Funnel.depthMax(rows.toDF("u", "t", "et"),
        keyCol = col("u"), tsCol = col("t"), typeCol = col("et"),
        steps = steps, windowMicros = 86400000000L, dedup = dedup)
      .select(col("key"), col("depth")).as[(Long, Long)].collect().toMap

  test("multi-anchor: every step-0 event is a trial, best depth wins") {
    val rows = Seq(
      // u1: the upstream-divergence example — first signup's window
      // misses the click, the second signup's catches it
      (1L, ts("2024-01-01 00:00:00"), "signup"),
      (1L, ts("2024-01-03 00:00:00"), "signup"),
      (1L, ts("2024-01-03 01:00:00"), "click"),
      // u2: later anchor completes the full funnel, earlier stalls
      (2L, ts("2024-01-01 00:00:00"), "signup"),
      (2L, ts("2024-01-05 00:00:00"), "signup"),
      (2L, ts("2024-01-05 01:00:00"), "click"),
      (2L, ts("2024-01-05 02:00:00"), "purchase"),
      // u3: no signup → 0
      (3L, ts("2024-01-01 00:00:00"), "click"),
      // u4: single anchor behaves like depth()
      (4L, ts("2024-01-01 00:00:00"), "signup"),
      (4L, ts("2024-01-01 01:00:00"), "click"))
    assert(depthsMax(rows, dedup = false) ==
      Map(1L -> 2L, 2L -> 3L, 3L -> 0L, 4L -> 2L))
    // single-anchor scores u1/u2 at 1 — the documented divergence
    assert(depths(rows, dedup = false)(1L) == 1L)
    assert(depths(rows, dedup = false)(2L) == 1L)
  }

  test("multi-anchor dedup: a repeat kills one trial, not the others") {
    val rows = Seq(
      // anchor 1's trial is killed by anchor 2 (a signup repeat before
      // the click), but anchor 2's own trial completes cleanly
      (1L, ts("2024-01-01 00:00:00"), "signup"),
      (1L, ts("2024-01-01 00:30:00"), "signup"),
      (1L, ts("2024-01-01 01:00:00"), "click"))
    assert(depthsMax(rows, dedup = true) == Map(1L -> 2L))
    assert(depths(rows, dedup = true) == Map(1L -> 1L))
  }

  test("bot key: step-filtered collection + cap bound the working set") {
    // one key with 200k non-step events and a funnel buried in them:
    // non-step events never enter the collected list, and the cap
    // keeps the earliest step events deterministically
    val bot = (1 to 200000).map(i =>
      (9L, ts(f"2024-01-01 00:00:00"), "noise"))
    val funnel = Seq(
      (9L, ts("2024-01-01 00:00:00"), "signup"),
      (9L, ts("2024-01-01 01:00:00"), "click"),
      (9L, ts("2024-01-01 02:00:00"), "purchase"))
    val got = Funnel.depth((bot ++ funnel).toDF("u", "t", "et"),
        keyCol = col("u"), tsCol = col("t"), typeCol = col("et"),
        steps = steps, window = day, dedup = false, maxEventsPerKey = 100)
      .select(col("key"), col("depth")).as[(Long, Long)].collect().toMap
    assert(got == Map(9L -> 3L))
    // cap semantics: events past the earliest-n slice are invisible
    val manySteps = (1 to 50).map(i =>
      (7L, ts(f"2024-01-01 00:${i % 60}%02d:00"), "signup")) ++ Seq(
      (7L, ts("2024-01-01 02:00:00"), "click")) // sorts after the cap
    val capped = Funnel.depth(manySteps.toDF("u", "t", "et"),
        keyCol = col("u"), tsCol = col("t"), typeCol = col("et"),
        steps = steps, window = day, dedup = false, maxEventsPerKey = 10)
      .select(col("key"), col("depth")).as[(Long, Long)].collect().toMap
    assert(capped == Map(7L -> 1L))
  }

  test("native depthMax kernel equals a brute-force evaluation on the corpus") {
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts"), col("event_type"))
      .as[(Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(e => (e._2, e._3)).toSeq).toMap
    val w = 86400000000L
    def brute(events: Seq[(Long, String)], dedup: Boolean): Long = {
      val anchors = events.filter(_._2 == steps.head).map(_._1)
      val trials = anchors.map { a =>
        var prev = a; var depth = 1L; var broken = false
        for (i <- 1 until steps.size if !broken) {
          val cand = events.filter(e => e._2 == steps(i) && e._1 > prev && e._1 <= a + w)
            .map(_._1).minOption
          val rep = events.filter(e => steps.take(i).contains(e._2) &&
            e._1 > prev && e._1 <= a + w).map(_._1).minOption
          cand match {
            case Some(c) if !dedup || rep.forall(c < _) => depth += 1; prev = c
            case _ => broken = true
          }
        }
        depth
      }
      trials.maxOption.getOrElse(0L)
    }
    for (dedup <- Seq(false, true)) {
      val got = Funnel.depthMax(Tables.events(spark, sfDir),
          keyCol = col("user_id"), tsCol = col("ts"), typeCol = col("event_type"),
          steps = steps, windowMicros = w, dedup = dedup)
        .select(col("key"), col("depth")).as[(Long, Long)].collect().toMap
      val want = evs.map { case (u, es) => u -> brute(es, dedup) }
      assert(got == want, s"native kernel diverges from brute force (dedup=$dedup)")
    }
  }

  test("one-pass funnel equals the staged-join formulation on the corpus") {
    val native = SparkEntry.queries("q_funnel_native")(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    val staged = SparkEntry.queries("q_window_funnel")(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    assert(native == staged && native.nonEmpty)
  }

  test("one-pass plan is a single aggregation: no joins") {
    val df = SparkEntry.queries("q_funnel_native")(spark, sfDir)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("Join"), s"expected a join-free plan:\n$physical")
  }

  test("multi-anchor plan is also one aggregation: no joins, no explode") {
    val df = SparkEntry.queries("q_window_funnel_multi")(spark, sfDir)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("Join"), s"expected a join-free plan:\n$physical")
    // anchors are evaluated inside array expressions — a Generate
    // (explode) would multiply rows by anchor count before the agg
    assert(!physical.contains("Generate"), s"expected no row explosion:\n$physical")
  }

  test("sequenceCount: greedy non-overlapping state machine, deterministic ties") {
    def counts(rows: Seq[(Long, java.sql.Timestamp, Long, String)]): Map[Long, Long] =
      Funnel.sequenceCount(rows.toDF("u", "t", "id", "et"),
          keyCol = col("u"), tsCol = col("t"), tieCol = col("id"),
          typeCol = col("et"), openType = "signup", closeType = "purchase")
        .select(col("key"), col("n_matches")).as[(Long, Long)].collect().toMap
    val rows = Seq(
      // u1: S P S P → 2 disjoint chains
      (1L, ts("2024-01-01 00:00:00"), 1L, "signup"),
      (1L, ts("2024-01-01 01:00:00"), 2L, "purchase"),
      (1L, ts("2024-01-01 02:00:00"), 3L, "signup"),
      (1L, ts("2024-01-01 03:00:00"), 4L, "purchase"),
      // u2: S S P P → only ONE chain (second P has no unconsumed S:
      // the machine disarms on the first close)
      (2L, ts("2024-01-01 00:00:00"), 5L, "signup"),
      (2L, ts("2024-01-01 01:00:00"), 6L, "signup"),
      (2L, ts("2024-01-01 02:00:00"), 7L, "purchase"),
      (2L, ts("2024-01-01 03:00:00"), 8L, "purchase"),
      // u3: P before any S → 0; trailing S unmatched
      (3L, ts("2024-01-01 00:00:00"), 9L, "purchase"),
      (3L, ts("2024-01-01 01:00:00"), 10L, "signup"),
      // u4: same-timestamp S and P — tie column (event id) orders the
      // fold: S(id 11) then P(id 12) → 1
      (4L, ts("2024-01-01 00:00:00"), 11L, "signup"),
      (4L, ts("2024-01-01 00:00:00"), 12L, "purchase"),
      // u5: same-timestamp P then S by id order → 0
      (5L, ts("2024-01-01 00:00:00"), 14L, "signup"),
      (5L, ts("2024-01-01 00:00:00"), 13L, "purchase"),
      // other event types are invisible to the machine
      (6L, ts("2024-01-01 00:00:00"), 15L, "signup"),
      (6L, ts("2024-01-01 01:00:00"), 16L, "click"),
      (6L, ts("2024-01-01 02:00:00"), 17L, "purchase"))
    assert(counts(rows) ==
      Map(1L -> 2L, 2L -> 1L, 3L -> 0L, 4L -> 1L, 5L -> 0L, 6L -> 1L))
  }

  test("sequenceCount equals a reference fold on randomized histories") {
    val rnd = new scala.util.Random(42)
    val types = Array("signup", "purchase", "click")
    val rows = (1L to 2000L).map { id =>
      (rnd.nextInt(40).toLong, ts(f"2024-01-01 00:${rnd.nextInt(60)}%02d:00"),
        id, types(rnd.nextInt(3)))
    }
    val expected = rows.groupBy(_._1).map { case (u, evs) =>
      val ordered = evs.sortBy(e => (e._2.getTime, e._3)).map(_._4)
      val (_, cnt) = ordered.foldLeft((false, 0L)) {
        case ((open, c), "signup")            => (true, c)
        case ((true, c), "purchase")          => (false, c + 1)
        case (st, _)                          => st
      }
      u -> cnt
    }
    val got = Funnel.sequenceCount(rows.toDF("u", "t", "id", "et"),
        keyCol = col("u"), tsCol = col("t"), tieCol = col("id"),
        typeCol = col("et"), openType = "signup", closeType = "purchase")
      .select(col("key"), col("n_matches")).as[(Long, Long)].collect().toMap
    assert(got == expected)
  }

  test("depthFirst (native first-anchor kernel) equals depth on the corpus") {
    for (dedup <- Seq(false, true)) {
      val declarative = Funnel.depth(Tables.events(spark, sfDir),
          keyCol = col("user_id"), tsCol = col("ts"), typeCol = col("event_type"),
          steps = steps, window = day, dedup = dedup)
        .select(col("key"), col("depth")).as[(Long, Long)].collect().toMap
      val native = Funnel.depthFirst(Tables.events(spark, sfDir),
          keyCol = col("user_id"), tsCol = col("ts"), typeCol = col("event_type"),
          steps = steps, windowMicros = 86400000000L, dedup = dedup)
        .select(col("key"), col("depth")).as[(Long, Long)].collect().toMap
      assert(native == declarative && native.nonEmpty,
        s"first-anchor kernel diverges from the declarative chain (dedup=$dedup)")
    }
  }

  test("window_funnel resolves in spark.sql and matches the column kernel") {
    Tables.events(spark, sfDir).createOrReplaceTempView("funnel_sql_events")
    val sql = spark.sql(
      """SELECT user_id, window_funnel(
        |    sort_array(collect_list(struct(unix_micros(ts) AS ts, event_type AS et))),
        |    'view,click,purchase', 86400000000) AS depth
        |FROM funnel_sql_events
        |WHERE event_type IN ('view', 'click', 'purchase')
        |GROUP BY user_id""".stripMargin)
      .as[(Long, Long)].collect().toMap
    val api = graft.ops.Funnel.depthMax(Tables.events(spark, sfDir),
        col("user_id"), col("ts"), col("event_type"),
        Seq("view", "click", "purchase"), windowMicros = 86400000000L,
        dedup = false)
      .select(col("key"), col("depth")).as[(Long, Long)].collect().toMap
    assert(sql == api && sql.values.exists(_ >= 2), s"sql=${sql.size} api=${api.size}")
    // misuse errors are named, not internal crashes
    val e = intercept[Exception] {
      spark.sql("SELECT window_funnel(array(), 'a,b') FROM range(1)").collect()
    }
    assert(e.getMessage.contains("expects 3-4 arguments"))
  }
}
