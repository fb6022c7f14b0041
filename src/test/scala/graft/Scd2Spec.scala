package graft

import org.apache.spark.sql.functions._
import graft.cdc.Scd2

/** SCD2 boundary semantics: half-open validity, same-timestamp
  * supersession, clamp behavior, empty probes. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private val cap = lit("2099-01-01 00:00:00").cast("timestamp")

  private def chg = Seq(
    (1L, 10L, ts("2024-01-01 00:00:00.000001"), "v1"),
    (1L, 11L, ts("2024-01-02 00:00:00.000001"), "v2"),
    // key 2: two versions at the SAME timestamp — 21 supersedes 20
    (2L, 20L, ts("2024-01-01 12:00:00"), "old"),
    (2L, 21L, ts("2024-01-01 12:00:00"), "new")
  ).toDF("k", "ev", "t", "v")

  private def iv = Scd2.intervals(chg, keyCol = col("k"), tsCol = col("t"),
    tiebreak = col("ev"), cap = cap)

  test("intervals are half-open and contiguous; same-ts version gets zero length") {
    val rows = iv.orderBy("ev")
      .select(col("ev"), col("valid_from").cast("string"), col("valid_to").cast("string"))
      .as[(Long, String, String)].collect().toSeq
    assert(rows(0) == ((10L, "2024-01-01 00:00:00.000001", "2024-01-02 00:00:00.000001")))
    assert(rows(1)._3.startsWith("2099-01-01")) // current version runs to cap
    // superseded same-ts version: zero-length interval
    assert(rows(2)._2 == rows(2)._3)
  }

  test("lookup hits exact boundaries correctly and never sees superseded same-ts versions") {
    val pts = Seq(
      (100L, 1L, ts("2024-01-01 00:00:00.000001")), // == v1's from → v1
      (101L, 1L, ts("2024-01-02 00:00:00")),        // just before v2 → v1
      (102L, 1L, ts("2024-01-02 00:00:00.000001")), // == v2's from → v2
      (103L, 2L, ts("2024-01-01 12:00:00")),        // same-ts pair → ev 21 only
      (104L, 1L, ts("2023-12-31 00:00:00"))         // before history → no match
    ).toDF("pid", "pk", "pt")
    val got = Scd2.asOfLookup(iv, col("k"), pts, col("pk"), col("pt"),
      bucketWidthUs = 86400L * 1000000L)
      .select(col("pid"), col("ev")).as[(Long, Long)].collect().toMap
    assert(got == Map(100L -> 10L, 101L -> 10L, 102L -> 11L, 103L -> 21L))
  }

  test("empty probe set returns empty, no error from the clamp") {
    val pts = Seq.empty[(Long, Long, java.sql.Timestamp)].toDF("pid", "pk", "pt")
    assert(Scd2.asOfLookup(iv, col("k"), pts, col("pk"), col("pt"),
      bucketWidthUs = 1000000L).isEmpty)
  }

  test("overlappingVersions: cap-sentinel version clamps instead of exploding buckets") {
    val ranges = Seq(
      // covers v1's whole life and v2's start
      (200L, 1L, ts("2024-01-01 06:00:00"), ts("2024-01-02 06:00:00")),
      // after v2 started: hits only the current (cap-sentinel) version
      (201L, 1L, ts("2024-01-03 00:00:00"), ts("2024-01-03 01:00:00")),
      // same-ts superseded version is invisible; 21 matches
      (202L, 2L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:00:00")),
      // before all history → nothing
      (203L, 1L, ts("2023-01-01 00:00:00"), ts("2023-01-02 00:00:00"))
    ).toDF("rid", "rk", "rs", "re")
    val got = Scd2.overlappingVersions(iv, col("k"),
      ranges, col("rk"), col("rs"), col("re"),
      bucketWidthUs = 3600L * 1000000L) // 1h buckets vs a 2099 cap: must clamp
      .select(col("rid"), col("ev")).as[(Long, Long)].collect().toSeq
    assert(got.size == got.toSet.size, "duplicate (range, version) pairs")
    assert(got.toSet == Set((200L, 10L), (200L, 11L), (201L, 11L), (202L, 21L)))
  }
}
