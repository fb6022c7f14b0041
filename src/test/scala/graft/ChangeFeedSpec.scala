package graft

import graft.sinks.PkTableSink

/** D20: version-to-version change feed on the transactional PK lake. */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def batch(rows: (Long, Long, String, Boolean)*) =
    rows.toDF("id", "ver", "v", "del")

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("cdf").toString + "/t"

  private def merge(root: String, rows: (Long, Long, String, Boolean)*): Long =
    PkTableSink.mergeTx(spark, root, batch(rows: _*),
      Seq("id"), Seq("ver"), "del", writer = "w")

  private def changes(root: String, from: Long, to: Long) =
    PkTableSink.readTxChanges(spark, root, from, to)
      .select("id", "ver", "v", "_change_type")
      .as[(Long, Long, String, String)].collect().toSet

  test("net insert/update/delete between versions; unchanged keys silent") {
    val root = freshRoot()
    val v0 = merge(root, (1L, 1L, "a", false), (2L, 1L, "b", false),
      (3L, 1L, "c", false), (4L, 1L, "d", false))
    val v1 = merge(root, (2L, 2L, "b2", false), (5L, 1L, "e", false))
    val v2 = merge(root, (3L, 2L, "", true))
    assert(changes(root, v0, v1) === Set(
      (2L, 2L, "b2", "update"), (5L, 1L, "e", "insert")))
    assert(changes(root, v0, v2) === Set(
      (2L, 2L, "b2", "update"), (5L, 1L, "e", "insert"),
      (3L, 1L, "c", "delete")))          // delete carries the last visible row
    assert(changes(root, v1, v2) === Set((3L, 1L, "c", "delete")))
    assert(changes(root, v2, v2) === Set.empty)
  }

  test("a late delta that loses the version merge emits no change") {
    val root = freshRoot()
    merge(root, (1L, 5L, "new", false))
    val v1 = PkTableSink.compactTx(spark, root, "w")
    val v2 = merge(root, (1L, 2L, "stale", false)) // older version: no-op
    assert(changes(root, v1, v2) === Set.empty)
  }

  test("diff across a compaction boundary falls back and stays correct") {
    val root = freshRoot()
    merge(root, (1L, 1L, "a", false), (2L, 1L, "b", false))
    val v1 = merge(root, (3L, 1L, "c", false))
    PkTableSink.compactTx(spark, root, "w")      // dir lists now diverge
    val v3 = merge(root, (2L, 2L, "b2", false), (1L, 2L, "", true))
    assert(changes(root, v1, v3) === Set(
      (2L, 2L, "b2", "update"), (1L, 1L, "a", "delete")))
  }

  test("re-writing an identical row is silent; a version-only bump reports") {
    val root = freshRoot()
    val v0 = merge(root, (1L, 1L, "a", false), (2L, 1L, "b", false))
    // identical row (same version, same values) → merge keeps one,
    // visible state unchanged
    val v1 = merge(root, (1L, 1L, "a", false))
    assert(changes(root, v0, v1) === Set.empty)
    // same values, HIGHER version: the visible row changed (its
    // version column did) → update
    val v2 = merge(root, (2L, 3L, "b", false))
    assert(changes(root, v1, v2) === Set((2L, 3L, "b", "update")))
  }
}
