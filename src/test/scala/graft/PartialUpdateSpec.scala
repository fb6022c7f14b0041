package graft

import org.apache.spark.sql.functions._
import graft.sinks.{PkTableSink, TxLog}

/** D19: partial-column upserts on the transactional PK lake. */
class PartialUpdateSpec extends SparkSpec {
  import spark.implicits._

  private def full(rows: (Long, Long, String, Long, Boolean)*) =
    rows.toDF("id", "ver", "name", "score", "del")

  private def freshRoot() =
    TestTmp.dir("partial").toString + "/t"

  private def bootstrap(root: String): Unit =
    PkTableSink.mergeTx(spark, root,
      full((1L, 1L, "a", 10L, false), (2L, 1L, "b", 20L, false),
        (3L, 1L, "c", 30L, false)),
      Seq("id"), Seq("ver"), "del", writer = "w")

  private def readRows(root: String) =
    PkTableSink.readTxPartial(spark, root, full().drop("del"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.toString),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toSet

  test("per-column coalescing: absent columns unchanged, present null applies") {
    val root = freshRoot(); bootstrap(root)
    // batch 1 touches only score; name must survive
    PkTableSink.mergeTxPartial(spark, root,
      Seq((1L, 2L, 11L, false), (2L, 2L, 21L, false)).toDF("id", "ver", "score", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    // batch 2 touches only name; for id=2 it writes an EXPLICIT null
    PkTableSink.mergeTxPartial(spark, root,
      Seq((1L, 3L, Some("a2"), false), (2L, 3L, Option.empty[String], false))
        .toDF("id", "ver", "name", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    assert(readRows(root) === Set(
      (1L, 3L, Some("a2"), Some(11L)),   // both partials landed
      (2L, 3L, None, Some(21L)),         // explicit null vs untouched score
      (3L, 1L, Some("c"), Some(30L))))   // untouched row intact
  }

  test("older partial does not override a newer one on the same column") {
    val root = freshRoot(); bootstrap(root)
    PkTableSink.mergeTxPartial(spark, root,
      Seq((1L, 5L, 50L, false)).toDF("id", "ver", "score", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    // late-arriving OLDER version of the same column: must lose
    PkTableSink.mergeTxPartial(spark, root,
      Seq((1L, 2L, 99L, false)).toDF("id", "ver", "score", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    assert(readRows(root).contains((1L, 5L, Some("a"), Some(50L))))
  }

  test("tombstone hides older records; a newer partial resurrects with nulls") {
    val root = freshRoot(); bootstrap(root)
    PkTableSink.mergeTxPartial(spark, root,
      Seq((2L, 2L, 99L, true)).toDF("id", "ver", "score", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    assert(!readRows(root).exists(_._1 == 2L), "deleted key must vanish")
    // resurrect via a NEWER partial: only score is written back
    PkTableSink.mergeTxPartial(spark, root,
      Seq((2L, 3L, 42L, false)).toDF("id", "ver", "score", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    assert(readRows(root).contains((2L, 3L, None, Some(42L))),
      "resurrected row carries nulls in unwritten columns")
  }

  test("whole-row paths refuse partial tables; compactTxPartial lifts it") {
    val root = freshRoot(); bootstrap(root)
    val baseDir = TxLog.current(spark, root).get.dataDir
    def baseFiles() = new java.io.File(baseDir).listFiles()
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(f => (f.getName, f.length, f.lastModified)).toSet
    val before = baseFiles()
    PkTableSink.mergeTxPartial(spark, root,
      Seq((1L, 2L, 11L, false)).toDF("id", "ver", "score", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    assert(baseFiles() === before, "partial commit must not rewrite the base")
    intercept[IllegalArgumentException] {
      PkTableSink.readTx(spark, root, full().drop("del")).collect()
    }
    intercept[IllegalArgumentException] {
      PkTableSink.mergeTx(spark, root, full((9L, 9L, "x", 0L, false)),
        Seq("id"), Seq("ver"), "del", writer = "w")
    }
    intercept[IllegalArgumentException] {
      PkTableSink.compactTx(spark, root, "w")
    }
    val expect = readRows(root)
    PkTableSink.compactTxPartial(spark, root, "w")
    // whole-row surface works again and agrees with the partial view
    val whole = PkTableSink.readTx(spark, root, full().drop("del"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.toString),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toSet
    assert(whole === expect)
    assert(readRows(root) === expect, "readTxPartial stays valid post-compact")
    // and a plain full-row merge applies on the compacted table
    PkTableSink.mergeTx(spark, root, full((9L, 9L, "x", 0L, false)),
      Seq("id"), Seq("ver"), "del", writer = "w")
    assert(PkTableSink.readTx(spark, root, full().drop("del"))
      .where(col("id") === 9).count() === 1)
  }

  test("a change column absent from the base schema is refused, not buried") {
    val root = freshRoot(); bootstrap(root)
    val v0 = TxLog.current(spark, root).get.version
    // misspelled 'score' — without the guard this would commit values
    // partialMerge can never read back (unrecoverable after compaction)
    val e = intercept[IllegalArgumentException] {
      PkTableSink.mergeTxPartial(spark, root,
        Seq((1L, 2L, 11L, false)).toDF("id", "ver", "scroe", "del"),
        Seq("id"), Seq("ver"), "del", writer = "w")
    }
    assert(e.getMessage.contains("scroe"), s"message should name the column: $e")
    assert(e.getMessage.contains("score"), s"message should list known columns: $e")
    // the failed attempt must not have advanced the version
    assert(TxLog.current(spark, root).get.version === v0)
    assert(readRows(root) === Set(
      (1L, 1L, Some("a"), Some(10L)), (2L, 1L, Some("b"), Some(20L)),
      (3L, 1L, Some("c"), Some(30L))))
  }

  test("deleted keys survive compaction as tombstones (no straggler resurrection)") {
    val root = freshRoot(); bootstrap(root)
    PkTableSink.mergeTxPartial(spark, root,
      Seq((3L, 5L, 0L, true)).toDF("id", "ver", "score", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    PkTableSink.compactTxPartial(spark, root, "w")
    assert(!readRows(root).exists(_._1 == 3L))
    // a straggler carrying an OLDER insert of the deleted key
    PkTableSink.mergeTx(spark, root, full((3L, 2L, "zombie", 1L, false)),
      Seq("id"), Seq("ver"), "del", writer = "w")
    assert(!PkTableSink.readTx(spark, root, full().drop("del"))
      .where(col("id") === 3).collect().exists(_ => true),
      "compacted tombstone must still block an older straggler")
  }
}
