package graft

import org.apache.spark.sql.functions._
import graft.sinks.{BloomSidecar, PkTableSink, TxLog}

/** D21: per-file Bloom sidecars — point-lookup pruning on columns zone
  * maps cannot help with. */
class BloomSidecarSpec extends SparkSpec {
  import spark.implicits._

  // ref is high-cardinality and UNCORRELATED with the id sort order —
  // the column shape where zone ranges prune nothing
  private def rows() = (0L until 2000L)
    .map(i => (i, 1L, (i * 48271L + 11L) % 1000000007L, s"v$i", false))
    .toDF("id", "ver", "ref", "v", "del")

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("bloom").toString + "/t"

  private def build(root: String): Unit = {
    PkTableSink.mergeTx(spark, root, rows(), Seq("id"), Seq("ver"), "del",
      writer = "w")
    PkTableSink.compactTx(spark, root, "w", targetRowsPerFile = 200,
      bloomCols = Seq("ref"), bloomExpectedPerFile = 10000)
  }

  test("bloom point lookup prunes to ~1 file and never loses a match") {
    val root = freshRoot(); build(root)
    val dir = TxLog.current(spark, root).get.dataDir
    val total = new java.io.File(dir).listFiles()
      .count(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(total >= 8, s"expected a many-file base, got $total")
    val refs = (0L until 2000L by 97L).map(i => (i * 48271L + 11L) % 1000000007L)
    var scannedTotal = 0
    refs.foreach { r =>
      val files = BloomSidecar.pruneFiles(spark, dir, "ref", r.toString)
      scannedTotal += files.size
      val got = PkTableSink.readTxPointOn(spark, root, rows().drop("del"),
        "ref", r.toString).select("ref").as[Long].collect()
      assert(got.toSeq === Seq(r), s"lookup for ref=$r")
    }
    // fpp=1% on ~10 files → expected scan ≈ 1.1 files per probe; 2× is
    // generous slack
    assert(scannedTotal <= refs.size * 2,
      s"bloom pruning too weak: $scannedTotal files for ${refs.size} probes")
    // an absent value prunes to (almost always) zero files and returns
    // nothing either way
    val miss = PkTableSink.readTxPointOn(spark, root, rows().drop("del"),
      "ref", "123456789012")
    assert(miss.count() === 0)
  }

  test("legacy dirs (no sidecar) and outstanding deltas stay correct") {
    val root = freshRoot()
    PkTableSink.mergeTx(spark, root, rows(), Seq("id"), Seq("ver"), "del",
      writer = "w")
    PkTableSink.compactTx(spark, root, "w", targetRowsPerFile = 200) // no blooms
    val r0 = (5L * 48271L + 11L) % 1000000007L
    assert(PkTableSink.readTxPointOn(spark, root, rows().drop("del"),
      "ref", r0.toString).count() === 1)
    // a delta updates the probed row: fallback path must see it
    PkTableSink.mergeTx(spark, root,
      Seq((5L, 2L, r0, "updated", false)).toDF("id", "ver", "ref", "v", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    val got = PkTableSink.readTxPointOn(spark, root, rows().drop("del"),
      "ref", r0.toString).select("v").as[String].collect()
    assert(got.toSeq === Seq("updated"))
  }
}
