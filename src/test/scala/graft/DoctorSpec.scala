package graft

import org.apache.spark.sql.functions._
import graft.sinks.{Doctor, GlobalDict, InvertedIndex, PkTableSink, SidecarGc, TableStats}

/** D35: table-health diagnostic — findings mirror the serving rules
  * exactly, remedies name the fixing call, and applying each remedy
  * flips its finding back to ok. */
class DoctorSpec extends SparkSpec {
  import spark.implicits._

  test("findings track the freshness protocols through degrade -> remedy cycles") {
    val root = TestTmp.dir("doc").toString + "/t"
    PkTableSink.mergeTx(spark, root,
      (0L until 200L).map(i => (i, 1L, s"seg-${i % 5}", s"alpha beta doc $i", false))
        .toDF("id", "ver", "segment", "text", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    TableStats.analyzeTx(spark, root)
    GlobalDict.buildTx(spark, root, "segment")
    InvertedIndex.buildTx(spark, root, "id", "text")
    val healthy = Doctor.examine(spark, root)
    assert(healthy.healthy, s"expected healthy:\n${healthy.render}")
    assert(healthy.findings.exists(f => f.check == "table stats" && f.detail.contains("200 rows")))

    // one commit without refreshing anything: stats + dict withdraw,
    // index chain breaks, old sidecar generations become garbage
    PkTableSink.mergeTx(spark, root,
      Seq((500L, 1L, "seg-NEW", "gamma delta doc", false))
        .toDF("id", "ver", "segment", "text", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    val degraded = Doctor.examine(spark, root)
    val bad = degraded.degraded.map(_.check).toSet
    assert(bad.contains("table stats") && bad.contains("dict 'segment'") &&
      bad.contains("inverted index") && bad.contains("sidecar garbage"),
      s"missing findings:\n${degraded.render}")
    // remedies name the actual calls (stale stats -> the ∝-delta refresh)
    assert(degraded.degraded.find(_.check == "table stats").get.remedy
      .contains("refreshTx"))
    assert(degraded.degraded.find(_.check == "inverted index").get.remedy
      .contains("updateTx"))

    // apply every named remedy: the report returns to healthy
    TableStats.analyzeTx(spark, root)
    GlobalDict.buildTx(spark, root, "segment")
    InvertedIndex.updateTx(spark, root, "id", "text")
    SidecarGc.vacuum(spark, root)
    val fixed = Doctor.examine(spark, root)
    assert(fixed.healthy, s"expected healthy after remedies:\n${fixed.render}")
    assert(fixed.version == healthy.version + 1)

    // deep delta chains surface with the compaction remedy
    (0 until 10).foreach { i =>
      PkTableSink.mergeTx(spark, root,
        Seq((600L + i, 1L, "seg-0", "row", false))
          .toDF("id", "ver", "segment", "text", "del"),
        Seq("id"), Seq("ver"), "del", writer = "w",
        compactAfterDeltas = 1000)
    }
    val deep = Doctor.examine(spark, root)
    val dc = deep.findings.find(_.check == "delta chain").get
    assert(!dc.ok && dc.remedy.contains("compactTx"), deep.render)
    // render is one line per finding plus the header
    assert(deep.render.linesIterator.size == deep.findings.size + 1)
  }

  test("repair() closes the loop: degrade -> repair -> healthy, idempotent, " +
    "table contents undisturbed") {
    val root = TestTmp.dir("docr").toString + "/t"
    PkTableSink.mergeTx(spark, root,
      (0L until 300L).map(i => (i, 1L, s"seg-${i % 5}", s"alpha beta doc $i", false))
        .toDF("id", "ver", "segment", "text", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    TableStats.analyzeTx(spark, root)
    GlobalDict.buildTx(spark, root, "segment")
    InvertedIndex.buildTx(spark, root, "id", "text")
    assert(Doctor.examine(spark, root).healthy)
    // degrade EVERYTHING at once: ten deltas (deep chain), new dict
    // value, new indexed text, all sidecars staled
    (0 until 10).foreach { i =>
      PkTableSink.mergeTx(spark, root,
        Seq((1000L + i, 1L, if (i == 0) "seg-NEW" else "seg-0",
          s"gamma delta doc ${1000 + i}", false))
          .toDF("id", "ver", "segment", "text", "del"),
        Seq("id"), Seq("ver"), "del", writer = "w",
        compactAfterDeltas = 1000)
    }
    val degraded = Doctor.examine(spark, root)
    assert(!degraded.healthy)
    assert(degraded.degraded.exists(_.check == "delta chain"), degraded.render)
    val preRows = PkTableSink.readTx(spark, root, spark.emptyDataFrame)
      .collect().map(_.getLong(0)).toSet

    val after = Doctor.repair(spark, root, writer = "doctor",
      invertedIndexCols = Some(("id", "text")))
    assert(after.healthy, s"repair left findings:\n${after.render}")
    // contents untouched, every auxiliary serves again
    val postRows = PkTableSink.readTx(spark, root, spark.emptyDataFrame)
      .collect().map(_.getLong(0)).toSet
    assert(postRows == preRows)
    assert(TableStats.statsTx(spark, root).exists(_.rows == 310L))
    val dict = GlobalDict.dictTx(spark, root, "segment")
    assert(dict.isDefined && dict.get.count() == 6) // seg-0..4 + seg-NEW
    assert(InvertedIndex.isCurrent(spark, root))

    // idempotent: a second repair on the healthy table commits nothing
    val v = after.version
    val again = Doctor.repair(spark, root, writer = "doctor",
      invertedIndexCols = Some(("id", "text")))
    assert(again.healthy && again.version == v,
      s"re-repair moved the table: v$v -> v${again.version}")
  }

  test("index roots: chain/tombstone/drift findings name compact/retrain/rebuild; " +
    "repairIndex closes each loop") {
    import graft.ops.{GraphIndex, IvfIndex, LshIndex}
    val emb = Tables.embeddings(spark, sfDir)

    // GRAPH index — degrade all three axes: more nodes inserted
    // incrementally than the build had (quality drift), nine add
    // commits (deep chain), and a delete of a third of the corpus
    // (tombstone mass vs live)
    val gRoot = TestTmp.dir("docg").toString + "/g"
    GraphIndex.build(emb.where(col("vec_id") < 200),
      col("vec_id"), col("embedding"), gRoot)
    (0 until 9).foreach { i =>
      GraphIndex.add(
        emb.where(col("vec_id") >= 200 + i * 30 && col("vec_id") < 230 + i * 30),
        col("vec_id"), col("embedding"), gRoot)
    }
    GraphIndex.delete(spark, gRoot,
      emb.where(col("vec_id") < 120).select(col("vec_id")), col("vec_id"))
    val gBad = Doctor.examine(spark, gRoot)
    assert(gBad.degraded.map(_.check).toSet ==
      Set("delta chain", "tombstone mass", "graph drift"), gBad.render)
    assert(gBad.degraded.find(_.check == "graph drift").get.remedy
      .contains("rebuild"), gBad.render)
    assert(gBad.degraded.find(_.check == "tombstone mass").get.remedy
      .contains("compact"), gBad.render)
    val gFixed = Doctor.repairIndex(spark, gRoot)
    assert(gFixed.healthy, gFixed.render)
    assert(GraphIndex.count(spark, gRoot) == 350,
      "repair must not change the live node set")

    // IVF index — centroid staleness: more vectors assigned to the
    // trained centroids than the training set held; repair retrains
    // with the SAME k and resets the counter
    val iRoot = TestTmp.dir("doci").toString + "/i"
    IvfIndex.build(emb.where(col("vec_id") < 200),
      col("vec_id"), col("embedding"), iRoot, k = 4)
    IvfIndex.add(emb.where(col("vec_id") >= 200 && col("vec_id") < 450),
      col("vec_id"), col("embedding"), iRoot)
    val iBad = Doctor.examine(spark, iRoot)
    assert(iBad.degraded.map(_.check) == Seq("centroid staleness"), iBad.render)
    assert(iBad.degraded.head.remedy.contains("retrain"), iBad.render)
    val iFixed = Doctor.repairIndex(spark, iRoot)
    assert(iFixed.healthy, iFixed.render)
    assert(IvfIndex.count(spark, iRoot) == 450)
    val cDir = graft.sinks.TxLog.current(spark, iRoot).get.tables("centroids")
    assert(spark.read.parquet(cDir).count() == 4,
      "retrain must keep the trained k")

    // LSH index — probe-cost chain only (no deletes, no drift:
    // signatures are exact content functions); repair compacts
    val docs = Tables.documents(spark, sfDir)
    val lRoot = TestTmp.dir("docl").toString + "/l"
    LshIndex.build(docs.where(col("doc_id") % 10 === 0),
      col("doc_id"), col("text"), lRoot)
    (1 to 9).foreach { i =>
      LshIndex.add(docs.where(col("doc_id") % 10 === i),
        col("doc_id"), col("text"), lRoot)
    }
    val lBad = Doctor.examine(spark, lRoot)
    assert(lBad.degraded.map(_.check) == Seq("delta chain") &&
      lBad.degraded.head.remedy.contains("compact"), lBad.render)
    val lFixed = Doctor.repairIndex(spark, lRoot)
    assert(lFixed.healthy, lFixed.render)
    assert(LshIndex.count(spark, lRoot) == docs.count())
  }
}
