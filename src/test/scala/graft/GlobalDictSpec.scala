package graft

import org.apache.spark.sql.functions._
import graft.sinks.{GlobalDict, PkTableSink}

/** D28: global low-cardinality dictionary — version-stamped value→code
  * map; group-by runs on int codes, strings decode after the
  * aggregate; stale dicts are withdrawn, never mis-encode. */
class GlobalDictSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() =
    TestTmp.dir("gdict").toString + "/t"

  private val rows = (0L until 1000L)
    .map(i => (i, 1L, if (i % 11 == 0) null else s"seg-${i % 7}", i % 100, false))
    .toDF("id", "ver", "segment", "x", "del")

  test("encoded group-by + late decode equals the raw string group-by") {
    val root = freshRoot()
    PkTableSink.mergeTx(spark, root, rows, Seq("id"), Seq("ver"), "del", writer = "w")
    GlobalDict.buildTx(spark, root, "segment")
    val (enc, dictOpt) = GlobalDict.readTxEncoded(spark, root, rows.drop("del"), "segment")
    assert(dictOpt.isDefined)
    // codes are dense 0..NDV-1 in sorted value order
    val dict = dictOpt.get.orderBy(col("code")).as[(String, Int)].collect()
    assert(dict.map(_._2).toSeq == (0 until 7) && dict.map(_._1).toSeq.sorted == dict.map(_._1).toSeq)
    val got = GlobalDict.decode(
        enc.groupBy(col("segment__code")).agg(count(lit(1)).as("n"), sum(col("x")).as("sx")),
        dictOpt.get, "segment__code", "segment")
      .select(col("segment"), col("n"), col("sx"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
    val want = PkTableSink.readTx(spark, root, rows.drop("del"))
      .groupBy(col("segment")).agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"encoded-path result differs:\n$got\nvs\n$want")
    // nulls never enter the dict; they group as code null
    assert(want.exists(_._1.isEmpty))
  }

  test("the aggregate runs on int codes and the decode join broadcasts") {
    val root = freshRoot()
    PkTableSink.mergeTx(spark, root, rows, Seq("id"), Seq("ver"), "del", writer = "w")
    GlobalDict.buildTx(spark, root, "segment")
    val (enc, Some(dict)) = GlobalDict.readTxEncoded(spark, root, rows.drop("del"), "segment"): @unchecked
    val agg = GlobalDict.decode(
      enc.groupBy(col("segment__code")).agg(sum(col("x")).as("sx")),
      dict, "segment__code", "segment")
    assert(agg.schema("segment__code").dataType.typeName == "integer")
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"decode join not broadcast:\n${plan.take(500)}")
  }

  test("range filter translates to the code domain; scan pushes the snapped value bounds") {
    val root = freshRoot()
    PkTableSink.mergeTx(spark, root, rows, Seq("id"), Seq("ver"), "del", writer = "w")
    GlobalDict.buildTx(spark, root, "segment")
    // caller bounds deliberately OFF the dictionary values: 'seg-1x'
    // and 'seg-4x' snap inward to actual values seg-2 and seg-4
    val (enc, dictOpt) = GlobalDict.readTxEncodedRange(spark, root,
      rows.drop("del"), "segment", lower = "seg-1x", upper = "seg-4x")
    assert(dictOpt.isDefined)
    val plan = enc.queryExecution.executedPlan.toString
    // the scan's PushedFilters carry the SNAPPED string bounds (the
    // value-domain image of the code interval — data files store
    // strings, so this is what file-level pruning can use)...
    // (the plan-string PushedFilters list is display-truncated, so
    // assert on the scan's DataFilters lines instead)
    assert(plan.contains(">= seg-2)") && plan.contains("<= seg-4)"),
      s"snapped bounds missing from the scan filters:\n${plan.take(1500)}")
    // ...and the code interval reaches the dict scan as an int range
    // (Catalyst also converts the left join to inner under it)
    assert(plan.contains(">= 2)") && plan.contains("<= 4)"),
      s"code interval missing:\n${plan.take(1500)}")
    assert(plan.contains("segment__code"), "code-domain column missing")
    // row parity with the raw read + raw range filter
    val want = PkTableSink.readTx(spark, root, rows.drop("del"))
      .where(col("segment") >= "seg-1x" && col("segment") <= "seg-4x")
      .select(col("id")).as[Long].collect().toSet
    val got = enc.select(col("id")).as[Long].collect().toSet
    assert(got == want && got.nonEmpty, s"rows differ: ${got.size} vs ${want.size}")
    // empty intersection: bounds between two adjacent dict values
    val (empty, _) = GlobalDict.readTxEncodedRange(spark, root,
      rows.drop("del"), "segment", lower = "seg-2a", upper = "seg-2z")
    assert(empty.count() == 0)
    // stale dict: fallback still filters correctly on the raw column
    PkTableSink.mergeTx(spark, root,
      Seq((5001L, 1L, "seg-3", 3L, false)).toDF("id", "ver", "segment", "x", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    val (fb, fbDict) = GlobalDict.readTxEncodedRange(spark, root,
      rows.drop("del"), "segment", lower = "seg-1x", upper = "seg-4x")
    assert(fbDict.isEmpty)
    assert(fb.select(col("id")).as[Long].collect().toSet == want + 5001L)
  }

  test("a commit with unseen values withdraws the dict; rebuild restores codes") {
    val root = freshRoot()
    PkTableSink.mergeTx(spark, root, rows, Seq("id"), Seq("ver"), "del", writer = "w")
    GlobalDict.buildTx(spark, root, "segment")
    PkTableSink.mergeTx(spark, root,
      Seq((5000L, 1L, "seg-NEW", 3L, false)).toDF("id", "ver", "segment", "x", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    val (plain, dictOpt) = GlobalDict.readTxEncoded(spark, root, rows.drop("del"), "segment")
    assert(dictOpt.isEmpty, "stale dict must be withdrawn")
    assert(plain.columns.contains("segment"), "fallback serves the raw column")
    assert(plain.where(col("segment") === "seg-NEW").count() == 1)
    GlobalDict.buildTx(spark, root, "segment")
    val (enc2, Some(dict2)) = GlobalDict.readTxEncoded(spark, root, rows.drop("del"), "segment"): @unchecked
    // the new value is now encodable — no null code for it
    val codeOfNew = GlobalDict.decode(
        enc2.where(col("id") === 5000L).select(col("segment__code")),
        dict2, "segment__code", "segment")
      .select(col("segment")).as[String].head()
    assert(codeOfNew == "seg-NEW")
    assert(dict2.count() == 8)
  }

  test("refreshTx: append-only code extension from the change feed; " +
    "range path stays exact on the unsorted dict") {
    val root = freshRoot()
    PkTableSink.mergeTx(spark, root, rows, Seq("id"), Seq("ver"), "del", writer = "w")
    GlobalDict.buildTx(spark, root, "segment")
    val before = GlobalDict.dictTx(spark, root, "segment").get
      .as[(String, Int)].collect().toMap
    // delta: two NEW values (one sorting BEFORE every old value — the
    // case that breaks global code order), one deleted key, one update
    PkTableSink.mergeTx(spark, root,
      Seq((5000L, 1L, "aaa-first", 3L, false),
        (5001L, 1L, "seg-ZZZ", 4L, false),
        (3L, 2L, "", 0L, true),
        (7L, 2L, "seg-1", 7L, false))
        .toDF("id", "ver", "segment", "x", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    val stamped = GlobalDict.refreshTx(spark, root, "segment")
    assert(stamped.isDefined)
    val after = GlobalDict.dictTx(spark, root, "segment").get
      .as[(String, Int)].collect().toMap
    // old codes UNCHANGED (append-only), new values appended past max
    before.foreach { case (v, c) => assert(after(v) == c, s"code of $v moved") }
    val oldMax = before.values.max
    assert(after("aaa-first") > oldMax && after("seg-ZZZ") > oldMax)
    assert(after.size == before.size + 2)
    // encoded group-by on the refreshed dict equals the raw group-by
    val (enc, Some(dict)) = GlobalDict.readTxEncoded(
      spark, root, rows.drop("del"), "segment"): @unchecked
    val got = GlobalDict.decode(
        enc.groupBy(col("segment__code")).agg(count(lit(1)).as("n")),
        dict, "segment__code", "segment")
      .select(col("segment"), col("n"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toSet
    val want = PkTableSink.readTx(spark, root, rows.drop("del"))
      .groupBy(col("segment")).agg(count(lit(1)).as("n"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toSet
    assert(got == want)
    // the range path: a range covering "aaa-first" plus low seg-* —
    // the matched codes are NOT an interval (appended code sits past
    // max), the density check must fall back and stay exact
    val (ranged, _) = GlobalDict.readTxEncodedRange(
      spark, root, rows.drop("del"), "segment", "a", "seg-1")
    val rawCount = PkTableSink.readTx(spark, root, rows.drop("del"))
      .where(col("segment") >= "a" && col("segment") <= "seg-1").count()
    assert(ranged.count() == rawCount && rawCount > 0)
    // no-new-values delta: refresh re-stamps bit-identically (sorted
    // order preserved), and the interval shortcut works again
    PkTableSink.mergeTx(spark, root,
      Seq((8L, 3L, "seg-2", 9L, false)).toDF("id", "ver", "segment", "x", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    assert(GlobalDict.dictTx(spark, root, "segment").isEmpty)
    GlobalDict.refreshTx(spark, root, "segment")
    val restamped = GlobalDict.dictTx(spark, root, "segment").get
      .as[(String, Int)].collect().toMap
    assert(restamped == after)
  }

  test("refreshTx refuses a cardinality-contract-breaking delta (dict withdraws)") {
    val root = freshRoot()
    PkTableSink.mergeTx(spark, root, rows, Seq("id"), Seq("ver"), "del", writer = "w")
    GlobalDict.buildTx(spark, root, "segment")
    PkTableSink.mergeTx(spark, root,
      (0L until 50L).map(i => (9000L + i, 1L, s"uniq-$i", i, false))
        .toDF("id", "ver", "segment", "x", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    // cap below old+new: the refresh must refuse, not ship a fat dict
    assert(GlobalDict.refreshTx(spark, root, "segment",
      maxCardinality = 20L).isEmpty)
    assert(GlobalDict.dictTx(spark, root, "segment").isEmpty,
      "an overflowing dict stays withdrawn")
    // with room it appends fine
    assert(GlobalDict.refreshTx(spark, root, "segment").isDefined)
    assert(GlobalDict.dictTx(spark, root, "segment").get.count() == 7 + 50)
  }
}
