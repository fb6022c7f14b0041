package graft

import org.apache.spark.sql.functions._
import graft.sinks.{GlobalDict, PkTableSink}

/** D28: global low-cardinality dictionary — version-stamped value→code
  * map; group-by runs on int codes, strings decode after the
  * aggregate; stale dicts are withdrawn, never mis-encode. */
class GlobalDictSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("gdict").toString + "/t"

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
}
