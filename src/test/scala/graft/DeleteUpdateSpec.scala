package graft

import org.apache.spark.sql.functions._
import graft.sinks.{PkTableSink, TxLog}

/** D34: the StarRocks PK-table DELETE/UPDATE verbs as one-delta-commit
  * conveniences: matched rows re-commit version-bumped (tombstoned /
  * SET-applied), write cost ∝ matches, key/version assignment refused,
  * change feed and later upserts compose. */
class DeleteUpdateSpec extends SparkSpec {
  import spark.implicits._

  private def seed(): String = {
    val root = TestTmp.dir("dml").toString + "/t"
    PkTableSink.mergeTx(spark, root,
      (0L until 100L).map(i => (i, 1L, s"seg-${i % 5}", i * 10, false))
        .toDF("id", "ver", "segment", "amount", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    root
  }

  test("deleteWhereTx: matched rows tombstone in one delta; count returned; misses no-op") {
    val root = seed()
    val v0 = TxLog.current(spark, root).get.version
    val n = PkTableSink.deleteWhereTx(spark, root,
      col("segment") === "seg-3", writer = "dml")
    assert(n == 20)
    val live = PkTableSink.readTx(spark, root, spark.emptyDataFrame)
    assert(live.count() == 80 &&
      live.where(col("segment") === "seg-3").count() == 0)
    // exactly one commit happened
    assert(TxLog.current(spark, root).get.version == v0 + 1)
    // no matches -> no commit at all
    assert(PkTableSink.deleteWhereTx(spark, root,
      col("segment") === "nope", writer = "dml") == 0)
    assert(TxLog.current(spark, root).get.version == v0 + 1)
    // the change feed reports the deletes
    val feed = PkTableSink.readTxChanges(spark, root, v0, v0 + 1)
    assert(feed.where(col("_change_type") === "delete").count() == 20)
    // a later higher-version upsert resurrects a deleted key (DELETE
    // is a CDC participant, not a fence)
    PkTableSink.mergeTx(spark, root,
      Seq((3L, 9L, "seg-3", 999L, false)).toDF("id", "ver", "segment", "amount", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    assert(PkTableSink.readTx(spark, root, spark.emptyDataFrame)
      .where(col("id") === 3L).count() == 1)
  }

  test("updateWhereTx: SET applies to matched rows only; key/version/unknown columns refused") {
    val root = seed()
    val n = PkTableSink.updateWhereTx(spark, root,
      col("amount") >= 900L,
      Map("segment" -> lit("hot"), "amount" -> (col("amount") + 1L)),
      writer = "dml")
    assert(n == 10)
    val live = PkTableSink.readTx(spark, root, spark.emptyDataFrame)
    assert(live.where(col("segment") === "hot").count() == 10)
    assert(live.where(col("id") === 99L).select(col("amount")).as[Long].head() == 991L)
    // untouched rows keep their values AND their version (no write)
    assert(live.where(col("id") === 0L)
      .select(col("segment"), col("ver")).as[(String, Long)].head() == ("seg-0", 1L))
    // updated rows carry the bumped version, so replaying the ORIGINAL
    // row at its old version loses
    PkTableSink.mergeTx(spark, root,
      Seq((99L, 1L, "seg-4", 990L, false)).toDF("id", "ver", "segment", "amount", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    assert(PkTableSink.readTx(spark, root, spark.emptyDataFrame)
      .where(col("id") === 99L).select(col("segment")).as[String].head() == "hot")
    // refusals are loud and specific
    val k = intercept[IllegalArgumentException](PkTableSink.updateWhereTx(spark, root,
      lit(true), Map("id" -> lit(7L)), writer = "dml"))
    assert(k.getMessage.contains("key/version"))
    val u = intercept[IllegalArgumentException](PkTableSink.updateWhereTx(spark, root,
      lit(true), Map("nope" -> lit(1)), writer = "dml"))
    assert(u.getMessage.contains("unknown column"))
    val e = intercept[IllegalArgumentException](PkTableSink.updateWhereTx(spark, root,
      lit(true), Map.empty, writer = "dml"))
    assert(e.getMessage.contains("empty SET"))
  }
}
