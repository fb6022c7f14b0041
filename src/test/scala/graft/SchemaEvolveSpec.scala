package graft

import org.apache.spark.sql.functions._
import graft.sinks.{PkTableSink, TxLog}

/** D30: lake-table schema evolution — a widening commit adds columns
  * (older rows read null, the ADD COLUMN default), narrowing commits
  * are refused loudly, and the widened schema survives compaction and
  * the change feed. */
class SchemaEvolveSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() =
    TestTmp.dir("evolve").toString + "/t"

  test("widening commit: new column null on old rows, merged on touched keys") {
    val root = freshRoot()
    PkTableSink.mergeTx(spark, root,
      Seq((1L, 1L, "a", false), (2L, 1L, "b", false)).toDF("id", "ver", "v", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    // the upstream source grew a column (Debezium schema drift):
    // commit carries (id, ver, v, region, del)
    PkTableSink.mergeTx(spark, root,
      Seq((2L, 2L, "b2", "emea", false), (3L, 1L, "c", "apac", false))
        .toDF("id", "ver", "v", "region", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    val out = PkTableSink.readTx(spark, root, spark.emptyDataFrame)
      .select(col("id"), col("v"), col("region"))
      .as[(Long, String, Option[String])].collect().toSet
    assert(out == Set((1L, "a", None), (2L, "b2", Some("emea")), (3L, "c", Some("apac"))),
      s"widened read wrong: $out")
    // manifest records the widened column set in order
    val cols = TxLog.current(spark, root).get.meta("cols")
    assert(cols == "id,ver,v,region", s"manifest cols: $cols")
  }

  test("narrowing commit is refused; the schema check names the missing column") {
    val root = freshRoot()
    PkTableSink.mergeTx(spark, root,
      Seq((1L, 1L, "a", "x", false)).toDF("id", "ver", "v", "extra", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    val e = intercept[IllegalArgumentException] {
      PkTableSink.mergeTx(spark, root,
        Seq((1L, 2L, "a2", false)).toDF("id", "ver", "v", "del"),
        Seq("id"), Seq("ver"), "del", writer = "w")
    }
    assert(e.getMessage.contains("extra") && e.getMessage.contains("never narrow"),
      s"unhelpful refusal: ${e.getMessage}")
  }

  test("widened schema survives compaction and flows through the change feed") {
    val root = freshRoot()
    PkTableSink.mergeTx(spark, root,
      (0L until 50L).map(i => (i, 1L, s"v$i", false)).toDF("id", "ver", "v", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    val v1 = TxLog.current(spark, root).get.version
    PkTableSink.mergeTx(spark, root,
      Seq((7L, 2L, "v7b", 99L, false)).toDF("id", "ver", "v", "score", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    // change feed across the widening boundary: the touched key shows
    // as an update carrying the new column
    val feed = PkTableSink.readTxChanges(spark, root, v1,
        TxLog.current(spark, root).get.version)
      .select(col("id"), col("_change_type"), col("score"))
      .as[(Long, String, Option[Long])].collect().toSet
    assert(feed == Set((7L, "update", Some(99L))), s"feed: $feed")
    PkTableSink.compactTx(spark, root, writer = "w")
    val post = PkTableSink.readTx(spark, root, spark.emptyDataFrame)
    assert(post.columns.contains("score"))
    assert(post.where(col("score").isNotNull).count() == 1)
    assert(post.count() == 50)
    // and a further commit against the compacted table still needs ALL
    // widened columns
    val e = intercept[IllegalArgumentException] {
      PkTableSink.mergeTx(spark, root,
        Seq((8L, 2L, "v8b", false)).toDF("id", "ver", "v", "del"),
        Seq("id"), Seq("ver"), "del", writer = "w")
    }
    assert(e.getMessage.contains("score"))
  }
}
