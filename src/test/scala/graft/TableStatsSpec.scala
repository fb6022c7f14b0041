package graft

import org.apache.spark.sql.functions._
import graft.sinks.{PkTableSink, TableStats}

/** D22: ANALYZE for TxLog lake tables — version-stamped stats sidecar
  * + the measured-stats broadcast hint size estimates cannot give a
  * merge-on-read table. */
class TableStatsSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("stats").toString + "/t"

  test("analyzeTx records exact rows/nulls/min/max and ~exact NDV; stale stats withdrawn") {
    val root = freshRoot()
    val rows = (0L until 2000L)
      .map(i => (i, 1L, if (i % 10 == 0) null else s"v${i % 7}", false))
      .toDF("id", "ver", "cat", "del")
    PkTableSink.mergeTx(spark, root, rows, Seq("id"), Seq("ver"), "del", writer = "w")
    val st = TableStats.analyzeTx(spark, root)
    assert(st.rows == 2000 && st.bytes > 0)
    val id = st.cols("id")
    assert(id.nulls == 0 && id.min == "0" && id.max == "1999")
    assert(math.abs(id.ndv - 2000) <= 200, s"id ndv ${id.ndv}")
    val cat = st.cols("cat")
    assert(cat.nulls == 200, s"cat nulls ${cat.nulls}")
    assert(cat.ndv >= 6 && cat.ndv <= 8, s"cat ndv ${cat.ndv}")
    // round-trips through the sidecar
    assert(TableStats.statsTx(spark, root).contains(st))
    // a new commit STALES the sidecar: stats are withdrawn (never
    // served against the wrong version) until re-analyzed
    PkTableSink.mergeTx(spark, root,
      Seq((5L, 2L, "x", false)).toDF("id", "ver", "cat", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    assert(TableStats.statsTx(spark, root).isEmpty)
    val st2 = TableStats.analyzeTx(spark, root)
    assert(st2.rows == 2000 && TableStats.statsTx(spark, root).contains(st2))
  }

  test("measured stats drive the broadcast hint where size estimates cannot") {
    val root = freshRoot()
    val dim = (0L until 500L).map(i => (i, 1L, s"seg${i % 5}", false))
      .toDF("id", "ver", "seg", "del")
    PkTableSink.mergeTx(spark, root, dim, Seq("id"), Seq("ver"), "del", writer = "w")
    val fact = spark.range(100000)
      .select((col("id") % 500).as("id"), col("id").as("x"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // the defensive production setting: size-ESTIMATE broadcasting
      // off (estimates lie above a merge-on-read aggregate); only a
      // measured-stats hint may broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def planOf(d: org.apache.spark.sql.DataFrame) =
        fact.join(d, "id").queryExecution.executedPlan.toString
      val cold = planOf(PkTableSink.readTx(spark, root, dim.drop("del")))
      assert(!cold.contains("BroadcastHashJoin"),
        s"un-analyzed read must not broadcast:\n${cold.take(400)}")
      TableStats.analyzeTx(spark, root)
      val hinted = planOf(TableStats.readTxAnalyzed(spark, root, dim.drop("del")))
      assert(hinted.contains("BroadcastHashJoin"),
        s"analyzed small table should broadcast:\n${hinted.take(400)}")
      // results identical either way
      val a = fact.join(TableStats.readTxAnalyzed(spark, root, dim.drop("del")), "id").count()
      val b = fact.join(PkTableSink.readTx(spark, root, dim.drop("del")), "id").count()
      assert(a == b && a == 100000L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
