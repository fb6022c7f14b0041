package graft

import org.apache.spark.sql.functions._
import graft.sinks.{PkTableSink, TableStats}

/** D22: ANALYZE for TxLog lake tables — version-stamped stats sidecar
  * + the measured-stats broadcast hint size estimates cannot give a
  * merge-on-read table. */
class TableStatsSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() =
    TestTmp.dir("stats").toString + "/t"

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

  test("refreshTx ≡ analyzeTx: insert-only deltas match field-for-field") {
    val root = freshRoot()
    PkTableSink.mergeTx(spark, root,
      (0L until 1000L).map(i => (i, 1L, if (i % 10 == 0) null else s"v${i % 7}", false))
        .toDF("id", "ver", "cat", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    TableStats.analyzeTx(spark, root)
    // insert-only delta: new keys, one new cat value, some nulls
    PkTableSink.mergeTx(spark, root,
      (1000L until 1200L).map(i => (i, 1L, if (i % 5 == 0) null else "v-new", false))
        .toDF("id", "ver", "cat", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    val refreshed = TableStats.refreshTx(spark, root)
    val rebuilt = TableStats.analyzeTx(spark, root)
    assert(refreshed.version == rebuilt.version)
    assert(refreshed.rows == rebuilt.rows && refreshed.rows == 1200L)
    assert(refreshed.bytes == rebuilt.bytes)
    // HLL union is register-max, so union(sketch(A), sketch(B)) and
    // sketch(A ∪ B) ESTIMATE identically for insert-only deltas (the
    // serialized blob may differ in sparse-mode internals — the
    // numbers may not)
    refreshed.cols.keySet.foreach { c =>
      val (a, b) = (refreshed.cols(c), rebuilt.cols(c))
      assert(a.nulls == b.nulls && a.min == b.min && a.max == b.max &&
        a.ndv == b.ndv, s"col $c: refreshed $a vs rebuilt $b")
    }
    // and it is served as the current generation
    assert(TableStats.statsTx(spark, root).contains(rebuilt))
  }

  test("refreshTx stays exact through updates + deletes of the extrema") {
    val root = freshRoot()
    PkTableSink.mergeTx(spark, root,
      (0L until 500L).map(i => (i, 1L, s"v${i % 7}", i * 2.5, false))
        .toDF("id", "ver", "cat", "x", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    TableStats.analyzeTx(spark, root)
    // a delta that: deletes the max-id row (max id + max x both shrink
    // → forces the targeted re-scan path), updates values (some to
    // null, some from one cat to another), inserts a new min-x row
    PkTableSink.mergeTx(spark, root,
      (Seq((499L, 2L, "", 0.0, true),            // delete the extremum
        (10L, 2L, null.asInstanceOf[String], 25.0, false), // value -> null
        (11L, 2L, "v0", -1.5, false),            // new GLOBAL x min via update
        (700L, 1L, "v1", 3.25, false)))          // plain insert
        .toDF("id", "ver", "cat", "x", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    val refreshed = TableStats.refreshTx(spark, root)
    val rebuilt = TableStats.analyzeTx(spark, root)
    assert(refreshed.rows == rebuilt.rows && refreshed.rows == 500L)
    refreshed.cols.keySet.foreach { c =>
      val (a, b) = (refreshed.cols(c), rebuilt.cols(c))
      assert(a.nulls == b.nulls, s"col $c nulls: $a vs $b")
      assert(a.min == b.min && a.max == b.max, s"col $c bounds: $a vs $b")
      // NDV after deletes: the union sketch is an upper bound — never
      // below the rebuilt truth, never above old-NDV + added-NDV
      assert(a.ndv >= b.ndv, s"col $c ndv: refreshed ${a.ndv} < rebuilt ${b.ndv}")
      assert(a.ndv <= b.ndv + 5, s"col $c ndv slack: $a vs $b")
    }
    // id max shrank from 499 to 700? no — 700 inserted; x max shrank:
    // 499's x (1247.5) deleted, next is 498*2.5
    assert(rebuilt.cols("x").max.toDouble == 1245.0)
    assert(rebuilt.cols("x").min.toDouble == -1.5)
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
