package graft

import graft.sinks.PkTableSink

/** D20: version-to-version change feed on the transactional PK lake. */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def batch(rows: (Long, Long, String, Boolean)*) =
    rows.toDF("id", "ver", "v", "del")

  private def freshRoot() =
    TestTmp.dir("cdf").toString + "/t"

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

  test("CDF form: updates fan out to preimage + postimage; others match the net feed") {
    val root = freshRoot()
    val v0 = merge(root, (1L, 1L, "a", false), (2L, 1L, "b", false),
      (3L, 1L, "c", false))
    val v2 = {
      merge(root, (2L, 2L, "b2", false), (5L, 1L, "e", false))
      merge(root, (3L, 2L, "", true))
    }
    val cdf = PkTableSink.readTxChangesCdf(spark, root, v0, v2)
      .select("id", "ver", "v", "_change_type")
      .as[(Long, Long, String, String)].collect().toSet
    assert(cdf === Set(
      (2L, 1L, "b", "update_preimage"),   // the OLD image — what the
      (2L, 2L, "b2", "update_postimage"), // net feed cannot express
      (5L, 1L, "e", "insert"),
      (3L, 1L, "c", "delete")))
    // the two forms agree after collapsing the update pair
    val net = changes(root, v0, v2)
    val collapsed = cdf.collect {
      case (id, ver, v, "update_postimage") => (id, ver, v, "update")
      case t @ (_, _, _, ct) if ct != "update_preimage" => t
    }
    assert(collapsed === net)
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

  test("the change feed drives incremental MV maintenance ≡ recompute") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    import graft.cdc.MaterializedAgg
    // lake rows (id, ver, g, v): the MV tracks per-g count + sum(v);
    // maintenance reads ONLY readTxChanges between versions — the lake
    // is the changelog source, no separate CDC stream
    def rows(rs: (Long, Long, String, Double, Boolean)*) =
      rs.toDF("id", "ver", "g", "v", "del")
    val root = freshRoot()
    var state = MaterializedAgg.emptyState(rows(), col("del"))
    var mv: Option[DataFrame] = None
    var lastV = -1L
    def apply(upToV: Long): Unit = {
      val batch =
        if (lastV < 0) PkTableSink.readTx(spark, root, rows().drop("del"))
          .withColumn("del", lit(false))
        else PkTableSink.readTxChanges(spark, root, lastV, upToV)
          .withColumn("del", col("_change_type") === "delete")
          .drop("_change_type")
      val s = MaterializedAgg.step(state, batch, Seq("id"), Seq(col("ver")), col("del"))
      state = s.state.localCheckpoint(true)
      mv = Some(MaterializedAgg.mergeMv(mv,
        MaterializedAgg.groupDelta(s.signedDelta, Seq("g"), Seq("total" -> col("v"))),
        Seq("g"), Seq("total")).localCheckpoint(true))
      lastV = upToV
    }
    def mvNow() = mv.get.select("g", "n", "total")
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    def recompute() = PkTableSink.readTx(spark, root, rows().drop("del"))
      .groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("total"))
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val v0 = PkTableSink.mergeTx(spark, root,
      rows((1L, 1L, "a", 10.0, false), (2L, 1L, "a", 5.0, false),
        (3L, 1L, "b", 7.0, false)),
      Seq("id"), Seq("ver"), "del", writer = "w")
    apply(v0); assert(mvNow() === recompute())
    // update moves a key between groups; insert lands in a new group
    val v1 = PkTableSink.mergeTx(spark, root,
      rows((1L, 2L, "b", 20.0, false), (4L, 1L, "c", 1.0, false)),
      Seq("id"), Seq("ver"), "del", writer = "w")
    apply(v1); assert(mvNow() === recompute())
    // delete retracts; group c vanishes entirely
    val v2 = PkTableSink.mergeTx(spark, root,
      rows((4L, 2L, "c", 0.0, true), (2L, 2L, "a", 6.0, false)),
      Seq("id"), Seq("ver"), "del", writer = "w")
    apply(v2)
    val end = mvNow()
    assert(end === recompute())
    assert(!end.contains("c") && end("a") === ((1L, 6.0)))
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
