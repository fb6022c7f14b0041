package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.cdc.MaterializedTopK

/** Incremental top-k-per-group MV (A40): inserts merge against the
  * stored members, only member retractions rescan, and the maintained
  * view always equals a full recompute's row_number ≤ k. */
class MaterializedTopKSpec extends SparkSpec {
  import spark.implicits._

  // changelog rows: (key, version, group, value, deleted)
  private def chg(rows: (Long, Long, String, Double, Boolean)*): DataFrame =
    rows.toDF("k", "ver", "g", "v", "del")

  private def mvOf(batches: Seq[DataFrame], k: Int = 3): Seq[(String, Long, Long, Double)] =
    MaterializedTopK.maintain(batches, keyCols = Seq("k"),
        version = Seq(col("ver")), deleteFlag = col("del"),
        groupCols = Seq("g"), value = col("v"), k = k)
      .select(col("g"), col("rank"), col("k"), col("value"))
      .as[(String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq

  private def recompute(all: DataFrame, k: Int = 3): Seq[(String, Long, Long, Double)] = {
    val live = graft.cdc.PkTable.compact(all, Seq("k"), Seq(col("ver")), col("del"))
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("k").asc)
    live.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("g"), col("rank"), col("k"), col("v"))
      .as[(String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
  }

  test("retracting a stored member promotes the hidden below-k row") {
    val b1 = chg((1L, 1L, "a", 9.0, false), (2L, 1L, "a", 7.0, false),
      (3L, 1L, "a", 5.0, false), (4L, 1L, "a", 3.0, false))
    // k=3 stores {9,7,5}; key 4 (3.0) is live but NOT stored. Deleting
    // the rank-2 member must surface it — only the key-state knows it.
    val b2 = chg((2L, 2L, "a", 0.0, true))
    val got = mvOf(Seq(b1, b2))
    assert(got == Seq(("a", 1L, 1L, 9.0), ("a", 2L, 3L, 5.0), ("a", 3L, 4L, 3.0)))
    assert(got == recompute(b1.unionByName(b2)))
  }

  test("inserts merge: beating the kth enters, below-k does not; underfilled groups fill") {
    val b1 = chg((1L, 1L, "a", 9.0, false), (2L, 1L, "a", 7.0, false),
      (3L, 1L, "a", 5.0, false), (10L, 1L, "b", 1.0, false))
    val b2 = chg((4L, 1L, "a", 8.0, false),  // beats the kth (5.0)
      (5L, 1L, "a", 2.0, false),             // below k — must not enter
      (11L, 1L, "b", 4.0, false))            // fills the underfilled group
    val got = mvOf(Seq(b1, b2))
    assert(got == Seq(
      ("a", 1L, 1L, 9.0), ("a", 2L, 4L, 8.0), ("a", 3L, 2L, 7.0),
      ("b", 1L, 11L, 4.0), ("b", 2L, 10L, 1.0)))
    assert(got == recompute(b1.unionByName(b2)))
  }

  test("member update, non-member update, and group migration in one batch") {
    val b1 = chg((1L, 1L, "a", 9.0, false), (2L, 1L, "a", 7.0, false),
      (3L, 1L, "a", 5.0, false), (4L, 1L, "a", 4.0, false),
      (10L, 1L, "b", 6.0, false))
    val b2 = chg((1L, 2L, "a", 1.0, false),  // member value drops below k
      (4L, 2L, "a", 8.0, false),             // non-member rises into the top
      (3L, 2L, "b", 5.0, false))             // member migrates a → b
    val got = mvOf(Seq(b1, b2))
    val want = recompute(b1.unionByName(b2))
    assert(got == want)
    // a now holds 8.0(k4), 7.0(k2), 1.0(k1); b holds 6.0(k10), 5.0(k3)
    assert(got.filter(_._1 == "a").map(_._4) == Seq(8.0, 7.0, 1.0))
    assert(got.filter(_._1 == "b").map(_._4) == Seq(6.0, 5.0))
  }

  test("a group whose members all delete vanishes; ties break by key") {
    val b1 = chg((1L, 1L, "solo", 3.0, false), (2L, 1L, "t", 5.0, false),
      (3L, 1L, "t", 5.0, false))
    val b2 = chg((1L, 2L, "solo", 0.0, true))
    val got = mvOf(Seq(b1, b2))
    assert(got == Seq(("t", 1L, 2L, 5.0), ("t", 2L, 3L, 5.0)))
  }

  test("transactional maintenance: exactly-once replay, demotion tombstones, re-entry after rescan") {
    val root = TestTmp.dir("tktx").toString + "/g"
    def apply(b: DataFrame, id: Long) = MaterializedTopK.maintainTx(root, b, id,
      Seq("k"), Seq("ver"), col("del"), Seq("g"), col("v"), k = 2, writer = "job1")
    def mv(): Seq[(String, Long, Long, Double)] =
      MaterializedTopK.readTx(spark, root, Seq("g"), Seq("k"))
        .select(col("g"), col("rank"), col("k"), col("value"))
        .as[(String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq

    assert(apply(chg((1L, 1L, "a", 9.0, false), (2L, 1L, "a", 7.0, false),
      (3L, 1L, "a", 5.0, false)), 1L))
    assert(mv() == Seq(("a", 1L, 1L, 9.0), ("a", 2L, 2L, 7.0)))

    // an insert beating the kth DEMOTES k=2 — it must tombstone out of
    // the stored view, not linger as a stale third row
    assert(apply(chg((4L, 1L, "a", 8.0, false)), 2L))
    assert(mv() == Seq(("a", 1L, 1L, 9.0), ("a", 2L, 4L, 8.0)))

    // replay of a committed batch: zero Spark jobs, view unchanged
    spark.sparkContext.setJobGroup("topk-stale-replay", "stale replay must run no jobs")
    assert(!apply(chg((4L, 1L, "a", 8.0, false)), 2L))
    spark.sparkContext.clearJobGroup()
    assert(spark.sparkContext.statusTracker
      .getJobIdsForGroup("topk-stale-replay").isEmpty)
    assert(mv() == Seq(("a", 1L, 1L, 9.0), ("a", 2L, 4L, 8.0)))

    // deleting the TOP member rescans; the previously-DEMOTED k=2 must
    // RE-ENTER (its batch-3 upsert outranks its batch-2 tombstone)
    assert(apply(chg((1L, 2L, "a", 0.0, true)), 3L))
    assert(mv() == Seq(("a", 1L, 4L, 8.0), ("a", 2L, 2L, 7.0)))
  }

  test("top-k matches a full recompute on a randomized changelog") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).map { i =>
      (rnd.nextInt(40).toLong, i.toLong, "g" + rnd.nextInt(5),
        rnd.nextInt(1000) / 10.0, rnd.nextInt(8) == 0)
    }
    val batches = rows.grouped(100).map(r => chg(r: _*)).toSeq
    val got = mvOf(batches)
    val want = recompute(batches.reduce(_ unionByName _))
    assert(got == want && got.nonEmpty)
  }
}
