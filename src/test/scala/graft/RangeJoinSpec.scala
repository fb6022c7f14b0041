package graft

import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

/** Bucketed point-in-interval join: correctness vs a naive filter
  * formulation, boundary semantics, and plan shape (equi-join, never a
  * nested loop). */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq(
    (1L, 1L, 0L), (2L, 1L, 99L), (3L, 1L, 100L), (4L, 1L, 150L),
    (5L, 2L, 150L), (6L, 3L, 500L), (7L, 1L, 249L), (8L, 1L, 250L)
  ).toDF("pid", "k", "p")

  private def intervals = Seq(
    (10L, 1L, 100L, 250L), // [100, 250) on key 1
    (11L, 1L, 200L, 300L), // overlapping interval, same key
    (12L, 2L, 100L, 200L), // key 2
    (13L, 4L, 0L, 1000L)   // key with no points
  ).toDF("iid", "k2", "s", "e")

  test("range join matches the naive formulation, boundaries half-open") {
    val got = RangeJoin.pointInInterval(points, intervals,
      leftKey = col("k"), point = col("p"),
      rightKey = col("k2"), start = col("s"), endExcl = col("e"),
      bucketWidth = 128)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals,
      col("k") === col("k2") && col("p") >= col("s") && col("p") < col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == naive)
    // start inclusive (p=100 ∈ [100,250)), end exclusive (p=250 ∉)
    assert(got.contains((3L, 10L)) && !got.contains((8L, 10L)))
    // one point in two overlapping intervals → two pairs
    assert(got.contains((7L, 10L)) && got.contains((7L, 11L)))
  }

  test("inverted/empty intervals (dirty data) emit nothing, never explode") {
    // an inverted interval would hit sequence()'s default -1 step and
    // blow up into a huge descending bucket array without the guard
    val dirty = Seq(
      (20L, 1L, 250L, 100L),       // inverted
      (21L, 1L, 100L, 100L),       // empty
      (22L, 1L, 5000000L, 0L),     // inverted AND wide: the OOM shape
      (10L, 1L, 100L, 250L)        // one clean interval as control
    ).toDF("iid", "k2", "s", "e")
    val got = RangeJoin.pointInInterval(points, dirty,
      leftKey = col("k"), point = col("p"),
      rightKey = col("k2"), start = col("s"), endExcl = col("e"),
      bucketWidth = 128)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got.map(_._2) == Set(10L))
  }

  test("replication is bounded: interval spans ceil(len/width)+1 buckets max") {
    // width == interval length → at most 2 bucket copies per interval
    val df = RangeJoin.pointInInterval(points, intervals,
      leftKey = col("k"), point = col("p"),
      rightKey = col("k2"), start = col("s"), endExcl = col("e"),
      bucketWidth = 1000)
    val naive = points.join(intervals,
      col("k") === col("k2") && col("p") >= col("s") && col("p") < col("e"))
    assert(df.count() == naive.count())
  }

  test("auto bucket width (median interval length) matches the naive formulation") {
    val got = graft.ops.RangeJoin.pointInIntervalAuto(points, intervals,
      leftKey = col("k"), point = col("p"),
      rightKey = col("k2"), start = col("s"), endExcl = col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals,
      col("k") === col("k2") && col("p") >= col("s") && col("p") < col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == naive)
  }

  test("plans as an equi-join: no nested loop, no cartesian") {
    val df = RangeJoin.pointInInterval(points, intervals,
      leftKey = col("k"), point = col("p"),
      rightKey = col("k2"), start = col("s"), endExcl = col("e"),
      bucketWidth = 128)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct"),
      s"range join fell back to cartesian:\n$physical")
    assert(!physical.contains("BroadcastNestedLoopJoin"),
      s"range join fell back to nested loop:\n$physical")
  }

  private def leftIv = Seq(
    (1L, 1L, 0L, 100L),   // overlaps 10 and 11
    (2L, 1L, 250L, 260L), // overlaps 11 only (10's end is exclusive)
    (3L, 1L, 300L, 301L), // key 1, past both
    (4L, 2L, 150L, 150L), // zero-length: overlaps nothing
    (5L, 2L, 100L, 500L)  // long interval spanning many buckets
  ).toDF("lid", "lk", "ls", "le")

  test("interval overlap matches the naive formulation, each pair exactly once") {
    for (width <- Seq(7L, 128L, 1000L)) {
      val got = RangeJoin.intervalOverlap(leftIv, intervals,
        leftKey = col("lk"), lStart = col("ls"), lEndExcl = col("le"),
        rightKey = col("k2"), rStart = col("s"), rEndExcl = col("e"),
        bucketWidth = width)
        .select("lid", "iid").as[(Long, Long)].collect().toSeq
      val naive = leftIv.join(intervals,
        col("lk") === col("k2") && col("ls") < col("le") && col("s") < col("e") &&
          col("ls") < col("e") && col("s") < col("le"))
        .select("lid", "iid").as[(Long, Long)].collect().toSet
      // set equality AND no per-bucket duplicate rows at any width
      assert(got.toSet == naive, s"width=$width")
      assert(got.size == naive.size, s"width=$width: duplicate pairs emitted")
    }
  }

  test("interval overlap boundaries: touching intervals do not overlap") {
    val got = RangeJoin.intervalOverlap(leftIv, intervals,
      leftKey = col("lk"), lStart = col("ls"), lEndExcl = col("le"),
      rightKey = col("k2"), rStart = col("s"), rEndExcl = col("e"),
      bucketWidth = 100)
      .select("lid", "iid").as[(Long, Long)].collect().toSet
    // [0,100) vs [100,250): touch at 100, half-open → no overlap
    assert(!got.contains((1L, 10L)))
    // [250,260) vs [200,300): real overlap
    assert(got.contains((2L, 11L)))
    // zero-length [150,150) never matches, even inside [100,200)
    assert(!got.exists(_._1 == 4L))
    // long interval [100,500) × [100,200) overlaps once despite 5 shared buckets
    assert(got.count(_ == (5L, 12L)) == 1)
  }

  test("interval overlap plans as an equi-join: no nested loop, no cartesian") {
    val df = RangeJoin.intervalOverlap(leftIv, intervals,
      leftKey = col("lk"), lStart = col("ls"), lEndExcl = col("le"),
      rightKey = col("k2"), rStart = col("s"), rEndExcl = col("e"),
      bucketWidth = 128)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct") &&
      !physical.contains("BroadcastNestedLoopJoin"), physical)
  }

  test("q_asof_range plan has no nested loop at sf0.001") {
    val df = SparkEntry.queries("q_asof_range")(spark, sfDir)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct") &&
      !physical.contains("BroadcastNestedLoopJoin"))
    assert(df.count() > 0)
  }
}
