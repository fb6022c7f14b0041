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

  test("q_asof_range plan has no nested loop at sf0.001") {
    val df = SparkEntry.queries("q_asof_range")(spark, sfDir)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct") &&
      !physical.contains("BroadcastNestedLoopJoin"))
    assert(df.count() > 0)
  }
}
