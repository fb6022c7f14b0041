package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.cdc.{MaterializedJoin, PkTable}

/** Incremental JOIN materialized view: signed bilinear delta
  * maintenance equals a full re-join after every batch pair —
  * including fk moves, dim-side fan-out updates, deletes on both
  * sides, stale deliveries, and true multiplicities under an
  * aggregating projection. */
class MaterializedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ords(rows: (Long, Long, Long, Long, Boolean)*): DataFrame =
    rows.toDF("okey", "ckey", "amt", "ov", "odel")
  private def custs(rows: (Long, String, Long, Boolean)*): DataFrame =
    rows.toDF("ckey", "name", "cv", "cdel")

  private val outCols = Seq("okey", "ckey", "amt", "name")

  /** Ground truth: live latest-per-key join of everything delivered. */
  private def recompute(allL: DataFrame, allR: DataFrame): Set[(Long, Long, Long, String)] = {
    val l = PkTable.latestPerKey(allL, Seq("okey"), Seq(col("ov"))).where(!col("odel"))
    val r = PkTable.latestPerKey(allR, Seq("ckey"), Seq(col("cv"))).where(!col("cdel"))
      .withColumnRenamed("ckey", "rck")
    l.join(r, col("ckey") === col("rck"))
      .select(col("okey"), col("ckey"), col("amt"), col("name"))
      .as[(Long, Long, Long, String)].collect().toSet
  }

  test("join MV tracks the live join through fk moves, fan-out updates and deletes") {
    val rounds: Seq[(DataFrame, DataFrame)] = Seq(
      // r1: base inserts
      (ords((1L, 10L, 100L, 1L, false), (2L, 20L, 200L, 1L, false)),
        custs((10L, "alice", 1L, false), (20L, "bob", 1L, false))),
      // r2: dim rename fans out; fact update; dangling fact (cust 30 absent)
      (ords((2L, 20L, 250L, 2L, false), (3L, 30L, 50L, 1L, false)),
        custs((10L, "alicia", 2L, false))),
      // r3: dim arrives late (order 3 joins), fk MOVE (order 1 → bob),
      //     dim delete (10 now unreferenced), fact delete (order 2),
      //     plus a STALE redelivery of order 1's original row
      (ords((1L, 20L, 100L, 2L, false), (2L, 20L, 250L, 3L, true),
            (1L, 10L, 100L, 1L, false)),
        custs((30L, "carol", 1L, false), (10L, "alicia", 3L, true))))

    var stateL = MaterializedJoin.emptyState(rounds.head._1, col("odel"))
    var stateR = MaterializedJoin.emptyState(rounds.head._2, col("cdel"))
    var mv: Option[DataFrame] = None
    var allL = rounds.head._1.limit(0)
    var allR = rounds.head._2.limit(0)
    rounds.zipWithIndex.foreach { case ((bl, br), i) =>
      val st = MaterializedJoin.step(
        stateL, bl, Seq("okey"), Seq(col("ov")), col("odel"),
        stateR, br, Seq("ckey"), Seq(col("cv")), col("cdel"),
        joinL = Seq("ckey"), joinR = Seq("ckey"), outCols = outCols)
      stateL = st.stateL.localCheckpoint(true)
      stateR = st.stateR.localCheckpoint(true)
      mv = Some(MaterializedJoin.mergeMv(mv, st.delta, outCols).localCheckpoint(true))
      allL = allL.unionByName(bl)
      allR = allR.unionByName(br)
      val got = mv.get.where(col("__mult") > 0)
        .select(col("okey"), col("ckey"), col("amt"), col("name"))
        .as[(Long, Long, Long, String)].collect().toSet
      assert(got == recompute(allL, allR), s"round ${i + 1} diverged: $got")
      assert(mv.get.where(col("__mult") =!= 1).count() == 0,
        "PK-preserving projection must keep mult = 1")
    }
    // final shape: order1→bob, order3→carol; order2 and alice gone
    val fin = mv.get.select(col("okey"), col("name")).as[(Long, String)].collect().toSet
    assert(fin == Set((1L, "bob"), (3L, "carol")), s"final MV wrong: $fin")
  }

  test("aggregating projection accumulates true join multiplicities") {
    val bl = ords((1L, 10L, 5L, 1L, false), (2L, 10L, 6L, 1L, false),
      (3L, 20L, 7L, 1L, false))
    val br = custs((10L, "alice", 1L, false), (20L, "bob", 1L, false))
    val st = MaterializedJoin.step(
      MaterializedJoin.emptyState(bl, col("odel")), bl,
      Seq("okey"), Seq(col("ov")), col("odel"),
      MaterializedJoin.emptyState(br, col("cdel")), br,
      Seq("ckey"), Seq(col("cv")), col("cdel"),
      joinL = Seq("ckey"), joinR = Seq("ckey"), outCols = Seq("name"))
    val mv1 = MaterializedJoin.mergeMv(None, st.delta, Seq("name"))
    val got = mv1.as[(String, Long)].collect().toMap
    assert(got == Map("alice" -> 2L, "bob" -> 1L), s"mults wrong: $got")
    // deleting one alice order decrements, not deletes, her row
    val bl2 = ords((2L, 10L, 6L, 2L, true))
    val st2 = MaterializedJoin.step(
      st.stateL.localCheckpoint(true), bl2, Seq("okey"), Seq(col("ov")), col("odel"),
      st.stateR.localCheckpoint(true), custs(),
      Seq("ckey"), Seq(col("cv")), col("cdel"),
      joinL = Seq("ckey"), joinR = Seq("ckey"), outCols = Seq("name"))
    val mv2 = MaterializedJoin.mergeMv(Some(mv1), st2.delta, Seq("name"))
    val got2 = mv2.as[(String, Long)].collect().toMap
    assert(got2 == Map("alice" -> 1L, "bob" -> 1L), s"decrement wrong: $got2")
  }
}
