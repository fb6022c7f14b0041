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

  // ---- N-way (star) incremental maintenance ----

  private def lis(rows: (Long, Long, Long, Long, Boolean)*): DataFrame =
    rows.toDF("lkey", "l_okey", "qty", "lv", "ldel")
  private def ords3(rows: (Long, Long, String, Long, Boolean)*): DataFrame =
    rows.toDF("okey", "o_ckey", "status", "ov", "odel")
  private def custs3(rows: (Long, String, Long, Boolean)*): DataFrame =
    rows.toDF("ckey", "name", "cv", "cdel")

  private val starPairs = Seq("l_okey" -> "okey", "o_ckey" -> "ckey")
  private val starOut = Seq("lkey", "qty", "status", "name")

  /** Ground truth: live latest-per-key 3-way star join. */
  private def recomputeStar(allL: DataFrame, allO: DataFrame,
                            allC: DataFrame): Set[(Long, Long, String, String)] = {
    val l = PkTable.latestPerKey(allL, Seq("lkey"), Seq(col("lv"))).where(!col("ldel"))
    val o = PkTable.latestPerKey(allO, Seq("okey"), Seq(col("ov"))).where(!col("odel"))
    val c = PkTable.latestPerKey(allC, Seq("ckey"), Seq(col("cv"))).where(!col("cdel"))
    l.join(o, col("l_okey") === col("okey"))
      .join(c, col("o_ckey") === col("ckey"))
      .select(col("lkey"), col("qty"), col("status"), col("name"))
      .as[(Long, Long, String, String)].collect().toSet
  }

  test("stepN (3 tables): signed multilinear delta tracks the live star join through fk moves and deletes") {
    import MaterializedJoin.TableIn
    val rounds: Seq[(DataFrame, DataFrame, DataFrame)] = Seq(
      // r1: base — two items on order 1 (cust 10), one on order 2 (cust 20)
      (lis((1L, 1L, 5L, 1L, false), (2L, 1L, 3L, 1L, false), (3L, 2L, 7L, 1L, false)),
        ords3((1L, 10L, "O", 1L, false), (2L, 20L, "O", 1L, false)),
        custs3((10L, "alice", 1L, false), (20L, "bob", 1L, false))),
      // r2: mid-table update fans out to both its items; dangling item
      // (order 9 absent); dim rename fans out through orders
      (lis((4L, 9L, 1L, 1L, false)),
        ords3((1L, 10L, "F", 2L, false)),
        custs3((20L, "bobby", 2L, false))),
      // r3: fk MOVE at the middle (order 2 → cust 10); item delete;
      //     STALE redelivery of order 1's original row (must lose)
      (lis((3L, 2L, 7L, 2L, true)),
        ords3((2L, 10L, "O", 2L, false), (1L, 10L, "O", 1L, false)),
        custs3()),
      // r4: late arrival joins the dangler; dim delete kills the tree
      (lis((5L, 2L, 2L, 1L, false)),
        ords3((9L, 20L, "O", 1L, false)),
        custs3((10L, "alice", 3L, true))))

    var states = Seq(
      MaterializedJoin.emptyState(rounds.head._1, col("ldel")),
      MaterializedJoin.emptyState(rounds.head._2, col("odel")),
      MaterializedJoin.emptyState(rounds.head._3, col("cdel")))
    var mv: Option[DataFrame] = None
    var (allL, allO, allC) = (rounds.head._1.limit(0),
      rounds.head._2.limit(0), rounds.head._3.limit(0))
    rounds.zipWithIndex.foreach { case ((bl, bo, bc), i) =>
      val st = MaterializedJoin.stepN(Seq(
        TableIn(states(0), bl, Seq("lkey"), Seq(col("lv")), col("ldel")),
        TableIn(states(1), bo, Seq("okey"), Seq(col("ov")), col("odel")),
        TableIn(states(2), bc, Seq("ckey"), Seq(col("cv")), col("cdel"))),
        starPairs, starOut)
      states = st.states // stepN checkpoints them
      mv = Some(MaterializedJoin.mergeMv(mv, st.delta, starOut).localCheckpoint(true))
      allL = allL.unionByName(bl); allO = allO.unionByName(bo); allC = allC.unionByName(bc)
      val got = mv.get.select(col("lkey"), col("qty"), col("status"), col("name"))
        .as[(Long, Long, String, String)].collect().toSet
      assert(got == recomputeStar(allL, allO, allC), s"round ${i + 1} diverged: $got")
    }
    // final: cust 10's whole tree gone; item 4 → order 9 → bobby
    val fin = mv.get.select(col("lkey"), col("name")).as[(Long, String)].collect().toSet
    assert(fin == Set((4L, "bobby")), s"final star MV wrong: $fin")
  }

  test("stepN guards: disconnected pair graph and ambiguous key ownership are rejected; table order is free") {
    import MaterializedJoin.TableIn
    val l = lis((1L, 1L, 5L, 1L, false))
    val o = ords3((1L, 10L, "O", 1L, false))
    val c = custs3((10L, "alice", 1L, false))
    def in(df: DataFrame, key: String, ver: String, del: String) =
      TableIn(MaterializedJoin.emptyState(df, col(del)), df, Seq(key), Seq(col(ver)), col(del))
    // the fold is BFS over the pair graph, so ANY table order works —
    // customer listed second is fine (no "fact first" requirement)
    import spark.implicits._
    val any = MaterializedJoin.stepN(Seq(
      in(l, "lkey", "lv", "ldel"), in(c, "ckey", "cv", "cdel"),
      in(o, "okey", "ov", "odel")), starPairs, starOut)
    assert(any.delta.select(col("lkey"), col("name"))
      .as[(Long, String)].collect().toSet == Set((1L, "alice")))
    // a pair set that does NOT connect customer (both pairs hit
    // li/ord) must throw, never silently cross-join
    intercept[IllegalArgumentException] {
      MaterializedJoin.stepN(Seq(
        in(l, "lkey", "lv", "ldel"), in(o, "okey", "ov", "odel"),
        in(c, "ckey", "cv", "cdel")),
        Seq("l_okey" -> "okey", "lkey" -> "status"), starOut)
    }
    // a pair column present in no table
    intercept[IllegalArgumentException] {
      MaterializedJoin.stepN(Seq(
        in(l, "lkey", "lv", "ldel"), in(o, "okey", "ov", "odel")),
        Seq("l_okey" -> "nope"), Seq("lkey"))
    }
  }

  test("maintainAggTx: N-way transactional JOIN+AGG view; replays watermark-skipped; deletes retract") {
    import MaterializedJoin.BatchIn
    import graft.sinks.PkTableSink
    val root = TestTmp.dir("mjtx").toString + "/g"
    val rounds: Seq[(DataFrame, DataFrame, DataFrame)] = Seq(
      (lis((1L, 1L, 5L, 1L, false), (2L, 1L, 3L, 1L, false), (3L, 2L, 7L, 1L, false)),
        ords3((1L, 10L, "O", 1L, false), (2L, 20L, "O", 1L, false)),
        custs3((10L, "alice", 1L, false), (20L, "bob", 1L, false))),
      (lis((4L, 2L, 2L, 1L, false)),
        ords3((1L, 20L, "F", 2L, false)), // fk move: order 1 → bob
        custs3()),
      (lis((1L, 1L, 5L, 2L, true)), // item delete
        ords3(),
        custs3((10L, "al", 2L, false)))) // rename (no live refs after move)
    var (allL, allO, allC) = (rounds.head._1.limit(0),
      rounds.head._2.limit(0), rounds.head._3.limit(0))
    def mvRows(): Map[String, (Long, Long)] = {
      val schemaOf = Seq.empty[(String, Long, Long)].toDF("name", "n", "q")
      PkTableSink.readTxGroup(spark, root, "mv", schemaOf)
        .select(col("name"), col("n"), col("q"))
        .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    }
    def want(): Map[String, (Long, Long)] =
      recomputeStar(allL, allO, allC).groupBy(_._4)
        .map { case (n, rs) => n -> (rs.size.toLong, rs.toSeq.map(_._2).sum) }
    def run(i: Int, r: (DataFrame, DataFrame, DataFrame)): Boolean =
      MaterializedJoin.maintainAggTx(root, Seq(
        BatchIn("li", r._1, Seq("lkey"), Seq("lv"), col("ldel")),
        BatchIn("ord", r._2, Seq("okey"), Seq("ov"), col("odel")),
        BatchIn("cust", r._3, Seq("ckey"), Seq("cv"), col("cdel"))),
        starPairs, outCols = Seq("lkey", "qty", "name"),
        groupCols = Seq("name"), sums = Seq("q" -> col("qty")),
        batchId = i, writer = "w1")
    rounds.zipWithIndex.foreach { case (r, i) =>
      assert(run(i, r), s"batch $i must apply")
      allL = allL.unionByName(r._1); allO = allO.unionByName(r._2)
      allC = allC.unionByName(r._3)
      assert(mvRows() == want(), s"round ${i + 1} view diverged")
      if (i == 1) {
        val before = mvRows()
        assert(!run(i, r), "replayed batch must be watermark-skipped")
        assert(mvRows() == before, "a skipped replay must not change the view")
      }
    }
  }

  test("maintainAggMinMaxTx: extremum retractions rescan the live join; dim death and fk moves move min/max") {
    import MaterializedJoin.BatchIn
    import graft.cdc.MaterializedAgg.Extremum
    import graft.sinks.PkTableSink
    val root = TestTmp.dir("mjmm").toString + "/g"
    def os(rows: (Long, Long, Long, Long, Boolean)*): DataFrame =
      rows.toDF("okey", "ockey", "amt", "ov", "odel")
    def cs(rows: (Long, String, Long, Boolean)*): DataFrame =
      rows.toDF("ckey", "name", "cv", "cdel")
    val rounds: Seq[(DataFrame, DataFrame)] = Seq(
      // alice: {100, 50}; bob: {70}
      (os((1L, 10L, 100L, 1L, false), (2L, 10L, 50L, 1L, false),
        (3L, 20L, 70L, 1L, false)),
        cs((10L, "alice", 1L, false), (20L, "bob", 1L, false))),
      // kill order 1 — alice's stored MAX retracts (group rescan:
      // max 100 → 50); insert order 4 — bob's max merges monotonically
      (os((1L, 10L, 100L, 2L, true), (4L, 20L, 90L, 1L, false)), cs()),
      // dim death: bob dies — ALL his join rows retract, group gone;
      // fk move: order 2 → carl — alice empties, carl appears
      (os((2L, 30L, 50L, 2L, false)),
        cs((20L, "bob", 2L, true), (30L, "carl", 1L, false))))
    var allO = rounds.head._1.limit(0)
    var allC = rounds.head._2.limit(0)
    def mvRows(): Map[String, (Long, Long, Long, Long)] = {
      val schemaOf = Seq.empty[(String, Long, Long, Long, Long, Long)]
        .toDF("name", "n", "s", "mn", "mx", "batch_id")
      PkTableSink.readTxGroup(spark, root, "mv", schemaOf)
        .select(col("name"), col("n"), col("s"), col("mn"), col("mx"))
        .as[(String, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    }
    def want(): Map[String, (Long, Long, Long, Long)] = {
      val l = PkTable.latestPerKey(allO, Seq("okey"), Seq(col("ov")))
        .where(!col("odel"))
      val r = PkTable.latestPerKey(allC, Seq("ckey"), Seq(col("cv")))
        .where(!col("cdel"))
      l.join(r, col("ockey") === col("ckey"))
        .select(col("name"), col("amt")).as[(String, Long)].collect().toSeq
        .groupBy(_._1).map { case (n, rs) =>
          val amts = rs.map(_._2)
          n -> (amts.size.toLong, amts.sum, amts.min, amts.max)
        }
    }
    def run(i: Int, r: (DataFrame, DataFrame)): Boolean =
      MaterializedJoin.maintainAggMinMaxTx(root, Seq(
        BatchIn("ord", r._1, Seq("okey"), Seq("ov"), col("odel")),
        BatchIn("cust", r._2, Seq("ckey"), Seq("cv"), col("cdel"))),
        Seq("ockey" -> "ckey"), outCols = Seq("amt", "name"),
        groupCols = Seq("name"), sums = Seq("s" -> col("amt")),
        exts = Seq(Extremum("mn", col("amt"), isMin = true),
          Extremum("mx", col("amt"), isMin = false)),
        batchId = i, writer = "w1")
    rounds.zipWithIndex.foreach { case (r, i) =>
      assert(run(i, r), s"batch $i must apply")
      allO = allO.unionByName(r._1); allC = allC.unionByName(r._2)
      assert(mvRows() == want(), s"round ${i + 1} min/max view diverged")
      if (i == 1) {
        val before = mvRows()
        assert(!run(i, r), "replayed batch must be watermark-skipped")
        assert(mvRows() == before, "a skipped replay must not change the view")
      }
    }
    // pin the end state explicitly: the max retraction actually moved
    val fin = mvRows()
    assert(fin == Map("carl" -> (1L, 50L, 50L, 50L)), s"end state: $fin")
  }

  test("maintainTopKTx: member retractions rescan; dim changes demote/migrate members; below-k deletes don't") {
    import MaterializedJoin.BatchIn
    import graft.cdc.MaterializedTopK
    import graft.sinks.PkTableSink
    val root = TestTmp.dir("mjtk").toString + "/g"
    def os(rows: (Long, Long, Long, Long, Boolean)*): DataFrame =
      rows.toDF("okey", "ockey", "amt", "ov", "odel")
    def cs(rows: (Long, String, Long, Boolean)*): DataFrame =
      rows.toDF("ckey", "name", "cv", "cdel")
    val rounds: Seq[(DataFrame, DataFrame)] = Seq(
      // alice: {1:100, 2:80, 3:60, 4:40}; bob: {5:70} — k=2 view:
      // alice [1, 2], bob [5]
      (os((1L, 10L, 100L, 1L, false), (2L, 10L, 80L, 1L, false),
        (3L, 10L, 60L, 1L, false), (4L, 10L, 40L, 1L, false),
        (5L, 20L, 70L, 1L, false)),
        cs((10L, "alice", 1L, false), (20L, "bob", 1L, false))),
      // kill order 1 — a STORED MEMBER: alice rescans, hidden row 3
      // promotes ([2, 3]); kill order 4 — BELOW-k: membership logic
      // must not need a rescan for it; insert 6:90 into bob ([6, 5])
      (os((1L, 10L, 100L, 2L, true), (4L, 10L, 40L, 2L, true),
        (6L, 20L, 90L, 1L, false)), cs()),
      // fk move: order 2 (alice's top) migrates to carl — the − join
      // row demotes it out of alice ([3]), the + inserts it at carl;
      // dim death: bob dies, his whole group's members retract
      (os((2L, 30L, 80L, 2L, false)),
        cs((20L, "bob", 2L, true), (30L, "carl", 1L, false))))
    var allO = rounds.head._1.limit(0)
    var allC = rounds.head._2.limit(0)
    def mvRows(): Map[String, Seq[(Long, Long, Long)]] = {
      val schemaOf = Seq.empty[(String, Long, Long, Long)]
        .toDF("name", "okey", "__topk_v", "batch_id") // the stored value col
      MaterializedTopK.rank(
          PkTableSink.readTxGroup(spark, root, "mv", schemaOf),
          Seq("name"), Seq("okey"), "amt")
        .select(col("name"), col("rank"), col("okey"), col("amt"))
        .as[(String, Long, Long, Long)].collect().toSeq
        .groupBy(_._1).map { case (g, rs) =>
          g -> rs.sortBy(_._2).map(r => (r._2, r._3, r._4))
        }
    }
    def want(): Map[String, Seq[(Long, Long, Long)]] = {
      val l = PkTable.latestPerKey(allO, Seq("okey"), Seq(col("ov")))
        .where(!col("odel"))
      val r = PkTable.latestPerKey(allC, Seq("ckey"), Seq(col("cv")))
        .where(!col("cdel"))
      l.join(r, col("ockey") === col("ckey"))
        .select(col("name"), col("okey"), col("amt"))
        .as[(String, Long, Long)].collect().toSeq
        .groupBy(_._1).map { case (g, rs) =>
          g -> rs.sortBy(x => (-x._3, x._2)).take(2).zipWithIndex
            .map { case ((_, okey, amt), i) => (i + 1L, okey, amt) }
        }
    }
    def run(i: Int, r: (DataFrame, DataFrame)): Boolean =
      MaterializedJoin.maintainTopKTx(root, Seq(
        BatchIn("ord", r._1, Seq("okey"), Seq("ov"), col("odel")),
        BatchIn("cust", r._2, Seq("ckey"), Seq("cv"), col("cdel"))),
        Seq("ockey" -> "ckey"), outCols = Seq("okey", "amt", "name"),
        groupCols = Seq("name"), keyCols = Seq("okey"),
        value = col("amt"), k = 2, batchId = i, writer = "w1")
    rounds.zipWithIndex.foreach { case (r, i) =>
      assert(run(i, r), s"batch $i must apply")
      allO = allO.unionByName(r._1); allC = allC.unionByName(r._2)
      assert(mvRows() == want(), s"round ${i + 1} top-k view diverged")
      if (i == 1) {
        val before = mvRows()
        assert(!run(i, r), "replayed batch must be watermark-skipped")
        assert(mvRows() == before, "a skipped replay must not change the view")
      }
    }
    val fin = mvRows()
    assert(fin == Map(
      "alice" -> Seq((1L, 3L, 60L)),
      "carl" -> Seq((1L, 2L, 80L))), s"end state: $fin")
  }

  test("maintainAggMinMaxTx matches a full live-join recompute on a randomized 2-table changelog") {
    import MaterializedJoin.BatchIn
    import graft.cdc.MaterializedAgg.Extremum
    import graft.sinks.PkTableSink
    val root = TestTmp.dir("mjmmr").toString + "/g"
    val rnd = new scala.util.Random(29)
    val oRows = (0 until 300).map { i =>
      (rnd.nextInt(120).toLong, (1 + rnd.nextInt(15)).toLong,
        rnd.nextInt(500).toLong, i.toLong, rnd.nextInt(10) == 0)
    }
    val cRows = (0 until 60).map { i =>
      ((1 + rnd.nextInt(15)).toLong, "g" + rnd.nextInt(4), i.toLong,
        rnd.nextInt(12) == 0)
    }
    def os(rows: Seq[(Long, Long, Long, Long, Boolean)]): DataFrame =
      rows.toDF("okey", "ockey", "amt", "ov", "odel")
    def cs(rows: Seq[(Long, String, Long, Boolean)]): DataFrame =
      rows.toDF("ckey", "name", "cv", "cdel")
    val oBatches = oRows.grouped(75).map(os).toSeq
    val cBatches = cRows.grouped(15).map(cs).toSeq
    var allO = os(Nil).limit(0); var allC = cs(Nil).limit(0)
    def mvRows(): Map[String, (Long, Long, Long, Long)] = {
      val schemaOf = Seq.empty[(String, Long, Long, Long, Long, Long)]
        .toDF("name", "n", "s", "mn", "mx", "batch_id")
      PkTableSink.readTxGroup(spark, root, "mv", schemaOf)
        .select(col("name"), col("n"), col("s"), col("mn"), col("mx"))
        .as[(String, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    }
    def want(): Map[String, (Long, Long, Long, Long)] = {
      val l = PkTable.latestPerKey(allO, Seq("okey"), Seq(col("ov")))
        .where(!col("odel"))
      val r = PkTable.latestPerKey(allC, Seq("ckey"), Seq(col("cv")))
        .where(!col("cdel"))
      l.join(r, col("ockey") === col("ckey"))
        .select(col("name"), col("amt")).as[(String, Long)].collect().toSeq
        .groupBy(_._1).map { case (g, rs) =>
          val amts = rs.map(_._2)
          g -> (amts.size.toLong, amts.sum, amts.min, amts.max)
        }
    }
    (0 until 4).foreach { i =>
      assert(MaterializedJoin.maintainAggMinMaxTx(root, Seq(
        BatchIn("ord", oBatches(i), Seq("okey"), Seq("ov"), col("odel")),
        BatchIn("cust", cBatches(i), Seq("ckey"), Seq("cv"), col("cdel"))),
        Seq("ockey" -> "ckey"), outCols = Seq("amt", "name"),
        groupCols = Seq("name"), sums = Seq("s" -> col("amt")),
        exts = Seq(Extremum("mn", col("amt"), isMin = true),
          Extremum("mx", col("amt"), isMin = false)),
        batchId = i, writer = "w1"), s"batch $i must apply")
      allO = allO.unionByName(oBatches(i)); allC = allC.unionByName(cBatches(i))
      val (g, w) = (mvRows(), want())
      assert(g == w, s"round ${i + 1}: got $g want $w")
    }
    assert(mvRows().nonEmpty)
  }

  test("maintainTopKTx matches a full live-join recompute on a randomized 2-table changelog") {
    import MaterializedJoin.BatchIn
    import graft.cdc.MaterializedTopK
    import graft.sinks.PkTableSink
    val root = TestTmp.dir("mjtkr").toString + "/g"
    val rnd = new scala.util.Random(13)
    // orders: 120 keys over 15 customers, updates (fk moves, amount
    // changes) and deletes interleaved across 4 rounds; customers:
    // renames (group moves) and deletes
    val oRows = (0 until 300).map { i =>
      (rnd.nextInt(120).toLong, (1 + rnd.nextInt(15)).toLong,
        rnd.nextInt(500).toLong, i.toLong, rnd.nextInt(10) == 0)
    }
    val cRows = (0 until 60).map { i =>
      ((1 + rnd.nextInt(15)).toLong, "g" + rnd.nextInt(4), i.toLong,
        rnd.nextInt(12) == 0)
    }
    def os(rows: Seq[(Long, Long, Long, Long, Boolean)]): DataFrame =
      rows.toDF("okey", "ockey", "amt", "ov", "odel")
    def cs(rows: Seq[(Long, String, Long, Boolean)]): DataFrame =
      rows.toDF("ckey", "name", "cv", "cdel")
    val oBatches = oRows.grouped(75).map(os).toSeq
    val cBatches = cRows.grouped(15).map(cs).toSeq
    var allO = os(Nil).limit(0); var allC = cs(Nil).limit(0)
    def mvRows(): Map[String, Seq[(Long, Long, Long)]] = {
      val schemaOf = Seq.empty[(String, Long, Long, Long)]
        .toDF("name", "okey", "__topk_v", "batch_id")
      MaterializedTopK.rank(
          PkTableSink.readTxGroup(spark, root, "mv", schemaOf),
          Seq("name"), Seq("okey"), "amt")
        .select(col("name"), col("rank"), col("okey"), col("amt"))
        .as[(String, Long, Long, Long)].collect().toSeq
        .groupBy(_._1).map { case (g, rs) =>
          g -> rs.sortBy(_._2).map(r => (r._2, r._3, r._4))
        }
    }
    def want(): Map[String, Seq[(Long, Long, Long)]] = {
      val l = PkTable.latestPerKey(allO, Seq("okey"), Seq(col("ov")))
        .where(!col("odel"))
      val r = PkTable.latestPerKey(allC, Seq("ckey"), Seq(col("cv")))
        .where(!col("cdel"))
      l.join(r, col("ockey") === col("ckey"))
        .select(col("name"), col("okey"), col("amt"))
        .as[(String, Long, Long)].collect().toSeq
        .groupBy(_._1).map { case (g, rs) =>
          g -> rs.sortBy(x => (-x._3, x._2)).take(3).zipWithIndex
            .map { case ((_, okey, amt), i) => (i + 1L, okey, amt) }
        }
    }
    (0 until 4).foreach { i =>
      assert(MaterializedJoin.maintainTopKTx(root, Seq(
        BatchIn("ord", oBatches(i), Seq("okey"), Seq("ov"), col("odel")),
        BatchIn("cust", cBatches(i), Seq("ckey"), Seq("cv"), col("cdel"))),
        Seq("ockey" -> "ckey"), outCols = Seq("okey", "amt", "name"),
        groupCols = Seq("name"), keyCols = Seq("okey"),
        value = col("amt"), k = 3, batchId = i, writer = "w1"),
        s"batch $i must apply")
      allO = allO.unionByName(oBatches(i)); allC = allC.unionByName(cBatches(i))
      val (g, w) = (mvRows(), want())
      assert(g == w, s"round ${i + 1}: got $g want $w")
    }
    assert(mvRows().nonEmpty)
  }
}
