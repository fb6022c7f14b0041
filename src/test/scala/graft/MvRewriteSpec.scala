package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.MvRewrite
import graft.plans.MvRewrite.{CountOf, CountStar, KmvSketchOf, MaxOf, QskSketchOf, RbmSketchOf, SumOf}

/** Transparent MV rewrite: exact-match collapse to a Project, rollup
  * re-aggregation, scope guards, and exprId-stable parents. */
class MvRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val srcPath = s"$sfDir/orders.parquet"

  private def buildMv(): String = {
    val dir = TestTmp.dir("mv").toString + "/mv"
    spark.read.parquet(srcPath)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), sum(col("o_totalprice")).as("total"),
        max(col("o_totalprice")).as("mx"))
      .write.parquet(dir)
    dir
  }

  private def registerMv(mvDir: String): Unit =
    MvRewrite.register(spark, srcPath, mvDir,
      groupCols = Seq("o_orderstatus", "o_orderpriority"),
      aggs = Map("cnt" -> CountStar, "total" -> SumOf("o_totalprice"),
        "mx" -> MaxOf("o_totalprice")))

  // structural scan check (plan-STRING matching truncates long paths —
  // spark.sql.maxMetadataStringLength — and flaps with temp-dir depth)
  private def scansMv(df: DataFrame, mvDir: String): Boolean = {
    val mvp = new org.apache.hadoop.fs.Path(mvDir).toUri.getPath
    scanRoots(df).exists(_.startsWith(mvp))
  }

  private def exactQuery(): DataFrame =
    spark.read.parquet(srcPath)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("s"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))

  private def rollupQuery(): DataFrame =
    spark.read.parquet(srcPath)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("s"),
        max(col("o_totalprice")).as("m"))
      .orderBy(col("o_orderstatus"))

  test("exact match collapses the aggregate onto the MV; results identical") {
    MvRewrite.clear()
    val baseline = exactQuery().collect().toSeq // registry empty → source
    val mvDir = buildMv()
    registerMv(mvDir)
    try {
      val q = exactQuery()
      assert(scansMv(q, mvDir), s"plan did not scan the MV:\n${q.queryExecution}")
      // exact match needs no re-aggregation: no HashAggregate at all
      assert(!q.queryExecution.executedPlan.toString.contains("HashAggregate"),
        "exact-match rewrite should be aggregate-free")
      assert(q.collect().toSeq == baseline)
    } finally MvRewrite.clear()
  }

  test("rollup: subset group-by re-aggregates MV rows; results identical") {
    MvRewrite.clear()
    val baseline = rollupQuery().collect().toSeq
    val mvDir = buildMv()
    registerMv(mvDir)
    try {
      val q = rollupQuery()
      assert(scansMv(q, mvDir), s"plan did not scan the MV:\n${q.queryExecution}")
      val got = q.collect().toSeq
      // counts/max exact; the double re-sum differs from the raw-row
      // sum only in FP association (inherent to ANY rollup — Spark's
      // own partial aggregation has the same freedom) → relative bound
      assert(got.size == baseline.size)
      got.zip(baseline).foreach { case (g, b) =>
        assert(g.getString(0) == b.getString(0))
        assert(g.getLong(1) == b.getLong(1))
        assert(math.abs(g.getDouble(2) - b.getDouble(2)) <=
          1e-9 * math.abs(b.getDouble(2)), s"sum drift: $g vs $b")
        assert(g.getDouble(3) == b.getDouble(3))
      }
    } finally MvRewrite.clear()
  }

  test("parents above the aggregate survive the rewrite (exprIds preserved)") {
    MvRewrite.clear()
    val mvDir = buildMv()
    registerMv(mvDir)
    try {
      // a filter + projection ABOVE the aggregate references its output
      val q = rollupQuery().where(col("n") > 0)
        .select((col("s") / col("n")).as("avg_price"), col("o_orderstatus"))
      assert(scansMv(q, mvDir))
      assert(q.collect().nonEmpty)
    } finally MvRewrite.clear()
  }

  test("group-column filter rewrites onto the MV (partition-pruning shape)") {
    MvRewrite.clear()
    // the "date-partitioned MV" shape: predicate on an MV group column
    // only → constant per group → re-applied above the MV scan
    def exactFiltered(): DataFrame =
      spark.read.parquet(srcPath)
        .where(col("o_orderstatus") === "F")
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("s"))
        .orderBy(col("o_orderpriority"))
    def rollupFiltered(): DataFrame =
      spark.read.parquet(srcPath)
        .where(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), max(col("o_totalprice")).as("m"))
        .orderBy(col("o_orderstatus"))
    val exactBase = exactFiltered().collect().toSeq
    val rollupBase = rollupFiltered().collect().toSeq
    val mvDir = buildMv()
    registerMv(mvDir)
    try {
      val q1 = exactFiltered()
      assert(scansMv(q1, mvDir), s"filtered exact match did not scan the MV:\n${q1.queryExecution}")
      assert(!q1.queryExecution.executedPlan.toString.contains("HashAggregate"),
        "exact-match rewrite should stay aggregate-free under a group-column filter")
      assert(q1.queryExecution.optimizedPlan.toString.contains("Filter"),
        "the group-column predicate must survive above the MV scan")
      assert(q1.collect().toSeq == exactBase)

      val q2 = rollupFiltered()
      assert(scansMv(q2, mvDir), s"filtered rollup did not scan the MV:\n${q2.queryExecution}")
      val got = q2.collect().toSeq
      assert(got.size == rollupBase.size)
      got.zip(rollupBase).foreach { case (g, b) =>
        assert(g.getString(0) == b.getString(0))
        assert(g.getLong(1) == b.getLong(1))
        assert(g.getDouble(2) == b.getDouble(2))
      }
    } finally MvRewrite.clear()
  }

  test("avg rewrites via the sum/count decomposition when the MV stores both halves") {
    MvRewrite.clear()
    def avgExact(): DataFrame =
      spark.read.parquet(srcPath)
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(avg(col("o_totalprice")).as("a"), count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"), col("o_orderpriority"))
    def avgRollup(): DataFrame =
      spark.read.parquet(srcPath)
        .groupBy(col("o_orderstatus"))
        .agg(avg(col("o_totalprice")).as("a"))
        .orderBy(col("o_orderstatus"))
    val exactBase = avgExact().collect().toSeq
    val rollupBase = avgRollup().collect().toSeq
    val dir = TestTmp.dir("mva").toString + "/mv"
    spark.read.parquet(srcPath)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), sum(col("o_totalprice")).as("total"),
        count(col("o_totalprice")).as("cnt_price"))
      .write.parquet(dir)
    MvRewrite.register(spark, srcPath, dir,
      groupCols = Seq("o_orderstatus", "o_orderpriority"),
      aggs = Map("cnt" -> CountStar, "total" -> SumOf("o_totalprice"),
        "cnt_price" -> CountOf("o_totalprice")))
    try {
      val q1 = avgExact()
      assert(scansMv(q1, dir), s"avg exact match did not scan the MV:\n${q1.queryExecution}")
      assert(!q1.queryExecution.executedPlan.toString.contains("HashAggregate"),
        "exact avg = stored sum / stored count: aggregate-free")
      q1.collect().toSeq.zip(exactBase).foreach { case (g, b) =>
        assert(g.getString(0) == b.getString(0) && g.getString(1) == b.getString(1))
        assert(math.abs(g.getDouble(2) - b.getDouble(2)) <=
          1e-9 * math.abs(b.getDouble(2)), s"avg drift: $g vs $b")
        assert(g.getLong(3) == b.getLong(3))
      }
      val q2 = avgRollup()
      assert(scansMv(q2, dir), s"avg rollup did not scan the MV:\n${q2.queryExecution}")
      q2.collect().toSeq.zip(rollupBase).foreach { case (g, b) =>
        assert(g.getString(0) == b.getString(0))
        assert(math.abs(g.getDouble(1) - b.getDouble(1)) <=
          1e-9 * math.abs(b.getDouble(1)), s"rollup avg drift: $g vs $b")
      }
    } finally MvRewrite.clear()
  }

  test("two registered MVs: exact match beats rollup; among rollups the fewest-rows MV wins") {
    MvRewrite.clear()
    def q(): DataFrame = spark.read.parquet(srcPath)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("s"))
      .orderBy(col("o_orderstatus"))
    val baseline = q().collect().toSeq
    // fine rollup candidate: (status, priority) — ~15 rows
    val fineDir = buildMv()
    // coarse-but-bigger rollup candidate: (status, custkey) — ~1k rows
    val bigDir = TestTmp.dir("mvb").toString + "/mv"
    spark.read.parquet(srcPath)
      .groupBy(col("o_orderstatus"), col("o_custkey"))
      .agg(count(lit(1)).as("cnt"), sum(col("o_totalprice")).as("total"))
      .write.parquet(bigDir)
    registerMv(fineDir)
    MvRewrite.register(spark, srcPath, bigDir,
      groupCols = Seq("o_orderstatus", "o_custkey"),
      aggs = Map("cnt" -> CountStar, "total" -> SumOf("o_totalprice")))
    try {
      // both are rollup candidates; the fewest-rows one must be chosen
      val q1 = q()
      assert(scansMv(q1, fineDir) && !scansMv(q1, bigDir),
        s"expected the ~15-row MV, got:\n${q1.queryExecution.executedPlan}")
      // now register an EXACT-match MV: it costs zero re-aggregation
      // and must win over both rollups
      val exactDir = TestTmp.dir("mve").toString + "/mv"
      spark.read.parquet(srcPath)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"), sum(col("o_totalprice")).as("total"))
        .write.parquet(exactDir)
      MvRewrite.register(spark, srcPath, exactDir,
        groupCols = Seq("o_orderstatus"),
        aggs = Map("cnt" -> CountStar, "total" -> SumOf("o_totalprice")))
      val q2 = q()
      assert(scansMv(q2, exactDir) && !scansMv(q2, fineDir),
        s"exact MV must beat rollups:\n${q2.queryExecution.executedPlan}")
      assert(!q2.queryExecution.executedPlan.toString.contains("HashAggregate"))
      // results identical through every choice (exprIds preserved:
      // the orderBy above the aggregate still resolves)
      val got = q2.collect().toSeq
      assert(got.size == baseline.size)
      got.zip(baseline).foreach { case (g, b) =>
        assert(g.getString(0) == b.getString(0) && g.getLong(1) == b.getLong(1))
        assert(math.abs(g.getDouble(2) - b.getDouble(2)) <=
          1e-9 * math.abs(b.getDouble(2)))
      }
    } finally MvRewrite.clear()
  }

  test("scope guards: filters, non-re-aggregable functions, and foreign groupings stay on the source") {
    MvRewrite.clear()
    val mvDir = buildMv()
    registerMv(mvDir)
    try {
      val filtered = spark.read.parquet(srcPath)
        .where(col("o_totalprice") > 1000.0)
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      assert(!scansMv(filtered, mvDir),
        "a filtered aggregate must NOT read pre-aggregated rows")
      val avgQ = spark.read.parquet(srcPath)
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(avg(col("o_totalprice")).as("a"))
      assert(!scansMv(avgQ, mvDir), "avg is not registered/re-aggregable")
      val foreign = spark.read.parquet(srcPath)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"))
      assert(!scansMv(foreign, mvDir), "group-by outside the MV set")
      // and the guarded queries still compute correctly from the source
      assert(avgQ.collect().nonEmpty && foreign.collect().nonEmpty)
    } finally MvRewrite.clear()
  }

  // ---- sketch-MV path: approx aggregates served from committed
  // sketch columns (the StarRocks HLL/PERCENTILE acceleration) ----

  private def buildSketchMvs(): (String, String) = {
    import graft.functions.{Kmv, Qsk}
    val base = TestTmp.dir("skmv").toString
    val kmvDir = base + "/kmv_pub"
    val qskDir = base + "/qsk_pub"
    val mv = spark.read.parquet(srcPath)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(Kmv.kmvOf(Kmv.hash63(col("o_custkey"))).as("sk"),
        Qsk.qskOf(col("o_totalprice")).as("psk"),
        count(lit(1)).as("n"))
    MvRewrite.registerSketchSnapshot(spark, srcPath,
      mv.select(col("o_orderstatus"), col("o_orderpriority"), col("sk"), col("n")),
      kmvDir, Seq("o_orderstatus", "o_orderpriority"),
      Map("sk" -> KmvSketchOf("o_custkey"), "n" -> CountStar))
    MvRewrite.registerSketchSnapshot(spark, srcPath,
      mv.select(col("o_orderstatus"), col("o_orderpriority"), col("psk"), col("n")),
      qskDir, Seq("o_orderstatus", "o_orderpriority"),
      Map("psk" -> QskSketchOf("o_totalprice"), "n" -> CountStar))
    (kmvDir, qskDir)
  }

  test("approx_count_distinct rolls up from the KMV sketch MV; estimate within band") {
    MvRewrite.clear()
    val exact = spark.read.parquet(srcPath)
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("d"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (kmvDir, _) = buildSketchMvs()
    try {
      val q = spark.read.parquet(srcPath)
        .groupBy(col("o_orderstatus"))
        .agg(approx_count_distinct(col("o_custkey")).as("d"),
          count(lit(1)).as("n"))
      assert(scansMv(q, kmvDir),
        s"plan did not scan the KMV sketch MV:\n${q.queryExecution.optimizedPlan}")
      assert(!q.queryExecution.executedPlan.toString.contains(
        new org.apache.hadoop.fs.Path(srcPath).toUri.getPath),
        "rewritten plan must not rescan the source")
      q.collect().foreach { r =>
        val (d, n) = exact(r.getString(0))
        assert(r.getLong(2) == n, s"count(*) must roll up exactly: $r vs $n")
        assert(math.abs(r.getLong(1) - d) <= 0.1 * d + 32,
          s"KMV estimate out of band: got ${r.getLong(1)}, exact $d")
      }
    } finally MvRewrite.clear()
  }

  test("percentile_approx rolls up from the Qsk sketch MV (SQL text form)") {
    MvRewrite.clear()
    val (_, qskDir) = buildSketchMvs()
    try {
      spark.read.parquet(srcPath).createOrReplaceTempView("orders_mvr")
      val q = spark.sql(
        """SELECT o_orderstatus, percentile_approx(o_totalprice, 0.5) AS p50
          |FROM orders_mvr GROUP BY o_orderstatus""".stripMargin)
      assert(scansMv(q, qskDir),
        s"SQL-text plan did not scan the Qsk sketch MV:\n${q.queryExecution.optimizedPlan}")
      // rank check: the served p50 must sit near the true median
      val est = q.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val rows = spark.read.parquet(srcPath)
        .select(col("o_orderstatus"), col("o_totalprice"))
        .collect().map(r => (r.getString(0), r.getDouble(1)))
      est.foreach { case (st, p) =>
        val vs = rows.filter(_._1 == st).map(_._2)
        val below = vs.count(_ <= p).toDouble / vs.length
        assert(math.abs(below - 0.5) <= 0.05 + 2.0 / vs.length,
          s"p50 rank off for $st: $below (est $p)")
      }
    } finally MvRewrite.clear()
  }

  test("sketch scope guards: unregistered columns and filtered aggregates stay on the source") {
    MvRewrite.clear()
    val (kmvDir, qskDir) = buildSketchMvs()
    try {
      // distinct over a column no sketch covers
      val other = spark.read.parquet(srcPath)
        .groupBy(col("o_orderstatus"))
        .agg(approx_count_distinct(col("o_orderkey")).as("d"))
      assert(!scansMv(other, kmvDir) && !scansMv(other, qskDir),
        "o_orderkey has no registered sketch")
      // non-group-column filter disqualifies
      val filtered = spark.read.parquet(srcPath)
        .where(col("o_totalprice") > 1000.0)
        .groupBy(col("o_orderstatus"))
        .agg(approx_count_distinct(col("o_custkey")).as("d"))
      assert(!scansMv(filtered, kmvDir), "non-group filter must disqualify")
      // a GROUP-column filter rewrites (constant within MV groups)
      val gf = spark.read.parquet(srcPath)
        .where(col("o_orderpriority") === "1-URGENT")
        .groupBy(col("o_orderstatus"))
        .agg(approx_count_distinct(col("o_custkey")).as("d"))
      assert(scansMv(gf, kmvDir), "group-column filter must rewrite")
      assert(other.collect().nonEmpty && filtered.collect().nonEmpty &&
        gf.collect().nonEmpty)
    } finally MvRewrite.clear()
  }

  test("count(DISTINCT) rewrites onto an Rbm bitmap MV with VALUE-identical results") {
    import graft.functions.Rbm
    MvRewrite.clear()
    val exact = spark.read.parquet(srcPath)
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dir = TestTmp.dir("rbmv").toString + "/pub"
    MvRewrite.registerSketchSnapshot(spark, srcPath,
      spark.read.parquet(srcPath)
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(Rbm.rbmOf(col("o_custkey")).as("sk"), count(lit(1)).as("n")),
      dir, Seq("o_orderstatus", "o_orderpriority"),
      Map("sk" -> RbmSketchOf("o_custkey"), "n" -> CountStar))
    try {
      val q = spark.read.parquet(srcPath)
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("d"))
      assert(scansMv(q, dir),
        s"plan did not scan the bitmap MV:\n${q.queryExecution.optimizedPlan}")
      q.collect().foreach { r =>
        assert(r.getLong(1) == exact(r.getString(0)),
          s"bitmap-served count(DISTINCT) must be EXACT: $r vs ${exact(r.getString(0))}")
      }
      // a KMV sketch cannot serve an exact count(DISTINCT): with only
      // the approx MV registered, the query stays on the source
      MvRewrite.clear()
      val (kmvDir, _) = buildSketchMvs()
      val q2 = spark.read.parquet(srcPath)
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("d"))
      assert(!scansMv(q2, kmvDir),
        "exact count(DISTINCT) must NOT be served by the approx KMV sketch")
    } finally MvRewrite.clear()
  }

  test("parents above a sketch-rewritten aggregate survive (exprIds preserved)") {
    MvRewrite.clear()
    val (kmvDir, _) = buildSketchMvs()
    try {
      // sort + post-aggregation filter above the rewritten aggregate
      val q = spark.read.parquet(srcPath)
        .groupBy(col("o_orderstatus"))
        .agg(approx_count_distinct(col("o_custkey")).as("d"),
          count(lit(1)).as("n"))
        .where(col("n") > 0L)
        .orderBy(col("d").desc, col("o_orderstatus"))
      assert(scansMv(q, kmvDir),
        s"plan did not scan the sketch MV:\n${q.queryExecution.optimizedPlan}")
      val rows = q.collect()
      assert(rows.nonEmpty)
      // the sort actually applied on the rewritten column
      val ds = rows.map(_.getLong(1)).toSeq
      assert(ds == ds.sortBy(-_), s"not sorted by d desc: $ds")
    } finally MvRewrite.clear()
  }

  test("publishStale: a maintainTx commit after publish flips the stamp; re-publish clears it") {
    import graft.streaming.KmvMv
    MvRewrite.clear()
    val tmp = TestTmp.dir("pubstale")
    val root = tmp.toString + "/mv"
    val pub = tmp.toString + "/pub"
    val src = tmp.toString + "/src"
    val rows = Seq((java.sql.Date.valueOf("2024-01-01"), "a", 1L),
      (java.sql.Date.valueOf("2024-01-01"), "a", 2L))
      .toDF("day", "event_type", "user_id")
    rows.write.parquet(src)
    assert(KmvMv.maintainTx(root, rows, 0L, Seq("event_type", "day"), col("user_id")))
    val schemaOf = Seq.empty[(String, java.sql.Date, Array[Long], Long, Long)]
      .toDF("event_type", "day", "sk", "n", "batch_id")
    def publish(): Unit = MvRewrite.registerSketchSnapshot(spark, src,
      KmvMv.readMv(spark, root, schemaOf)
        .select(col("event_type"), col("day"), col("sk"), col("n")),
      pub, Seq("event_type", "day"),
      Map("sk" -> KmvSketchOf("user_id"), "n" -> CountStar),
      mvRoot = Some(root))
    publish()
    try {
      assert(!MvRewrite.publishStale(spark, pub), "fresh publish must not be stale")
      assert(KmvMv.maintainTx(root,
        Seq((java.sql.Date.valueOf("2024-01-02"), "a", 3L))
          .toDF("day", "event_type", "user_id"),
        1L, Seq("event_type", "day"), col("user_id")))
      assert(MvRewrite.publishStale(spark, pub),
        "a commit past the publish must flip the stamp")
      publish() // refresh loop re-publishes
      assert(!MvRewrite.publishStale(spark, pub), "re-publish must clear staleness")
      // SKETCH agg kinds round-trip the registration manifest: after a
      // registry wipe, registerAll must recover KmvSketchOf/CountStar
      // and the user's literal approx_count_distinct SQL must serve
      // from the snapshot with the exact-below-k values
      MvRewrite.clear()
      assert(MvRewrite.registerAll(spark, pub).nonEmpty,
        "registerAll must recover the sketch-MV registration")
      val q = spark.read.parquet(src)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("d"), count(lit(1)).as("n"))
      assert(scansMv(q, pub), "recovered sketch MV must serve")
      val r = q.collect().head
      assert(r.getLong(1) == 3L && r.getLong(2) == 3L,
        s"recovered sketch rewrite must serve all 3 users, got $r")
    } finally MvRewrite.clear()
  }

  test("async refresh loop: stream -> maintainTx -> publishStale poll -> re-publish; serving tracks the stream") {
    import graft.streaming.KmvMv
    MvRewrite.clear()
    val tmp = TestTmp.dir("mvloop")
    val root = tmp.toString + "/mv"
    val pub = tmp.toString + "/pub"
    val src = tmp.toString + "/src"
    val day = java.sql.Date.valueOf("2024-01-01")
    def batchDf(ids: Range) =
      ids.map(i => (day, "a", i.toLong)).toDF("day", "event_type", "user_id")
    val schemaOf = Seq.empty[(String, java.sql.Date, Array[Long], Long, Long)]
      .toDF("event_type", "day", "sk", "n", "batch_id")
    // the source table the USER queries (grows with the stream; the
    // MV loop's job is to keep the snapshot close behind it)
    def publish(): Unit = MvRewrite.registerSketchSnapshot(spark, src,
      KmvMv.readMv(spark, root, schemaOf)
        .select(col("event_type"), col("day"), col("sk"), col("n")),
      pub, Seq("event_type", "day"),
      Map("sk" -> KmvSketchOf("user_id"), "n" -> CountStar),
      mvRoot = Some(root))
    def served(): (Long, Long) = {
      val q = spark.read.parquet(src)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("d"), count(lit(1)).as("n"))
      assert(scansMv(q, pub), "serving must come from the snapshot")
      val r = q.collect().head
      (r.getLong(1), r.getLong(2))
    }
    try {
      // the async-refresh loop, three micro-batches (disjoint ids —
      // distinct count == row count, so exactness is checkable below k)
      var written = 0
      Seq(0 until 100, 100 until 250, 250 until 450).zipWithIndex.foreach {
        case (ids, i) =>
          val b = batchDf(ids)
          b.write.mode("append").parquet(src)
          written += ids.size
          assert(KmvMv.maintainTx(root, b, i, Seq("event_type", "day"),
            col("user_id")))
          // refresh worker: poll, re-publish only when stale
          if (i == 0 || MvRewrite.publishStale(spark, pub)) publish()
          assert(!MvRewrite.publishStale(spark, pub))
          val (d, n) = served()
          // below k=1024 KMV is exact: the served count tracks the
          // stream precisely after every refresh
          assert(d == written && n == written,
            s"after batch $i: served ($d, $n), want $written")
      }
    } finally MvRewrite.clear()
  }

  // ---- JOIN+AGG MVs (registerJoin / rewriteJoinAgg) ----

  private val custPath = s"$sfDir/customer.parquet"

  private def scanRoots(df: DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    df.queryExecution.optimizedPlan.collect {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.map(_.toUri.getPath)
    }.flatten
  }

  private def assertServedFromJoinMv(df: DataFrame, mvDir: String): Unit = {
    val roots = scanRoots(df)
    val mvp = new org.apache.hadoop.fs.Path(mvDir).toUri.getPath
    assert(roots.exists(_.startsWith(mvp)),
      s"plan must scan the join MV $mvp; scans: $roots")
    Seq(srcPath, custPath).foreach { p =>
      val sp = new org.apache.hadoop.fs.Path(p).toUri.getPath
      assert(!roots.exists(_.startsWith(sp)),
        s"plan must NOT rescan source $sp; scans: $roots")
    }
  }

  /** MV ≡ SELECT c_mktsegment, c_name, count(*), sum/count/min/max(
    * o_totalprice) FROM orders JOIN customer ON o_custkey = c_custkey
    * GROUP BY 1, 2 — built live here (register-time snapshot); the
    * incremental write side is cdc.MaterializedJoin's proof (A31/A32). */
  private def buildJoinMv(): String = {
    val dir = TestTmp.dir("jmv").toString + "/mv"
    spark.read.parquet(srcPath)
      .join(spark.read.parquet(custPath), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("c_name"))
      .agg(count(lit(1)).as("cnt"), sum(col("o_totalprice")).as("total"),
        count(col("o_totalprice")).as("cnt_tp"),
        min(col("o_totalprice")).as("mn"), max(col("o_totalprice")).as("mx"))
      .write.parquet(dir)
    dir
  }

  private def registerJoinMv(mvDir: String): Unit =
    MvRewrite.registerJoin(spark, srcPath, custPath,
      Seq("o_custkey" -> "c_custkey"), mvDir,
      groupCols = Seq("c_mktsegment", "c_name"),
      aggs = Map("cnt" -> CountStar, "total" -> SumOf("o_totalprice"),
        "cnt_tp" -> CountOf("o_totalprice"),
        "mn" -> graft.plans.MvRewrite.MinOf("o_totalprice"),
        "mx" -> MaxOf("o_totalprice")))

  private def joinQuery(): DataFrame =
    spark.read.parquet(srcPath)
      .join(spark.read.parquet(custPath), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("c_name"))
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("s"),
        min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
      .orderBy(col("c_mktsegment"), col("c_name"))

  test("join MV: exact group-set match serves the literal join from the MV; neither source scanned") {
    MvRewrite.clear()
    val baseline = joinQuery().collect().toSeq // registry empty → live join
    val mvDir = buildJoinMv()
    registerJoinMv(mvDir)
    try {
      val q = joinQuery()
      assertServedFromJoinMv(q, mvDir)
      // exact match: no join and no re-aggregation survive
      val phys = q.queryExecution.executedPlan.toString
      assert(!phys.contains("Join"), s"rewritten plan must not join:\n$phys")
      assert(!phys.contains("HashAggregate"),
        "exact-match join rewrite should be aggregate-free")
      assert(q.collect().toSeq == baseline)
    } finally MvRewrite.clear()
  }

  test("join MV: rollup to a coarser group + avg decomposition; commuted join order matches") {
    MvRewrite.clear()
    def rollup(): DataFrame =
      // deliberately written CUSTOMER JOIN ORDERS — the registered
      // orientation is orders ⋈ customer; inner join commutes
      spark.read.parquet(custPath)
        .join(spark.read.parquet(srcPath), col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), avg(col("o_totalprice")).as("a"))
        .orderBy(col("c_mktsegment"))
    val baseline = rollup().collect().toSeq
    val mvDir = buildJoinMv()
    registerJoinMv(mvDir)
    try {
      val q = rollup()
      assertServedFromJoinMv(q, mvDir)
      val got = q.collect().toSeq
      assert(got.size == baseline.size)
      got.zip(baseline).foreach { case (g, b) =>
        assert(g.getString(0) == b.getString(0))
        assert(g.getLong(1) == b.getLong(1))
        // avg via Σsum/Σcount differs from the raw-row avg only in FP
        // association (same freedom Spark's partial aggregation has)
        assert(math.abs(g.getDouble(2) - b.getDouble(2)) <=
          1e-9 * math.abs(b.getDouble(2)), s"avg drift: $g vs $b")
      }
    } finally MvRewrite.clear()
  }

  test("join MV: group-column side filter rewrites; guards hold the rest on the source") {
    MvRewrite.clear()
    val mvDir = buildJoinMv()
    registerJoinMv(mvDir)
    try {
      // side filter on an MV group column (constant per group) → serve
      val filtered = spark.read.parquet(srcPath)
        .join(spark.read.parquet(custPath).where(col("c_mktsegment") === "BUILDING"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_name"))
        .agg(count(lit(1)).as("n"))
      assertServedFromJoinMv(filtered, mvDir)
      MvRewrite.clear(); registerJoinMv(mvDir)
      val nBase = spark.read.parquet(srcPath)
        .join(spark.read.parquet(custPath), col("o_custkey") === col("c_custkey"))
        .where(col("c_mktsegment") === "BUILDING")
      // guards — each must keep scanning the sources:
      def scansSources(df: DataFrame): Boolean = {
        val roots = scanRoots(df)
        val sp = new org.apache.hadoop.fs.Path(srcPath).toUri.getPath
        roots.exists(_.startsWith(sp))
      }
      // (a) filter on a NON-group column
      val g1 = spark.read.parquet(srcPath).where(col("o_orderstatus") === "F")
        .join(spark.read.parquet(custPath), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_name")).agg(count(lit(1)).as("n"))
      assert(scansSources(g1), "non-group filter must disqualify")
      // (b) a different key set (extra equi term)
      val g2 = spark.read.parquet(srcPath)
        .join(spark.read.parquet(custPath),
          col("o_custkey") === col("c_custkey") && col("o_custkey") === col("c_nationkey"))
        .groupBy(col("c_name")).agg(count(lit(1)).as("n"))
      assert(scansSources(g2), "different equi-key set must disqualify")
      // (c) non-inner join
      val g3 = spark.read.parquet(srcPath)
        .join(spark.read.parquet(custPath),
          col("o_custkey") === col("c_custkey"), "left")
        .groupBy(col("c_name")).agg(count(lit(1)).as("n"))
      assert(scansSources(g3), "outer join must disqualify")
      // (d) an aggregate the MV does not store
      val g4 = spark.read.parquet(srcPath)
        .join(spark.read.parquet(custPath), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_name")).agg(sum(col("o_orderkey")).as("s"))
      assert(scansSources(g4), "unregistered aggregate must disqualify")
      // sanity: the filtered rewrite's values match the live join
      val got = filtered.orderBy(col("c_name")).collect().toSeq
      val want = nBase.groupBy(col("c_name")).agg(count(lit(1)).as("n"))
        .orderBy(col("c_name")).collect().toSeq
      assert(got == want)
    } finally MvRewrite.clear()
  }

  test("star MV (3 tables): any join order/parenthesization matches; 2-table MVs don't") {
    MvRewrite.clear()
    val liPath = s"$sfDir/lineitem.parquet"
    def li = spark.read.parquet(liPath)
    def o = spark.read.parquet(srcPath)
    def c = spark.read.parquet(custPath)
    val mvDir = TestTmp.dir("smv").toString + "/mv"
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("qty"))
      .write.parquet(mvDir)
    MvRewrite.registerJoin(spark, Seq(liPath, srcPath, custPath),
      Seq("l_orderkey" -> "o_orderkey", "o_custkey" -> "c_custkey"), mvDir,
      groupCols = Seq("c_mktsegment", "o_orderstatus"),
      aggs = Map("cnt" -> CountStar, "qty" -> SumOf("l_quantity")))
    try {
      // shape 1: (li ⋈ o) ⋈ c, registered orientation
      val s1 = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      // shape 2: c ⋈ (o ⋈ li), opposite nesting, flipped key sides,
      // ROLLUP grain
      val s2 = c.join(o.join(li, col("o_orderkey") === col("l_orderkey")),
          col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      val base1 = { MvRewrite.clear(); s1.orderBy(col("c_mktsegment"),
        col("o_orderstatus")).collect().toSeq }
      val base2 = s2.orderBy(col("c_mktsegment")).collect().toSeq
      MvRewrite.registerJoin(spark, Seq(liPath, srcPath, custPath),
        Seq("l_orderkey" -> "o_orderkey", "o_custkey" -> "c_custkey"), mvDir,
        groupCols = Seq("c_mktsegment", "o_orderstatus"),
        aggs = Map("cnt" -> CountStar, "qty" -> SumOf("l_quantity")))
      def mvOnly(df: DataFrame): Unit = {
        val roots = scanRoots(df)
        val mvp = new org.apache.hadoop.fs.Path(mvDir).toUri.getPath
        assert(roots.exists(_.startsWith(mvp)), s"must scan star MV; got $roots")
        Seq(liPath, srcPath, custPath).foreach { p =>
          val sp = new org.apache.hadoop.fs.Path(p).toUri.getPath
          assert(!roots.exists(_.startsWith(sp)), s"must not rescan $sp")
        }
      }
      mvOnly(s1); mvOnly(s2)
      assert(s1.orderBy(col("c_mktsegment"), col("o_orderstatus"))
        .collect().toSeq == base1)
      assert(s2.orderBy(col("c_mktsegment")).collect().toSeq == base2)
      // a 2-table sub-join of the star must NOT match the 3-table MV
      val sub = o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      val subRoots = scanRoots(sub)
      val sp = new org.apache.hadoop.fs.Path(srcPath).toUri.getPath
      assert(subRoots.exists(_.startsWith(sp)),
        "2-table query must stay on its sources")
    } finally MvRewrite.clear()
  }

  // ---- versioned publish lifecycle + durable registrations ----

  private def genDirs(base: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(base)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSet
  }

  private def mvAggFrame(): DataFrame =
    spark.read.parquet(srcPath)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), sum(col("o_totalprice")).as("total"))

  test("versioned publish: retention keyed to the SERVING generation; failed publish deletes its own dir") {
    MvRewrite.clear()
    val pub = TestTmp.dir("pubgc").toString + "/pub"
    def publish(): Unit = MvRewrite.registerSketchSnapshot(spark, srcPath,
      mvAggFrame(), pub, Seq("o_orderstatus", "o_orderpriority"),
      Map("cnt" -> CountStar, "total" -> SumOf("o_totalprice")))
    try {
      publish()
      assert(genDirs(pub) == Set("v1"))
      publish() // v1 is the just-deregistered serving gen: retained
      assert(genDirs(pub) == Set("v1", "v2"))
      publish() // v1's readers are a full cycle old: GC'd
      assert(genDirs(pub) == Set("v2", "v3"))
      // a publish that FAILS (unstamped mvRoot → no committed MV)
      // must delete its own half-written generation dir — leaving it
      // would make a later publish retain the dead dir and GC the one
      // in-flight readers were planned against (r14 advice, medium)
      intercept[IllegalStateException] {
        MvRewrite.registerSketchSnapshot(spark, srcPath, mvAggFrame(), pub,
          Seq("o_orderstatus", "o_orderpriority"), Map("cnt" -> CountStar),
          mvRoot = Some(pub + "/no-such-root"))
      }
      assert(genDirs(pub) == Set("v2", "v3"),
        "failed publish must not leave an orphan generation")
      publish() // next publish: serving was v3 → keep {v3, v4}
      assert(genDirs(pub) == Set("v3", "v4"))
    } finally MvRewrite.clear()
  }

  test("registerAll: a restarted session recovers table AND join MVs from on-disk manifests") {
    MvRewrite.clear()
    val root = TestTmp.dir("mvreg").toString
    val tPub = root + "/t/pub"
    val jPub = root + "/j/pub"
    MvRewrite.registerSketchSnapshot(spark, srcPath, mvAggFrame(), tPub,
      Seq("o_orderstatus", "o_orderpriority"),
      Map("cnt" -> CountStar, "total" -> SumOf("o_totalprice")))
    val joinMv = spark.read.parquet(srcPath)
      .join(spark.read.parquet(custPath), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"), sum(col("o_totalprice")).as("total"))
    MvRewrite.registerJoinSnapshot(spark, Seq(srcPath, custPath),
      Seq("o_custkey" -> "c_custkey"), joinMv, jPub,
      Seq("c_mktsegment"),
      Map("cnt" -> CountStar, "total" -> SumOf("o_totalprice")))
    try {
      def tableQ(): DataFrame = spark.read.parquet(srcPath)
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("s"))
        .orderBy(col("o_orderstatus"), col("o_orderpriority"))
      def joinQ(): DataFrame = spark.read.parquet(srcPath)
        .join(spark.read.parquet(custPath), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("s"))
        .orderBy(col("c_mktsegment"))
      val (tWant, jWant) = {
        MvRewrite.clear() // baselines off the raw sources
        (tableQ().collect().toSeq, joinQ().collect().toSeq)
      }
      // ---- simulated restart: registries empty, manifests on disk
      MvRewrite.clear()
      val recovered = MvRewrite.registerAll(spark, root)
      assert(recovered.map(new org.apache.hadoop.fs.Path(_).getName).toSet ==
        Set("pub"), s"expected both pub dirs recovered, got $recovered")
      assert(recovered.size == 2)
      val tq = tableQ()
      assert(scansMv(tq, tPub), "recovered table MV must serve")
      assert(tq.collect().toSeq == tWant)
      val jq = joinQ()
      assert(scansMv(jq, jPub), "recovered join MV must serve")
      Seq(srcPath, custPath).foreach { p =>
        val sp = new org.apache.hadoop.fs.Path(p).toUri.getPath
        assert(!scanRoots(jq).exists(_.startsWith(sp)),
          s"recovered join MV must not rescan $sp")
      }
      assert(jq.collect().toSeq == jWant)
      // a publish AFTER recovery must retain the recovered serving
      // generation (prevServing read back from the manifest when the
      // in-memory registry was reset)
      MvRewrite.clear()
      assert(MvRewrite.registerAll(spark, tPub).nonEmpty)
      MvRewrite.registerSketchSnapshot(spark, srcPath, mvAggFrame(), tPub,
        Seq("o_orderstatus", "o_orderpriority"),
        Map("cnt" -> CountStar, "total" -> SumOf("o_totalprice")))
      assert(genDirs(tPub) == Set("v1", "v2"),
        "re-publish after restart must retain the recovered serving gen")
    } finally MvRewrite.clear()
  }

  test("top-k MV: TOPN window queries serve from the MV; guards hold mismatches on the source") {
    import org.apache.spark.sql.expressions.Window
    MvRewrite.clear()
    val dir = TestTmp.dir("tkmv").toString
    val srcP = dir + "/src"
    val mvP = dir + "/mv"
    Seq(("a", 1L, 10.0), ("a", 2L, 9.0), ("a", 3L, 8.0), ("a", 4L, 7.0),
      ("a", 5L, 6.0), ("b", 6L, 5.0), ("b", 7L, 4.0), ("b", 8L, 3.0),
      ("b", 9L, 2.0)).toDF("g", "k", "v").write.parquet(srcP)
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("k").asc)
    spark.read.parquet(srcP).withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3).drop("rn").write.parquet(mvP)
    spark.read.parquet(srcP).createOrReplaceTempView("tk_src")

    val full = """SELECT g, k, v, rnk FROM (SELECT g, k, v,
      row_number() OVER (PARTITION BY g ORDER BY v DESC, k) AS rnk
      FROM tk_src) WHERE rnk <= 3"""
    val tight = full.replace("rnk <= 3", "rnk <= 2")
    val over = full.replace("rnk <= 3", "rnk <= 4")       // exceeds k — must stay on source
    val asc = full.replace("v DESC", "v ASC")             // wrong order — must stay on source
    val extra = full.replace("WHERE rnk <= 3", "WHERE rnk <= 3 AND v > 4.5")
    val partF = full.replace("WHERE rnk <= 3", "WHERE g = 'a' AND rnk <= 2")

    def rows(sql: String) = spark.sql(sql)
      .as[(String, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    // baselines with the registry EMPTY — the source is the truth
    val base = Map(full -> rows(full), tight -> rows(tight), over -> rows(over),
      asc -> rows(asc), extra -> rows(extra), partF -> rows(partF))

    try {
      MvRewrite.registerTopK(spark, srcP, mvP, Seq("g"), Seq("k"), "v", 3)
      def check(sql: String, viaMv: Boolean, label: String): Unit = {
        val df = spark.sql(sql)
        assert(scansMv(df, mvP) == viaMv, s"$label: MV-scan should be $viaMv")
        assert(scansMv(df, srcP) == !viaMv, s"$label: source-scan should be ${!viaMv}")
        assert(rows(sql) == base(sql), s"$label: values must match the source truth")
      }
      check(full, viaMv = true, "full-k TOPN")
      check(tight, viaMv = true, "tighter bound")
      check(extra, viaMv = true, "extra post-rank conjunct")
      check(partF, viaMv = true, "partition-column filter below the window")
      check(over, viaMv = false, "bound beyond k")
      check(asc, viaMv = false, "wrong sort direction")
      assert(base(full).size == 6 && base(tight).size == 4 && base(over).size == 8)
    } finally MvRewrite.clear()
  }

  test("top-k MV rewrite: rank()/dense_rank() tie discipline") {
    import org.apache.spark.sql.expressions.Window
    MvRewrite.clear()
    val dir = TestTmp.dir("tkrank").toString
    val srcP = dir + "/src"
    val mvP = dir + "/mv"
    // group "a" carries a FOUR-WAY tie at the top that CROSSES the
    // k=3 boundary: rank() without a key tie-break gives ranks
    // 1,1,1,1,5 — rnk<=3 admits FOUR rows, one of which (key 4) the
    // 3-row MV does not store. The exact failure the guard prevents.
    Seq(("a", 1L, 10.0), ("a", 2L, 10.0), ("a", 3L, 10.0), ("a", 4L, 10.0),
      ("a", 5L, 7.0), ("b", 6L, 5.0), ("b", 7L, 4.0), ("b", 8L, 3.0))
      .toDF("g", "k", "v").write.parquet(srcP)
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("k").asc)
    spark.read.parquet(srcP).withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3).drop("rn").write.parquet(mvP)
    spark.read.parquet(srcP).createOrReplaceTempView("tkr_src")

    // full registered order (v DESC, k ASC) = a TOTAL order over the
    // group's unique keys → rank ≡ dense_rank ≡ row_number: tie-safe
    val rankTotal = """SELECT g, k, v, rnk FROM (SELECT g, k, v,
      rank() OVER (PARTITION BY g ORDER BY v DESC, k) AS rnk
      FROM tkr_src) WHERE rnk <= 3"""
    val denseTotal = rankTotal.replace("rank()", "dense_rank()")
    // PARTIAL order (value only): boundary ties admit > k rows — the
    // k-row MV cannot serve this; must stay on the source scan
    val rankPartial = """SELECT g, k, v, rnk FROM (SELECT g, k, v,
      rank() OVER (PARTITION BY g ORDER BY v DESC) AS rnk
      FROM tkr_src) WHERE rnk <= 3"""
    // nondeterministic predicate BELOW the window: its reference set
    // is empty (group-column forall is vacuous) but re-evaluating it
    // over MV rows selects a different population — must not rewrite
    val nondet = """SELECT g, k, v, rnk FROM (SELECT g, k, v,
      row_number() OVER (PARTITION BY g ORDER BY v DESC, k) AS rnk
      FROM (SELECT * FROM tkr_src WHERE rand() < 0.999999)) WHERE rnk <= 3"""

    def rows(sql: String) = spark.sql(sql)
      .as[(String, Long, Double, Int)].collect().sortBy(r => (r._1, r._4, r._2)).toSeq
    val base = Map(rankTotal -> rows(rankTotal), denseTotal -> rows(denseTotal),
      rankPartial -> rows(rankPartial), nondet -> rows(nondet))
    // sanity-pin the danger shape: the partial-order rank admits FOUR
    // "a" rows (> k = 3) — key 4 is absent from the MV, so a rewrite
    // here would silently drop it
    assert(base(rankPartial).count(_._1 == "a") == 4)
    assert(base(rankPartial).exists(r => r._1 == "a" && r._2 == 4L))

    try {
      MvRewrite.registerTopK(spark, srcP, mvP, Seq("g"), Seq("k"), "v", 3)
      def check(sql: String, viaMv: Boolean, label: String): Unit = {
        val df = spark.sql(sql)
        assert(scansMv(df, mvP) == viaMv, s"$label: MV-scan should be $viaMv")
        assert(scansMv(df, srcP) == !viaMv, s"$label: source-scan should be ${!viaMv}")
        assert(rows(sql) == base(sql), s"$label: values must match the source truth")
      }
        check(rankTotal, viaMv = true, "rank() with full key tie-break")
      check(denseTotal, viaMv = true, "dense_rank() with full key tie-break")
      check(rankPartial, viaMv = false, "rank() without key tie-break (tie-unsafe)")
      check(nondet, viaMv = false, "nondeterministic filter below the window")
    } finally MvRewrite.clear()
  }

  test("top-k MV: versioned publish, restart recovery, retained serving generation") {
    import org.apache.spark.sql.expressions.Window
    MvRewrite.clear()
    val dir = TestTmp.dir("tkpub").toString
    val srcP = dir + "/src"
    val pub = dir + "/pub"
    Seq(("a", 1L, 10.0), ("a", 2L, 9.0), ("a", 3L, 8.0), ("a", 4L, 7.0),
      ("b", 6L, 5.0), ("b", 7L, 4.0), ("b", 8L, 3.0))
      .toDF("g", "k", "v").write.parquet(srcP)
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("k").asc)
    def mvFrame(): DataFrame = spark.read.parquet(srcP)
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 3).drop("rn")
    spark.read.parquet(srcP).createOrReplaceTempView("tk_pub_src")
    val sql = """SELECT g, k, v, rnk FROM (SELECT g, k, v,
      row_number() OVER (PARTITION BY g ORDER BY v DESC, k) AS rnk
      FROM tk_pub_src) WHERE rnk <= 3"""
    def rows() = spark.sql(sql)
      .as[(String, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    val want = rows() // registry empty → source truth
    try {
      MvRewrite.registerTopKSnapshot(spark, srcP, mvFrame(), pub,
        Seq("g"), Seq("k"), "v", 3)
      assert(scansMv(spark.sql(sql), pub) && rows() == want)
      // ---- simulated restart: registry empty, manifest on disk
      MvRewrite.clear()
      assert(!scansMv(spark.sql(sql), pub), "cleared registry must fall back to source")
      assert(MvRewrite.registerAll(spark, dir).nonEmpty,
        "registerAll must recover the top-k manifest")
      assert(scansMv(spark.sql(sql), pub), "recovered top-k MV must serve")
      assert(rows() == want)
      // a publish AFTER recovery retains the recovered serving gen
      MvRewrite.registerTopKSnapshot(spark, srcP, mvFrame(), pub,
        Seq("g"), Seq("k"), "v", 3)
      assert(genDirs(pub) == Set("v1", "v2"),
        "re-publish after restart must retain the recovered serving gen")
      val df = spark.sql(sql)
      assert(scanRoots(df).exists(_.contains("/v2")), "fresh publish must serve v2")
      assert(rows() == want)
    } finally MvRewrite.clear()
  }
}
