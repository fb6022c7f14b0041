package graft

import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan assertions: the scale claims in SURVEY §4 must be
  * visible in the plans, not just asserted in prose.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.explainString(FormattedMode)

  test("driver contract: entry() returns rows on the smoke corpus") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q_filter_pushdown: predicates reach the parquet scan, projection is narrow") {
    val p = plan("q_filter_pushdown")
    assert(p.contains("PushedFilters:"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate") || p.contains("IsNotNull(l_shipdate"))
    // scan must read only the 4 referenced columns
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(Seq("l_quantity", "l_extendedprice", "l_discount", "l_shipdate")
      .forall(read.contains))
    assert(!read.contains("l_orderkey") && !read.contains("l_returnflag"))
  }

  test("q5_region_revenue: dimension joins broadcast, supplier included") {
    val p = plan("q5_region_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2)
    // the executed (AQE-final) plan must ALSO broadcast supplier — the
    // plan you want at 100x: only lineitem⋈orders⋈customer shuffles
    val df = SparkEntry.queries("q5_region_revenue")(spark, sfDir)
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(executed).size >= 3,
      s"supplier not broadcast:\n$executed")
  }

  test("q_top_orders: ORDER BY + LIMIT plans as TakeOrderedAndProject (no global sort)") {
    val p = plan("q_top_orders")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("cdc_upsert_latest: compaction is one aggregation with a partial (map-side) phase, no window") {
    val p = plan("cdc_upsert_latest")
    // struct-buffer max_by plans as SortAggregate (local sorts only);
    // what matters at scale: partial aggregation before the exchange,
    // and no row_number window formulation
    assert(p.contains("partial_max_by"))
    assert(!p.contains("Window"))
  }

  test("dedup_keep_best: per-cluster argmax aggregates with a partial phase, no corpus window") {
    val p = plan("dedup_keep_best")
    assert(p.contains("partial_max_by"))
    assert(!p.contains("Window"))
  }

  test("dedup_embedding: cosine uses the native double_dot expression, not HOF lambdas") {
    val p = plan("dedup_embedding")
    assert(p.contains("double_dot("))
    assert(!p.contains("lambdafunction"))
  }

  test("q1_pricing_summary: aggregation runs inside whole-stage codegen") {
    // AQE finalizes the physical plan only on execution; the executed
    // plan then shows WholeStageCodegen spans
    val df = SparkEntry.queries("q1_pricing_summary")(spark, sfDir)
    df.collect()
    // codegen spans print as *(n) in the executed-plan tree
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("))
    assert(p.contains("HashAggregate"))
  }

  test("q_asof_native: custom operator plans as AsOfJoinExec with one exchange+sort per side") {
    val p = plan("q_asof_native")
    assert(p.contains("AsOfJoin"))
    // EnsureRequirements satisfies the declared distribution/ordering:
    // one exchange + sort per child feeding the merge (plus the final
    // output ordering's own exchange)
    assert("Exchange".r.findAllIn(p).size >= 3)
    assert("Sort".r.findAllIn(p).size >= 3)
  }

  test("as-of join: null keys/times join nothing, non-long types fail fast") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.plans.AsOfJoin
    val l = Seq((Some(1L), Some(10L), "l1"), (None, Some(10L), "lnull"),
      (Some(1L), None, "ltnull"), (Some(2L), Some(5L), "l2"))
      .toDF("k", "t", "tag")
    val r = Seq((Some(1L), Some(9L), 1L, "r1"), (None, Some(1L), 2L, "rnull"),
      (Some(2L), Some(7L), 3L, "r2"))
      .toDF("k", "t", "seq", "v")
    val out = AsOfJoin.join(l, r, col("k"), col("k"), col("t"), col("t"), col("seq"))
      .select(col("tag"), col("v")).as[(String, Option[String])].collect().toMap
    // null left key/time → left-outer null right, no NPE; null right
    // keys are skipped; l2's time 5 predates r2's 7 → no match
    assert(out == Map("l1" -> Some("r1"), "lnull" -> None,
      "ltnull" -> None, "l2" -> None))
    val bad = intercept[IllegalArgumentException] {
      AsOfJoin.join(l.withColumn("k", col("k").cast("int")), r,
        col("k"), col("k"), col("t"), col("t"), col("seq"))
    }
    assert(bad.getMessage.contains("LongType or TimestampType"))
  }

  test("envelope roundtrip parses JSON exactly once (Opaque barrier holds)") {
    // regression lock for the r2 headline fix: without the barrier,
    // PushDownPredicates substitutes from_json into the tombstone
    // filter and the codec runs 3x per row below the repartition
    val df = SparkEntry.queries("cdc_envelope_roundtrip")(spark, sfDir)
    val n = df.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.map(_.collect {
        case e if e.getClass.getSimpleName == "JsonToStructs" => e
      }.size).sum
    }.sum
    assert(n == 1, s"expected exactly 1 from_json in the optimized plan, found $n")
  }

  test("plan audit: no query plans a CartesianProduct") {
    // broadcast nested-loop joins (small side broadcast) are fine;
    // an unbroadcast cartesian product is always a scale bug
    val offenders = SparkEntry.queries.keys.toSeq.sorted.filter { name =>
      val p = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      p.contains("CartesianProduct")
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("topk window queries get Catalyst's rank-limit pushdown (WindowGroupLimit)") {
    // the rank<=k filter becomes a bounded per-partition top-k BEFORE
    // the shuffle — no hand-built operator needed
    val p = plan("ann_topk_bruteforce")
    assert(p.contains("WindowGroupLimit"))
  }

  test("bounded top-k aggregator has a map-side partial phase") {
    val p = plan("ann_topk_agg")
    assert(p.contains("partial_topkby"),
      s"top-k buffers should merge before the exchange:\n$p")
  }

  test("heavy hitters: sketch aggregates map-side, candidate join broadcasts") {
    val p = plan("q_heavy_hitters")
    // partial MG runs before the exchange — the shuffle carries ≤ k
    // counters per partition, never the token stream
    assert(p.contains("partial_heavyhitters"), s"no map-side sketch phase:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"candidate set should broadcast:\n$p")
  }

  test("correlated scalar subqueries decorrelate to aggregate joins") {
    val p = plan("q_correlated_subquery")
    // per-row subquery execution would surface as ScalarSubquery in
    // the physical plan; Catalyst's rewrite leaves joins + aggregates
    assert(!p.contains("ScalarSubquery"), s"subquery not decorrelated:\n$p")
    assert(p.contains("HashAggregate") &&
      (p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")))
  }

  test("text_bm25: the query-term filter runs before the first exchange") {
    val p = SparkEntry.queries("text_bm25")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val filterAt = p.linesIterator.zipWithIndex
      .find { case (l, _) => l.contains("Filter") && l.contains("IN (scan") }
    assert(filterAt.isDefined, s"query-term IN filter missing:\n$p")
    // the filter's subtree must contain the scan directly — i.e. no
    // Exchange between the token explode and the term filter
    val below = p.linesIterator.drop(filterAt.get._2).takeWhile(!_.contains("Exchange"))
    assert(below.exists(_.contains("Scan parquet") ),
      s"term filter should sit on the scan side of the first exchange:\n$p")
  }

  test("mix_apply: one window pass does the row-scale work") {
    val p = SparkEntry.queries("mix_apply")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.linesIterator.count(_.contains("Window [")) == 1,
      s"expected exactly one Window operator:\n$p")
  }

  test("sliding-window chunking is shuffle-free") {
    import org.apache.spark.sql.functions.col
    val p = graft.ops.Packing.chunkSliding(Tables.documents(spark, sfDir),
        col("doc_id"), col("text"), chunkTokens = 64, stride = 48)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"chunking should stay row-local:\n$p")
  }

  test("quality_classifier: the model never materializes — join-free single aggregation") {
    val p = SparkEntry.queries("quality_classifier")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"bucket weights must be expressions, not a joined table:\n$p")
    // one partial + one final hash aggregate pair (plus nothing else)
    assert(p.linesIterator.count(_.contains("HashAggregate")) == 2,
      s"expected exactly the partial+final agg pair:\n$p")
  }

  test("embed_project: row-local literal-plane projection, no exchange before the sort") {
    import org.apache.spark.sql.functions.col
    val p = graft.ops.Similarity.projectSigns(Tables.embeddings(spark, sfDir),
        col("vec_id"), col("embedding"), outDims = 16, inDims = 64)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"projection should be fully row-local:\n$p")
    assert(p.contains("double_dot"), s"dots should use the native expression:\n$p")
  }

  test("q_sequence_count: working set filtered to pattern-typed events before the shuffle") {
    val p = SparkEntry.queries("q_sequence_count")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val filterAt = p.linesIterator.zipWithIndex
      .find { case (l, _) => l.contains("Filter") && l.contains("event_type") }
    assert(filterAt.isDefined, s"event-type filter missing:\n$p")
    val below = p.linesIterator.drop(filterAt.get._2).takeWhile(!_.contains("Exchange"))
    assert(below.exists(_.contains("Scan parquet")),
      s"the type filter should sit on the scan side of the exchange:\n$p")
  }

  test("runtime bloom-filter injection prunes the fact scan under a selective dim join") {
    // Catalyst's InjectRuntimeFilter (the engine's own semi-join
    // reduction, StarRocks' runtime filter analogue): with the rule
    // enabled, a selective filter on the build side materializes a
    // bloom filter that is pushed into the PROBE side's scan filter as
    // might_contain — fact rows with no join partner die at the scan,
    // before the shuffle. This is the 100 TB plan shape for selective
    // star joins; the suite's default threshold settings leave it to
    // AQE, this test pins that the engine delivers it when asked.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val fact = Tables.lineitem(spark, sfDir)
      val dim = Tables.orders(spark, sfDir)
        .where(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
      val p = fact.join(dim,
          fact("l_orderkey") === dim("o_orderkey"))
        .queryExecution.executedPlan.toString
      assert(p.contains("might_contain"),
        s"no runtime bloom filter on the probe side:\n${p.take(1200)}")
      assert(p.contains("bloom_filter_agg"),
        s"no bloom filter built from the dim side:\n${p.take(1200)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
