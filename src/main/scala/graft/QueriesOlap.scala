package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Rounding
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{MapType, StringType}
import graft.ops.Funnel

/** OLAP query surface (SURVEY §2 section B) — the analytics StarRocks
  * serves over the CDC-materialized tables, expressed Spark-first:
  * declarative plans, broadcast dim joins, pushdown-friendly scans.
  */
object QueriesOlap {

  private val TsFmt = "yyyy-MM-dd HH:mm:ss"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // B1: TPC-H Q1-style pricing summary
    "q1_pricing_summary" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Rounding.r(sum(col("l_quantity")), 2).as("sum_qty"),
          Rounding.r(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          Rounding.r(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          Rounding.r(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          Rounding.r(avg(col("l_quantity")), 4).as("avg_qty"),
          Rounding.r(avg(col("l_extendedprice")), 4).as("avg_price"),
          Rounding.r(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // B2: top unshipped orders by revenue (TPC-H Q3 shape)
    "q3_top_unshipped" -> { (s, dir) =>
      val c = Tables.customer(s, dir).where(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir).where(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val l = Tables.lineitem(s, dir).where(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
        .orderBy(col("rev").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), TsFmt).as("o_orderdate"),
          Rounding.r(col("rev"), 2).as("revenue"))
    },

    // B3: revenue by nation within a region (TPC-H Q5 star join;
    // nation/region broadcast to every executor — no shuffle for dims)
    "q5_region_revenue" -> { (s, dir) =>
      val r = Tables.region(s, dir).where(col("r_name") === "ASIA")
      val n = Tables.nation(s, dir)
      val c = Tables.customer(s, dir)
      val sup = Tables.supplier(s, dir)
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        // money in exact integer 1e-4 units: l_extendedprice/l_discount
        // are 2dp, so floor(x·100+0.5) recovers exact cents/basis-points
        // and the sum is an associative integer — the double-sum form
        // diverged from the oracle by one cent at sf1 (6M rows), where
        // FP summation order crosses the 2dp boundary. Decimal(38,0)
        // accumulation never overflows at any corpus size.
        .agg(Rounding.r(
          sum((floor(col("l_extendedprice") * 100 + 0.5) *
            (lit(100L) - floor(col("l_discount") * 100 + 0.5)))
            .cast(org.apache.spark.sql.types.DecimalType(28, 0)))
            .cast("double") / 1e4, 2).as("revenue"))
        .orderBy(col("n_name"))
    },

    // B4: ORDER BY … DESC LIMIT k (reference's verification query;
    // plans as TakeOrderedAndProject — no global sort)
    "q_top_orders" -> { (s, dir) =>
      Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
    },

    // B75: TPC-H Q18 (large-volume customers) — the HAVING-subquery
    // semi-join shape: orders whose total lineitem quantity clears a
    // threshold, joined back to customer, top-100 by price. The
    // aggregate-then-join plans as one orderkey-keyed shuffle that the
    // orders join reuses (co-keyed); quantity sums are integer-valued
    // doubles ≤ a few hundred, so Σ is exact in any order and the
    // HAVING branch replays bit-identically
    "q_large_orders" -> { (s, dir) =>
      val big = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .where(col("sum_qty") > 150)
      Tables.orders(s, dir)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), TsFmt).as("o_orderdate"),
          Rounding.r(col("o_totalprice"), 2).as("o_totalprice"),
          Rounding.r(col("sum_qty"), 2).as("sum_qty"))
    },

    // B76: TPC-H Q21-SHAPED (suppliers who kept orders waiting) — the
    // double-correlated EXISTS/NOT-EXISTS shape, expressed as one
    // per-order distinct-supplier profile instead of two correlated
    // subquery rescans. NOT spec-Q21: the synthetic lineitem has no
    // l_receiptdate/l_commitdate, so the lateness predicate here is
    // shipdate > orderdate + 90 days, and the o_orderstatus='F' +
    // nation filters are dropped (the oracle replays this exact
    // variant). The preserved part is the SHAPE: a supplier "kept the
    // order waiting" when its line was late, the order involved ≥ 2
    // suppliers, and NO other supplier was late. One orderkey shuffle
    // builds the profile; the late pairs semi-join it
    "q_waiting_supplier" -> { (s, dir) =>
      val lo = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("late"))
      // one (order, supplier) pre-aggregate replaces BOTH the
      // two-countDistinct Expand (2× the join's rows) and the second
      // full pass over the join (the old `late` branch re-joined
      // lineitem ⋈ orders, then paid its own distinct): per pair,
      // `late` = any late row; the per-order counts and the
      // late-pairs frame are then cheap rollups of the SAME exchange,
      // which Spark's ReuseExchange computes once (guide §2.3/§2.4).
      // countDistinct(suppkey) ≡ count(*) over the pair frame and
      // countDistinct(when(late, suppkey)) ≡ Σ[late] over it, so the
      // output is row-identical to the previous form.
      val pairs = lo.groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(col("late")).as("late"))
      val perOrder = pairs.groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_supp"),
          sum(when(col("late"), 1L).otherwise(0L)).as("n_late"))
      pairs.where(col("late")).select(col("l_orderkey"), col("l_suppkey"))
        .join(perOrder.where(col("n_supp") >= 2 && col("n_late") === 1),
          Seq("l_orderkey"))
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("l_suppkey"))
    },

    // B77: TPC-H Q17 (small-quantity-order revenue) — the correlated
    // scalar subquery ON THE FACT TABLE itself: keep a lineitem only
    // when its quantity is below 0.2 × that part's own average
    // quantity. Written as the literal correlated SQL users write;
    // Catalyst's RewriteCorrelatedScalarSubquery decorrelates it into
    // ONE per-part aggregate joined back to the fact scan — per-part
    // thresholds shuffle 2 small columns once, never a per-row
    // rescan of lineitem (the naive plan is O(|lineitem|²/|part|)).
    // Grouped by brand (the spec's single Brand#/container filter is
    // a point lookup on the synthetic corpus; grouping pins the same
    // decorrelation over every part). FP-FREE by construction (r16
    // verdict: 63 sf0.1 rows tie `0.2·avg` EXACTLY, so any 1-ulp avg
    // divergence flips membership): the threshold compare is the
    // exact BIGINT cross-multiplication `5·n·qty < Σqty` (qty is
    // integer-valued; multiplying `qty < 0.2·Σ/n` through by 5n > 0
    // is an equivalence over the rationals — no divide, no 0.2), and
    // avg_yearly is integer round-half-up of cents/7
    // (`(2·Σcents + 7) div 14`) with ONE final exact-input /100.0.
    // The correlated scalar returns the (n, Σqty) pair as a single
    // struct so Catalyst decorrelates to ONE per-part aggregate
    // joined back to the fact scan — not two.
    "q_small_qty_revenue" -> { (s, dir) =>
      Tables.lineitem(s, dir).createOrReplaceTempView("q17_lineitem")
      Tables.part(s, dir).createOrReplaceTempView("q17_part")
      s.sql("""
        SELECT p_brand, COUNT(*) AS n_small,
          CAST(SUM(cents) AS BIGINT) AS sum_cents,
          (2 * SUM(cents) + 7) DIV 14 / 100.0 AS avg_yearly
        FROM (
          SELECT p.p_brand,
            CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
          FROM (
            SELECT l_partkey, l_extendedprice,
              (SELECT struct(COUNT(*) AS n, SUM(CAST(l2.l_quantity AS BIGINT)) AS sq)
               FROM q17_lineitem l2
               WHERE l2.l_partkey = l1.l_partkey) AS ps,
              CAST(l_quantity AS BIGINT) AS qty
            FROM q17_lineitem l1) l
          JOIN q17_part p ON p.p_partkey = l.l_partkey
          WHERE 5 * l.ps.n * l.qty < l.ps.sq)
        GROUP BY p_brand ORDER BY p_brand""")
    },

    // B78: TPC-H Q20-SHAPED (suppliers holding excess stock) — the
    // nested IN + correlated-scalar shape: suppliers IN (per-
    // (supplier, part) totals that exceed 0.2× the part's corpus-wide
    // quantity; the spec's 0.5×availqty has no availqty here and 0.5
    // of total flow is empty on the synthetic corpus — 0.2 keeps the
    // gate non-vacuous at every SF), parts restricted by a name
    // prefix. NOT spec-Q20: the
    // synthetic corpus has no partsupp/ps_availqty, so the "stock" a
    // supplier holds is its own shipped total of the part (the oracle
    // replays this exact variant); the preserved part is the SHAPE —
    // IN(GROUP BY + correlated scalar) over the fact table, which
    // Catalyst plans as two part-keyed aggregates + a semi join, no
    // per-row rescans. Quantity sums are integer-valued doubles —
    // exact in any order; 0.5× and the compare are identical IEEE in
    // both engines.
    "q_excess_supply" -> { (s, dir) =>
      Tables.lineitem(s, dir).createOrReplaceTempView("q20_lineitem")
      Tables.part(s, dir).createOrReplaceTempView("q20_part")
      Tables.supplier(s, dir).createOrReplaceTempView("q20_supplier")
      Tables.nation(s, dir).createOrReplaceTempView("q20_nation")
      s.sql("""
        SELECT s_suppkey, s_name, n_name
        FROM q20_supplier JOIN q20_nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN (
          SELECT sp.l_suppkey FROM (
            SELECT l_suppkey, l_partkey, SUM(l_quantity) AS qty
            FROM q20_lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM q20_part
                                WHERE p_name LIKE 'red%')
            GROUP BY l_suppkey, l_partkey) sp
          WHERE sp.qty > (SELECT 0.2 * SUM(l2.l_quantity)
                          FROM q20_lineitem l2
                          WHERE l2.l_partkey = sp.l_partkey))
        ORDER BY s_suppkey""")
    },

    // B79 (r17): TPC-H Q2-SHAPED (min-cost supplier) — the last
    // classic correlated-subquery shape: for each filtered part, keep
    // the region's suppliers whose supply cost EQUALS the correlated
    // MIN over all of that part's in-region suppliers. NOT spec-Q2:
    // the synthetic corpus has no partsupp/ps_supplycost, so the
    // per-(part, supplier) unit cost is the rollup MIN(cents DIV qty)
    // over that pair's lineitems — integer-exact in both engines
    // (cents is exact BIGINT, quantity an integer-valued double ≥ 1,
    // DIV/​// identical integral division); the region/nation chain,
    // the p_type/p_size part filter, the correlated MIN and the
    // acctbal-descending LIMIT 100 are the preserved SHAPE. Catalyst
    // decorrelates the scalar MIN to one per-part aggregate over the
    // (part, supplier) rollup joined to EU suppliers. Plan audited:
    // the rollup is computed TWICE (once for the serving join — with
    // a runtime filter from the part side — once under the MIN),
    // exactly as every engine's spec-Q2 scans partsupp twice;
    // supplier/nation/region broadcast at any SF, and the final sort
    // is TakeOrderedAndProject (LIMIT pushed into the sort). The
    // 100 TB production path for a repeated Q2 is materializing the
    // rollup as a D41-class join-MV, which this library ships.
    "q_min_cost_supplier" -> { (s, dir) =>
      Tables.lineitem(s, dir).createOrReplaceTempView("q2_lineitem")
      Tables.part(s, dir).createOrReplaceTempView("q2_part")
      Tables.supplier(s, dir).createOrReplaceTempView("q2_supplier")
      Tables.nation(s, dir).createOrReplaceTempView("q2_nation")
      Tables.region(s, dir).createOrReplaceTempView("q2_region")
      s.sql("""
        WITH ps AS (
          SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
            MIN(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                DIV CAST(l_quantity AS BIGINT)) AS ps_supplycost
          FROM q2_lineitem GROUP BY 1, 2),
        eu AS (
          SELECT s_suppkey, s_name, s_acctbal, n_name
          FROM q2_supplier
          JOIN q2_nation ON s_nationkey = n_nationkey
          JOIN q2_region ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE')
        SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
          ps_supplycost
        FROM q2_part
        JOIN ps ON ps_partkey = p_partkey
        JOIN eu ON s_suppkey = ps_suppkey
        WHERE p_type = 'PROMO' AND p_size <= 10
          AND ps_supplycost = (
            SELECT MIN(ps2.ps_supplycost)
            FROM ps ps2 JOIN eu e2 ON e2.s_suppkey = ps2.ps_suppkey
            WHERE ps2.ps_partkey = p_partkey)
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100""")
    },

    // B5: group-by-status counts (benchmark reconciliation query)
    "q_status_counts" -> { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), Rounding.r(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("o_orderstatus"))
    },

    // B6: TPC-H Q6 — selective filter + 2-column projection; the scan
    // must show PushedFilters + a 4-column ReadSchema
    "q_filter_pushdown" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(Rounding.r(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
          count(lit(1)).as("n"))
    },

    // B7: ranking + running aggregate window per supplier
    "q_window_running" -> { (s, dir) =>
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      Tables.lineitem(s, dir)
        .where(col("l_suppkey") < 5)
        .withColumn("rn", row_number().over(w))
        .withColumn("running_rev",
          sum(col("l_extendedprice")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("l_suppkey"), col("rn").cast("long").as("rn"),
          col("l_orderkey"), col("l_linenumber"),
          Rounding.r(col("running_rev"), 2).as("running_rev"))
        .orderBy(col("l_suppkey"), col("rn"))
    },

    // B8: exact distinct aggregation per event type
    "q_distinct_users" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"))
    },

    // B9: tumbling 1-hour bucket aggregate (batch twin of the
    // streaming windowed aggregate in streaming/EventStream)
    // B68: the SQL-TEXT path end-to-end — this query is authored as
    // spark.sql(...) against a temp view using the StarRocks-named
    // registered aggregates (bitmap_distinct_count, bitmap_agg,
    // bitmap_union_count), so the migrating user's literal workflow —
    // SQL in, bitmap rollup re-aggregation, no DataFrame API — passes
    // the same oracle gate as every column-API query
    "q_sql_surface" -> { (s, dir) =>
      Tables.events(s, dir).createOrReplaceTempView("events_sql")
      s.sql("""
        SELECT t.event_type, t.n_users, g.total_users
        FROM (SELECT event_type,
                bitmap_distinct_count(user_id) AS n_users
              FROM events_sql GROUP BY event_type) t
        CROSS JOIN (SELECT bitmap_union_count(bm) AS total_users
                    FROM (SELECT bitmap_agg(user_id) AS bm
                          FROM events_sql GROUP BY event_type)) g
        ORDER BY event_type""")
    },

    // B70: the SQL-TEXT percentile path end-to-end (B68's construction
    // for the PERCENTILE surface): stored daily sketches →
    // percentile_union → scalar percentile_approx_raw at two
    // quantiles, all authored as spark.sql against a temp view — the
    // migrating user's literal PERCENTILE-column workflow through the
    // same oracle gate. Estimates are engine-internal → output is the
    // B69 bound-flag construction (exact counts + 5% rank flags).
    "q_sql_percentile" -> { (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
        .createOrReplaceTempView("events_psql")
      val est = s.sql("""
        SELECT event_type,
          percentile_approx_raw(usk, 0.5) AS p50_est,
          percentile_approx_raw(usk, 0.9) AS p90_est
        FROM (SELECT event_type, percentile_union(sk) AS usk
              FROM (SELECT event_type, day, percentile_sketch(value) AS sk
                    FROM events_psql GROUP BY event_type, day)
              GROUP BY event_type)""")
      def ok(r: String, q: Double) =
        abs(col(r) - lit(q) * col("n_events")) <=
          lit(0.05) * col("n_events") + lit(1.0)
      Tables.events(s, dir)
        .join(broadcast(est), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum((col("value") <= col("p50_est")).cast("long")).as("r50"),
          sum((col("value") <= col("p90_est")).cast("long")).as("r90"))
        .select(col("event_type"), col("n_events"),
          ok("r50", 0.5).as("p50_ok"), ok("r90", 0.9).as("p90_ok"))
        .orderBy(col("event_type"))
    },

    // B71 (r10): the SQL-TEXT funnel path — the migrating user's
    // literal `window_funnel(...)` workflow authored as spark.sql over
    // a temp view (B68/B70's construction, completing the SQL-text
    // gate for the third registered analytics surface): per-user
    // sorted step-event list → the codegen'd window_funnel scalar with
    // multi-anchor max semantics — hash-matches B32's oracle verbatim.
    "q_sql_funnel" -> { (s, dir) =>
      Tables.events(s, dir).select(col("user_id"), col("ts"), col("event_type"))
        .createOrReplaceTempView("events_fsql")
      s.sql("""
        SELECT user_id,
          window_funnel(
            sort_array(collect_list(
              CASE WHEN event_type IN ('signup', 'click', 'purchase')
                THEN struct(unix_micros(ts) AS ts, event_type AS et) END)),
            'signup,click,purchase', 86400000000) AS funnel_depth
        FROM events_fsql
        GROUP BY user_id
        ORDER BY user_id""")
    },

    // B66: MOVING MEDIAN of daily per-type volumes — the robust
    // smoothing twin of B64's EWMA (one outlier day shifts an EWMA,
    // never a median): trailing-7 frame collected per row, sorted
    // row-locally, exact lower-median element picked by index. Inputs
    // are integer counts and the pick is an ELEMENT (no interpolation
    // or averaging), so the result is integer-exact cross-engine;
    // frames are ≤ 7 elements, so the per-row sort is constant work
    "q_moving_median" -> { (s, dir) =>
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-6, 0)
      Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
        .withColumn("vs", sort_array(collect_list(col("n")).over(w)))
        .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n"),
          element_at(col("vs"),
            floor((size(col("vs")) + 1) / 2).cast("int")).as("med7"))
        .orderBy(col("event_type"), col("day"))
    },

    // B65: WEIGHTED percentiles (median + p90 of price weighted by
    // quantity — "the price at which half the VOLUME trades", not half
    // the line items): per-(group, value) integer weight aggregation,
    // one per-group cumulative window over DISTINCT values, then the
    // integer cross-multiplied rank test cum·100 ≥ p·tot picks the
    // answer — no interpolation, no FP rank arithmetic; exported
    // prices are raw data values, bit-identical by construction
    "q_weighted_percentile" -> { (s, dir) =>
      val byVal = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_extendedprice"))
        .agg(sum(col("l_quantity").cast("long")).as("w"))
      val wOrd = Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
      val wAll = Window.partitionBy(col("l_returnflag"))
      byVal
        .withColumn("cum", sum(col("w")).over(wOrd))
        .withColumn("tot", sum(col("w")).over(wAll))
        .groupBy(col("l_returnflag"))
        .agg(
          min(when(col("cum") * 2 >= col("tot"), col("l_extendedprice"))).as("w_median"),
          min(when(col("cum") * 10 >= col("tot") * 9, col("l_extendedprice"))).as("w_p90"),
          max(col("tot")).as("total_qty"))
        .orderBy(col("l_returnflag"))
    },

    // B64: EWMA smoothing of daily per-type volumes (ClickHouse
    // exponentialMovingAverage / monitoring-dashboard smoothing) with
    // α = 1/2 decay over a trailing 8-row frame: every weight is a
    // power of two (1 << k exact, division by it correctly rounded),
    // the fold is left-to-right over the frame list, and the inputs
    // are integer counts — so the double is BIT-IDENTICAL cross-engine
    // before the 4dp export round, with no library-pow ambiguity
    "q_ewma" -> { (s, dir) =>
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-7, 0)
      Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
        .withColumn("vs", collect_list(col("n")).over(w))
        .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n"),
          Rounding.r(
            aggregate(
              transform(col("vs"), (x, i) =>
                x.cast("double") / call_function("shiftleft", lit(1L),
                  (size(col("vs")) - 1 - i).cast("int")).cast("double")),
              lit(0.0d), (acc, x) => acc + x) /
            aggregate(
              transform(col("vs"), (_, i) =>
                lit(1.0d) / call_function("shiftleft", lit(1L),
                  (size(col("vs")) - 1 - i).cast("int")).cast("double")),
              lit(0.0d), (acc, x) => acc + x), 4).as("ewma"))
        .orderBy(col("event_type"), col("day"))
    },

    // B62: per-row TRAILING exact distinct — "how many distinct event
    // types did this user emit in the hour ending now", a per-event
    // feature streaming count(DISTINCT) over a window cannot give and
    // Spark has no native window form for. RANGE frame on epoch
    // seconds + collect_list→array_distinct; per-row cost ∝ frame
    // (bounded: one user's hour), partitioned by user so frames never
    // cross executors. The day-scale sibling with unbounded frames is
    // the bucket-bitmap fan-out (B59) — use that shape when the frame
    // outgrows a task
    "q_window_distinct" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("tsec"))
        .rangeBetween(-3600, 0)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_timestamp(col("ts")).as("tsec"),
          date_format(col("ts"), TsFmt).as("ts"))
        .withColumn("n_types_1h",
          size(array_distinct(collect_list(col("event_type")).over(w))).cast("long"))
        .select(col("event_id"), col("user_id"), col("ts"), col("n_types_1h"))
        .orderBy(col("event_id"))
    },

    // B63: z-score anomaly detection over daily per-type volumes (the
    // monitoring alert the reference's monitor.sh eyeballs): a day is
    // anomalous when |n − mean| > 2σ. The FLAG is decided entirely in
    // INTEGER arithmetic — (nK−Σn)²(K−1) > 4K(K·Σn²−(Σn)²) is the
    // 2σ predicate cleared of divisions — so no engine's stddev
    // implementation can flip a boundary row; the exported z itself
    // is the token-identical IEEE formula, 4dp
    "q_zscore_anomaly" -> { (s, dir) =>
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val stats = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("k"), sum(col("n")).as("s1"),
          sum(col("n") * col("n")).as("s2"))
      val dev = col("n") * col("k") - col("s1")
      daily.join(stats, "event_type")
        .where(dev * dev * (col("k") - 1) >
          lit(4L) * col("k") * (col("k") * col("s2") - col("s1") * col("s1")))
        .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n"),
          Rounding.r(abs(dev.cast("double") / col("k")) /
            sqrt((col("k") * col("s2") - col("s1") * col("s1")).cast("double") /
              (col("k") * (col("k") - 1))), 4).as("z"))
        .orderBy(col("event_type"), col("day"))
    },

    // B61: day-over-day retained/new/churned user accounting via
    // BITMAP set algebra — the StarRocks retained-users pattern: one
    // compressed Rbm per day (the only row-scale shuffle), then lag +
    // |A∩B| / |A|−|A∩B| on the bitmap COLUMN itself. The unpartitioned
    // lag window runs on the post-aggregation frame (one row per day —
    // tens of rows at any corpus size), never on raw events; the naive
    // form re-shuffles every event into both its own and the next
    // day's group
    "q_bitmap_retention" -> { (s, dir) =>
      import graft.functions.Rbm
      val daily = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(Rbm.rbmOf(col("user_id")).as("bm"))
      val w = Window.orderBy(col("day"))
      daily.withColumn("prev", lag(col("bm"), 1).over(w))
        .where(col("prev").isNotNull)
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          Rbm.cardinality(col("bm")).as("active"),
          Rbm.cardinality(col("prev")).as("prev_active"),
          Rbm.andCardinality(col("bm"), col("prev")).as("retained"))
        .withColumn("new_users", col("active") - col("retained"))
        .withColumn("churned", col("prev_active") - col("retained"))
        .orderBy(col("day"))
    },

    "q_time_bucket_agg" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"), Rounding.r(sum(col("value")), 4).as("sum_value"))
        .select(date_format(col("bucket"), TsFmt).as("bucket"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy(col("bucket"), col("event_type"))
    },

    // B10: EXISTS / NOT EXISTS via left_semi + left_anti
    "q_semi_anti_join" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).select(col("o_custkey"))
      val active = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment").as("seg")).agg(count(lit(1)).as("n_active"))
      val inactive = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment").as("seg")).agg(count(lit(1)).as("n_inactive"))
      active.join(inactive, Seq("seg"), "full_outer")
        .select(col("seg"),
          coalesce(col("n_active"), lit(0L)).as("n_active"),
          coalesce(col("n_inactive"), lit(0L)).as("n_inactive"))
        .orderBy(col("seg"))
    },

    // B11: hierarchical ROLLUP region → nation
    "q_rollup" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), Rounding.r(sum(col("c_acctbal")), 2).as("acctbal"))
        .select(coalesce(col("r_name"), lit("ALL")).as("region"),
          coalesce(col("n_name"), lit("ALL")).as("nation"),
          col("n_cust"), col("acctbal"))
        .orderBy(col("region"), col("nation"))
    },

    // B12: gap-based sessionization (30-minute inactivity gap)
    "q_sessionize" -> { (s, dir) =>
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1).otherwise(0))
        .withColumn("sess",
          sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"))
        .agg(max(col("sess")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    },

    // B13: pivot-style conditional aggregation per day
    "q_conditional_pivot" -> { (s, dir) =>
      val day = date_format(col("ts"), "yyyy-MM-dd").as("day")
      Tables.events(s, dir)
        .groupBy(day)
        .agg(
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n_click"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("n_view"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchase"),
          sum(when(col("event_type") === "signup", 1L).otherwise(0L)).as("n_signup"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_error"))
        .orderBy(col("day"))
    },

    // B14: JSON property extraction + aggregation
    "q_json_extract" -> { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("event_type"))
        .agg(Rounding.r(avg(col("k")), 4).as("avg_k"), min(col("k")).as("min_k"),
          max(col("k")).as("max_k"), count(col("k")).as("n"))
        .orderBy(col("event_type"))
    },

    // B25: ordered string aggregation (collect + sort + join — the
    // group_concat / string_agg surface)
    "q_string_agg" -> { (s, dir) =>
      Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(concat_ws(",", sort_array(collect_list(col("n_name")))).as("nations"),
          count(lit(1)).as("n"))
        .orderBy(col("r_name"))
    },

    // B26: regex group extraction
    "q_regexp_extract" -> { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("k_str", regexp_extract(col("props"), "\"k\": ([0-9]+)", 1))
        .groupBy(col("k_str").cast("int").as("k"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("k"))
    },

    // B24: time-range window frame — trailing 1-hour activity per user
    // at every event (RANGE frame over epoch seconds)
    "q_window_trailing" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("sec"))
        .rangeBetween(-3600, 0)
      Tables.events(s, dir)
        .withColumn("sec", unix_timestamp(col("ts")))
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("sum_1h", Rounding.r(sum(col("value")).over(w), 4))
        .select(col("event_id"), col("user_id"), col("n_1h"), col("sum_1h"))
        .orderBy(col("event_id"))
    },

    // B23: the same as-of semantics through the NATIVE custom operator
    // (logical node + strategy + merge exec, graft.plans.AsOfJoin) —
    // must match the same oracle as the composed B17 formulation
    "q_asof_native" -> { (s, dir) =>
      val e = Tables.events(s, dir).select(col("event_id"), col("user_id"), col("ts"))
      val o = Tables.orders(s, dir).select(col("o_custkey"), col("o_orderdate"),
        col("o_orderkey"), col("o_totalprice"))
      graft.plans.AsOfJoin.join(e, o,
        leftKey = col("user_id"), rightKey = col("o_custkey"),
        leftTime = col("ts"), rightTime = col("o_orderdate"),
        rightTiebreak = col("o_orderkey"))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), TsFmt).as("ts"),
          col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("event_id"))
    },

    // B27: point-in-interval RANGE join — every event that falls inside
    // a same-user "incident window" (the hour following an error
    // event). Planned as a bucketed EQUI-join (graft.ops.RangeJoin):
    // interval side replicated into ≤2 time buckets, point side in
    // one, exact containment in the join condition — no union sort,
    // no nested loop (RangeJoinSpec plan-asserts).
    "q_asof_range" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val pts = ev.select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("esec"))
      val win = ev.where(col("event_type") === "error")
        .select(col("event_id").as("err_event_id"), col("user_id").as("err_user"),
          unix_timestamp(col("ts")).as("wsec"))
      val hour = 3600L
      graft.ops.RangeJoin.pointInInterval(pts, win,
        leftKey = col("user_id"), point = col("esec"),
        rightKey = col("err_user"), start = col("wsec"),
        endExcl = col("wsec") + hour, bucketWidth = hour)
        .select(col("event_id"), col("user_id"), col("err_event_id"),
          (col("esec") - col("wsec")).as("offset_sec"))
        .orderBy(col("event_id"), col("err_event_id"))
    },

    // B29: window_funnel (StarRocks window_funnel() analogue): max
    // funnel depth signup → click → purchase reached within 1 day of
    // the FIRST signup (window anchored at step 1, steps strictly
    // ordered in time). Same staged-aggregation shape as B28.
    "q_window_funnel" -> { (s, dir) =>
      val e = Tables.events(s, dir).select(col("user_id"), col("ts"), col("event_type"))
      val day = expr("INTERVAL 1 DAY")
      val s0 = e.groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "signup", col("ts"))).as("s0"))
      val c1 = e.join(s0, "user_id").groupBy(col("user_id"), col("s0"))
        .agg(min(when(col("event_type") === "click" &&
          col("ts") > col("s0") && col("ts") <= col("s0") + day, col("ts"))).as("c1"))
      val p2 = e.join(c1, "user_id").groupBy(col("user_id"), col("s0"), col("c1"))
        .agg(min(when(col("event_type") === "purchase" &&
          col("ts") > col("c1") && col("ts") <= col("s0") + day, col("ts"))).as("p2"))
      p2.select(col("user_id"),
        (col("s0").isNotNull.cast("long") + col("c1").isNotNull.cast("long") +
          col("p2").isNotNull.cast("long")).as("funnel_depth"))
        .orderBy(col("user_id"))
    },

    // B30: same funnel as B29 in ONE aggregation pass (ops.Funnel):
    // collect each user's (ts, type) list once, evaluate every step as
    // an array expression — one shuffle, no joins, vs B29's k staged
    // joins. Hash-matches B29's oracle (value-based step semantics are
    // identical).
    "q_funnel_native" -> { (s, dir) =>
      Funnel.depth(
          Tables.events(s, dir).select(col("user_id"), col("ts"), col("event_type")),
          keyCol = col("user_id"), tsCol = col("ts"), typeCol = col("event_type"),
          steps = Seq("signup", "click", "purchase"),
          window = expr("INTERVAL 1 DAY"), dedup = false)
        .select(col("key").as("user_id"), col("depth").as("funnel_depth"))
        .orderBy(col("user_id"))
    },

    // B31: window_funnel DEDUPLICATION mode — a repeat of an
    // already-matched step type between two matched steps breaks the
    // funnel (a second signup before the click, or a second
    // signup/click between click and purchase). Value-based kill
    // semantics (candidate must be strictly earlier than the repeat),
    // so same-timestamp races resolve identically in any engine.
    // Only the depth is exported, so this runs on the native kernel
    // (first-anchor mode) — the interpreted dedup predicate re-scans
    // the per-key list once per matched step.
    "q_window_funnel_dedup" -> { (s, dir) =>
      Funnel.depthFirst(
          Tables.events(s, dir).select(col("user_id"), col("ts"), col("event_type")),
          keyCol = col("user_id"), tsCol = col("ts"), typeCol = col("event_type"),
          steps = Seq("signup", "click", "purchase"),
          windowMicros = 86400000000L, dedup = true)
        .select(col("key").as("user_id"), col("depth").as("funnel_depth"))
        .orderBy(col("user_id"))
    },

    // B32: upstream window_funnel semantics — EVERY signup is a
    // candidate anchor and the best depth wins (the single-anchor
    // variants above score signup@d1, signup@d3, click@d3+1h as 1;
    // StarRocks/ClickHouse — and this query — score it 2). Same
    // one-shuffle collected-list shape; each anchor re-scans the
    // per-key step-typed array.
    "q_window_funnel_multi" -> { (s, dir) =>
      Funnel.depthMax(
          Tables.events(s, dir).select(col("user_id"), col("ts"), col("event_type")),
          keyCol = col("user_id"), tsCol = col("ts"), typeCol = col("event_type"),
          steps = Seq("signup", "click", "purchase"),
          windowMicros = 86400000000L, dedup = false)
        .select(col("key").as("user_id"), col("depth").as("funnel_depth"))
        .orderBy(col("user_id"))
    },

    // B28: sequential funnel retention (StarRocks retention()/
    // window_funnel analogue): per user, r1 = ever signed up, r2 =
    // purchased AFTER the first signup, r3 = errored AFTER that first
    // post-signup purchase. Three keyed aggregations — after the first
    // shuffle on user_id the joins are co-partitioned, so the plan is
    // one exchange + local work, the shape that holds at corpus scale.
    "q_retention" -> { (s, dir) =>
      val e = Tables.events(s, dir).select(col("user_id"), col("ts"), col("event_type"))
      val s0 = e.groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "signup", col("ts"))).as("s0"))
      val p1 = e.join(s0, "user_id").groupBy(col("user_id"), col("s0"))
        .agg(min(when(col("event_type") === "purchase" && col("ts") > col("s0"),
          col("ts"))).as("p1"))
      val r = e.join(p1, "user_id").groupBy(col("user_id"), col("p1"))
        .agg(max(when(col("event_type") === "error" && col("ts") > col("p1"), 1L)
          .otherwise(0L)).as("e3"))
      p1.select(col("user_id"), col("s0"), col("p1"))
        .join(r.select(col("user_id"), col("e3")), "user_id")
        .select(col("user_id"),
          col("s0").isNotNull.cast("long").as("r1"),
          col("p1").isNotNull.cast("long").as("r2"),
          (col("p1").isNotNull && col("e3") === 1L).cast("long").as("r3"))
        .orderBy(col("user_id"))
    },

    // B22: HLL sketch distinct (approx_count_distinct). Sketch values
    // are engine-specific, so the estimate itself can't be hash-checked
    // — instead the gate output materializes the error-bound PROOF (the
    // dedup_quality_audit construction): exact distinct + a flag that
    // the HLL estimate landed within 3×rsd of it, both computed in one
    // aggregation pass. The oracle asserts the flag is TRUE per group,
    // turning the former rows-only cell into a per-round bound check.
    // (Production callers use just the HLL agg — the exact column here
    // exists to make the bound a driver-checked number; ApproxSpec
    // still pins the raw estimates.)
    "q_approx_distinct" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"),
          countDistinct(col("user_id")).as("n_exact"))
        .select(col("event_type"), col("n_exact"),
          (abs(col("approx_users") - col("n_exact")) <=
            lit(3 * 0.02) * col("n_exact")).as("est_ok"))
        .orderBy(col("event_type"))
    },

    // B42: approximate percentiles (StarRocks percentile_approx
    // analogue) — the KLL/GK-style mergeable quantile sketch: shuffle
    // carries one bounded sketch per group, never the value stream.
    // Sketch outputs are engine-specific, so (like q_approx_distinct)
    // the gate output is the bound PROOF: the estimated quantile's
    // actual rank, recomputed against the group in a second pass
    // (3-row broadcast join back to lineitem), must sit within the
    // sketch's rank-error window |rank − q·n| ≤ 2·(n/1000 + 1) — the
    // accuracy=1000 contract ApproxSpec pins, now DuckDB-checked per
    // flag and per quantile every round.
    "q_approx_percentile" -> { (s, dir) =>
      val est = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(approx_percentile(col("l_extendedprice"),
          array(lit(0.25), lit(0.5), lit(0.75)), lit(1000)).as("approx_p"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag").as("rf"),
          col("approx_p")(0).as("p25"), col("approx_p")(1).as("p50"),
          col("approx_p")(2).as("p75"), col("n"))
      val ranks = Tables.lineitem(s, dir)
        .join(broadcast(est), col("l_returnflag") === col("rf"))
        .groupBy(col("l_returnflag"), col("n"))
        .agg(
          sum((col("l_extendedprice") <= col("p25")).cast("long")).as("r25"),
          sum((col("l_extendedprice") <= col("p50")).cast("long")).as("r50"),
          sum((col("l_extendedprice") <= col("p75")).cast("long")).as("r75"))
      def ok(rank: String, q: Double) =
        (abs(col(rank) - lit(q) * col("n")) <=
          lit(2.0) * (col("n") / lit(1000.0) + lit(1.0)))
      ranks.select(col("l_returnflag"), col("n"),
          ok("r25", 0.25).as("p25_ok"), ok("r50", 0.50).as("p50_ok"),
          ok("r75", 0.75).as("p75_ok"))
        .orderBy(col("l_returnflag"))
    },

    // B21: set operations — INTERSECT / EXCEPT semantics
    "q_set_ops" -> { (s, dir) =>
      val highBal = Tables.customer(s, dir)
        .where(col("c_acctbal") > 5000).select(col("c_custkey").as("k"))
      val withOrders = Tables.orders(s, dir).select(col("o_custkey").as("k"))
      highBal.intersect(withOrders).agg(count(lit(1)).as("n_active_rich"))
        .crossJoin(
          highBal.except(withOrders).agg(count(lit(1)).as("n_inactive_rich")))
    },

    // B20: scalar-function surface — string/math/date/null-handling
    // functions evaluated identically by the oracle
    "q_scalar_funcs" -> { (s, dir) =>
      Tables.orders(s, dir)
        .where(col("o_orderkey") < 1000)
        .select(
          col("o_orderkey"),
          upper(col("o_orderstatus")).as("status_u"),
          lower(col("o_orderpriority")).as("prio_l"),
          length(col("o_orderpriority")).cast("long").as("prio_len"),
          substring(col("o_orderpriority"), 1, 3).as("prio_3"),
          lpad(col("o_orderkey").cast("string"), 8, "0").as("key_pad"),
          concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("tag"),
          abs(col("o_totalprice") - 1000).as("abs_p"),
          Rounding.r(sqrt(col("o_totalprice")), 4).as("sqrt_p"),
          Rounding.r(ln(col("o_totalprice")), 4).as("ln_p"),
          floor(col("o_totalprice") / 100).cast("long").as("bucket"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          dayofmonth(col("o_orderdate")).cast("long").as("d"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_nn"))
        .orderBy(col("o_orderkey"))
    },

    // B19: CUBE — all grouping-set combinations of segment × status
    "q_cube" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .cube(col("c_mktsegment"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), Rounding.r(sum(col("o_totalprice")), 2).as("total"))
        .select(coalesce(col("c_mktsegment"), lit("ALL")).as("seg"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("n"), col("total"))
        .orderBy(col("seg"), col("status"))
    },

    // B18: exact distinct via the compressed-bitmap aggregate (StarRocks
    // bitmap_union_count over a roaring BITMAP) — must equal
    // count(DISTINCT …). No capacity parameter: the id domain is
    // unbounded, shuffle ∝ occupied 2^16 buckets.
    "q_bitmap_distinct" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(graft.functions.Rbm.rbmDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"))
    },

    // B43: bitmap set algebra (StarRocks bitmap_and_count analogue) —
    // each cohort folds to ONE compressed bitmap (map-side OR-merge;
    // shuffle ∝ occupied id buckets — ≤8 KiB per dense bucket,
    // ∝ cardinality per sparse bucket — never ∝ the id domain);
    // the intersection is then pure per-bucket column math on the two
    // map values. The exact-distinct way to ask "users who did BOTH".
    "q_bitmap_intersect" -> { (s, dir) =>
      import graft.functions.Rbm
      val e = Tables.events(s, dir)
      val su = e.where(col("event_type") === "signup")
        .agg(Rbm.rbmOf(col("user_id")).as("b1"))
      val pu = e.where(col("event_type") === "purchase")
        .agg(Rbm.rbmOf(col("user_id")).as("b2"))
      su.crossJoin(pu).select(
        Rbm.cardinality(col("b1")).as("n_signup"),
        Rbm.cardinality(col("b2")).as("n_purchase"),
        Rbm.andCardinality(col("b1"), col("b2")).as("n_both"))
    },

    // B15: exact interpolated percentiles per group
    "q_percentiles" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(percentile(col("l_quantity"), lit(0.25)).as("q25"),
          percentile(col("l_quantity"), lit(0.5)).as("q50"),
          percentile(col("l_quantity"), lit(0.75)).as("q75"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },

    // B16: top-k per group (ranked window over an aggregate)
    "q_topk_per_group" -> { (s, dir) =>
      val rev = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_partkey"))
        .agg(sum(col("l_extendedprice")).as("rev"))
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("rev").desc, col("p_partkey"))
      rev.withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
        .select(col("p_brand"), col("rk").cast("long").as("rk"), col("p_partkey"),
          Rounding.r(col("rev"), 2).as("rev"))
        .orderBy(col("p_brand"), col("rk"))
    },

    // B17: distributed as-of join — for every event, the latest order of
    // the same customer at or before the event time. One shuffle+sort by
    // (key, time) over the tagged union: the classic scalable as-of plan
    // (no per-row subqueries, no range cross-join).
    "q_asof_join" -> { (s, dir) =>
      val o = Tables.orders(s, dir).select(
        col("o_custkey").as("k"), col("o_orderdate").as("t"), lit(0).as("kind"),
        col("o_orderkey").as("ordkey"), col("o_totalprice").as("price"),
        lit(null).cast("long").as("event_id"))
      val e = Tables.events(s, dir).select(
        col("user_id").as("k"), col("ts").as("t"), lit(1).as("kind"),
        lit(null).cast("long").as("ordkey"), lit(null).cast("double").as("price"),
        col("event_id"))
      val w = Window.partitionBy(col("k"))
        .orderBy(col("t"), col("kind"), coalesce(col("ordkey"), col("event_id")))
        .rowsBetween(Window.unboundedPreceding, 0)
      o.unionByName(e)
        .withColumn("o_orderkey", last(col("ordkey"), ignoreNulls = true).over(w))
        .withColumn("o_totalprice", last(col("price"), ignoreNulls = true).over(w))
        .where(col("kind") === 1)
        .select(col("event_id"), col("k").as("user_id"),
          date_format(col("t"), TsFmt).as("ts"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("event_id"))
    },

    // B33: native PIVOT — revenue by status × market segment, the
    // segment list pinned so the output schema is static (dynamic
    // pivot would first scan for distinct values: one extra job).
    // One hash aggregation; each segment a conditional sum column.
    "q_pivot_native" -> { (s, dir) =>
      Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderstatus"))
        .pivot("c_mktsegment",
          Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"))
        .agg(Rounding.r(sum(col("o_totalprice")), 2))
        .orderBy(col("o_orderstatus"))
    },

    // B34: UNPIVOT (melt) — the wide per-flag aggregate turned long:
    // one row per (flag, metric). Spark's native unpivot, no UNION of
    // re-scans — the wide aggregate computes once.
    "q_unpivot" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(Rounding.r(sum(col("l_quantity")), 2).as("sum_qty"),
          Rounding.r(sum(col("l_extendedprice")), 2).as("sum_price"),
          Rounding.r(sum(col("l_discount")), 4).as("sum_disc"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
          "metric", "value")
        .orderBy(col("l_returnflag"), col("metric"))
    },

    // B35: distribution-rank window surface — ntile/percent_rank/
    // cume_dist per nation (partitioned window: each nation sorts
    // independently, no global single-partition sort at scale)
    "q_ntile" -> { (s, dir) =>
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey").cast("long").as("nation"),
          ntile(4).over(w).cast("long").as("quartile"),
          Rounding.r(percent_rank().over(w), 6).as("pr"),
          Rounding.r(cume_dist().over(w), 6).as("cd"))
        .orderBy(col("c_custkey"))
    },

    // B36: fixed-width histogram — bin math in the group key (no
    // width_bucket UDF), count + bin extremes per bucket; a single
    // hash aggregation whatever the row count
    "q_histogram" -> { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(floor(col("o_totalprice") / 20000).cast("long").as("bin"))
        .agg(count(lit(1)).as("n"),
          Rounding.r(min(col("o_totalprice")), 2).as("lo"),
          Rounding.r(max(col("o_totalprice")), 2).as("hi"))
        .orderBy(col("bin"))
    },

    // B37: lateral explode — tokenize and flatten with position
    // (posexplode = LATERAL unnest WITH ORDINALITY); the position
    // filter lands before the generate output is wide
    "q_lateral_explode" -> { (s, dir) =>
      Tables.documents(s, dir)
        .where(col("doc_id") < 200)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .where(col("pos") < 10)
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("word"))
        .orderBy(col("doc_id"), col("pos"))
    },

    // B47: exact DISCRETE percentiles (PERCENTILE_DISC semantics: an
    // actual data value, not an interpolation) via an explicit
    // rank-position formula — value at row_number ceil(p·n) — so both
    // engines compute the identical rule rather than each library's
    // edge convention; tie order within equal values cannot change
    // the picked value
    "q_percentile_disc" -> { (s, dir) =>
      // counting-sort formulation: PERCENTILE_DISC's rank rule (value
      // at row ceil(p·n)) ≡ the least value whose cumulative count
      // reaches ceil(p·n). One map-side-combined hash agg collapses
      // the scan to (group, value) cardinality — quantities have few
      // distinct values — and the rank windows run over THAT tiny
      // frame, not a full sort of the fact table into |groups|
      // partitions (the r6 formulation's scale ceiling: 3 window
      // partitions however many executors; measured 2.0 → 0.4 s at
      // sf0.1, and at 100 TB the difference is a full-table sort)
      val counts = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
      val cum = counts
        .withColumn("cum", sum(col("c")).over(w))
        .withColumn("n", sum(col("c")).over(Window.partitionBy(col("l_returnflag"))))
      cum.groupBy(col("l_returnflag"))
        .agg(
          min(when(col("cum") >= ceil(col("n") * 0.25), col("l_quantity"))).as("p25_disc"),
          min(when(col("cum") >= ceil(col("n") * 0.5), col("l_quantity"))).as("p50_disc"),
          min(when(col("cum") >= ceil(col("n") * 0.75), col("l_quantity"))).as("p75_disc"),
          max(col("n")).as("n"))
        .orderBy(col("l_returnflag"))
    },

    // B48: centered time-RANGE window — activity within ±30 minutes of
    // every event (the symmetric twin of B24's trailing frame);
    // epoch-seconds RANGE bounds evaluate identically in any engine
    "q_window_centered" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("sec"))
        .rangeBetween(-1800L, 1800L)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("value"),
          floor(unix_timestamp(col("ts"))).cast("long").as("sec"))
        .withColumn("n_window", count(lit(1)).over(w))
        .withColumn("sum_window", Rounding.r(sum(col("value")).over(w), 4))
        .where(col("event_id") % 100 === 0)
        .select(col("event_id"), col("user_id"), col("n_window"), col("sum_window"))
        .orderBy(col("event_id"))
    },

    // B49: forward-fill (LOCF) — the gap-filling window shape: each
    // user's last purchase value carries forward to later events
    // (last + IGNORE NULLS over an unbounded-preceding ROWS frame;
    // (ts, event_id) makes the order total, so the fill is
    // deterministic)
    "q_gap_fill" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"),
          when(col("event_type") === "purchase", col("value")).as("v"))
        .withColumn("filled", Rounding.r(last(col("v"), ignoreNulls = true).over(w), 4))
        .where(col("event_id") % 50 === 0)
        .select(col("event_id"), col("user_id"), col("filled"))
        .orderBy(col("event_id"))
    },

    // B55: time-series densification + linear interpolation (the
    // ClickHouse WITH FILL INTERPOLATE / gap-fill-then-interpolate
    // report shape; B49 is the LOCF half). Per event type: hourly
    // observed averages → the COMPLETE hour spine via sequence() on the
    // per-type bounds (a 5-row aggregate, so the spine explode is a
    // broadcast-scale fan-out, never a shuffle of the fact table) →
    // missing hours take the linear interpolant between the bracketing
    // observed points. Interpolation reads the 4dp-ROUNDED observed
    // values, so every FP input crossing the engine boundary is already
    // deterministic; the interpolant itself is one mul + one div + one
    // add on exact integer hour distances, rounded once.
    "q_interpolate" -> { (s, dir) =>
      // EXACT-INTEGER basis (the §6 q5 construction, applied after a
      // 1-ulp sf1 boundary flap in r12): values become 1e-4 units
      // (floor(v·10⁴+0.5) — exact longs both engines), the per-bucket
      // average rounds half-up IN UNITS via floor((2Σ+n)/(2n)), and
      // the linear interpolation rounds half-up in units via
      // floor((2m+d)/(2d)). Both floors take a correctly-rounded
      // double quotient of exact <2⁵³ integers whose true value is a
      // small-denominator rational — its distance from any integer
      // (≥ 1/(2d)) dwarfs the quotient's ulp, so the floor is exact
      // and engine-identical at ANY scale; /10⁴ at the end maps equal
      // integers to equal doubles.
      val e = Tables.events(s, dir)
        .select(col("event_type"),
          floor(unix_timestamp(col("ts")) / 3600).cast("long").as("bucket"),
          floor(col("value") * 10000d + 0.5d).cast("long").as("vu"))
      val obs = e.groupBy(col("event_type"), col("bucket"))
        .agg(floor((lit(2) * sum(col("vu")) + count(lit(1)))
            .cast("double") / (lit(2) * count(lit(1))).cast("double"))
          .cast("long").as("vu_obs"), count(lit(1)).as("n_obs"))
      val spine = obs.groupBy(col("event_type"))
        .agg(min(col("bucket")).as("mn"), max(col("bucket")).as("mx"))
        .select(col("event_type"), explode(sequence(col("mn"), col("mx"))).as("bucket"))
      val wPrev = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val m = (col("nv") - col("pv")) * (col("bucket") - col("pt"))
      val d = col("nt") - col("pt")
      spine.join(obs, Seq("event_type", "bucket"), "left")
        .withColumn("pv", last(col("vu_obs"), ignoreNulls = true).over(wPrev))
        .withColumn("pt", last(when(col("vu_obs").isNotNull, col("bucket")),
          ignoreNulls = true).over(wPrev))
        .withColumn("nv", first(col("vu_obs"), ignoreNulls = true).over(wNext))
        .withColumn("nt", first(when(col("vu_obs").isNotNull, col("bucket")),
          ignoreNulls = true).over(wNext))
        .withColumn("filled_u",
          when(col("vu_obs").isNotNull, col("vu_obs"))
            .when(col("pt").isNull, col("nv"))
            .when(col("nt").isNull, col("pv"))
            .otherwise(col("pv") + floor((lit(2) * m + d).cast("double") /
              (lit(2) * d).cast("double")).cast("long")))
        .select(col("event_type"), col("bucket"),
          coalesce(col("n_obs"), lit(0L)).as("n_obs"),
          col("vu_obs").isNull.as("gap"),
          (col("filled_u").cast("double") / 10000d).as("filled"))
        .orderBy(col("event_type"), col("bucket"))
    },

    // B57: mergeable HLL sketch ROLLUP — the StarRocks HLL column
    // type's actual workflow (and Druid/ClickHouse uniqState): daily
    // per-type sketches are the stored pre-aggregate, weekly/total
    // distincts come from UNIONING sketches, never re-scanning raw
    // events. B22/B8 prove approx/exact distinct; this proves the
    // MERGE algebra (DataSketches HLL: union then estimate). The
    // merged estimate is engine-internal, so the gate output carries
    // the bound PROOF instead: exact distinct + a flag that the
    // union-of-daily-sketches estimate landed within 5% of it
    // (lgConfigK=12 → rse ≈ 1.6%; 5% is 3σ+, the ApproxSpec bound,
    // now DuckDB-checked per group each round).
    "q_hll_rollup" -> { (s, dir) =>
      val daily = Tables.events(s, dir)
        .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
        .groupBy(col("event_type"), col("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"), count(lit(1)).as("n"))
      val rolled = daily.groupBy(col("event_type"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"),
          sum(col("n")).as("n_events"), count(lit(1)).as("n_days"))
      val exact = Tables.events(s, dir).groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      rolled.join(exact, "event_type")
        .select(col("event_type"), col("n_events"), col("n_days"), col("n_exact"),
          (abs(col("approx_users") - col("n_exact")) <=
            lit(0.05) * col("n_exact")).as("est_ok"))
        .orderBy(col("event_type"))
    },

    // B58: EXACT bitmap rollup — B57's workflow with the StarRocks
    // BITMAP column type instead of HLL: daily per-type roaring-shaped
    // bitmaps (functions.Rbm) are the stored pre-aggregate and the
    // total is BITMAP_UNION_COUNT over bitmap rows — exact, so unlike
    // the sketch twin this is fully oracle-checkable. Re-aggregation
    // shuffles bitmap-sized state (∝ occupied 2¹⁶ buckets), never the
    // raw events.
    "q_bitmap_rollup" -> { (s, dir) =>
      import graft.functions.Rbm
      val daily = Tables.events(s, dir)
        .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
        .groupBy(col("event_type"), col("day"))
        .agg(Rbm.rbmOf(col("user_id")).as("bm"), count(lit(1)).as("n"))
      daily.groupBy(col("event_type"))
        .agg(Rbm.rbmUnionCount(col("bm")).as("n_users"),
          sum(col("n")).as("n_events"), count(lit(1)).as("n_days"))
        .orderBy(col("event_type"))
    },

    // B72: KMV bottom-k sketch SET EXPRESSIONS (functions.Kmv) — the
    // sketch-column family member HLL and BITMAP both lack: bounded
    // O(k) state per group AND every set operation. Per-returnflag
    // bottom-k sketches of the distinct orderkey domain answer
    // |A|, |A∩B|, |A∪B|, Jaccard for every flag pair from sketch
    // state alone; the exact sides (computed here only to audit) are
    // what a 100 TB deployment would NOT recompute — the sketch frame
    // is 3 rows × ~8 KB. Estimates are engine-internal (no second
    // engine replays xxhash64), so the gate emits exact values +
    // error-bound flags (the B22/B42/B57 construction; tolerances
    // carry ≥5σ headroom over the k=1024 estimator error, and KMV's
    // distinct-bottom-k is partition-order-deterministic so the
    // flags cannot flap run to run — KmvSpec pins both).
    "q_kmv_setops" -> { (s, dir) =>
      import graft.functions.Kmv
      val li = Tables.lineitem(s, dir)
        .select(col("l_returnflag").as("flag"), col("l_orderkey").as("okey"))
      val sk = li.groupBy(col("flag"))
        .agg(Kmv.kmvOf(Kmv.hash63(col("okey"))).as("sk"))
      // exact-verify leg in ONE corpus shuffle (the r12 verdict's
      // de-linearization — the old distinct() + okey self-join
      // measured a 0.89 exponent at 10×): per-okey distinct flag SET
      // (collect_set map-side-combines to a ≤|flag-domain| array),
      // then |A| per flag and |A∩B| per flag pair both fall out of
      // row-local explodes over that bounded frame — the downstream
      // groupBys aggregate ≤ 2³ flag keys, never corpus rows.
      val fs = li.groupBy(col("okey"))
        .agg(collect_set(col("flag")).as("flags"))
      val tot = fs.select(explode(col("flags")).as("flag"))
        .groupBy(col("flag")).agg(count(lit(1)).as("n_exact"))
      val inter = fs.select(explode(col("flags")).as("fa"), col("flags"))
        .select(col("fa"), explode(col("flags")).as("fb"))
        .where(col("fa") < col("fb"))
        .groupBy(col("fa").as("flag_a"), col("fb").as("flag_b"))
        .agg(count(lit(1)).as("n_inter"))
      val skt = sk.join(broadcast(tot), "flag")
      val pairs = skt.as("a").join(broadcast(skt.as("b")), col("a.flag") < col("b.flag"))
        .select(col("a.flag").as("flag_a"), col("b.flag").as("flag_b"),
          col("a.n_exact").as("n_a"), col("b.n_exact").as("n_b"),
          col("a.sk").as("ska"), col("b.sk").as("skb"))
        .join(broadcast(inter), Seq("flag_a", "flag_b"))
      val nUnion = col("n_a") + col("n_b") - col("n_inter")
      pairs.select(col("flag_a"), col("flag_b"), col("n_a"), col("n_b"),
          col("n_inter"), nUnion.as("n_union"),
          Rounding.r(col("n_inter").cast("double") / nUnion, 4).as("jaccard"),
          (abs(Kmv.distinctEst(col("ska")) - col("n_a")) <=
            lit(0.10) * col("n_a") + lit(32)).as("da_ok"),
          (abs(Kmv.distinctEst(col("skb")) - col("n_b")) <=
            lit(0.10) * col("n_b") + lit(32)).as("db_ok"),
          (abs(Kmv.intersectEst(col("ska"), col("skb")) - col("n_inter")) <=
            lit(0.15) * col("n_inter") + lit(32)).as("inter_ok"),
          (abs(Kmv.unionEst(col("ska"), col("skb")) - nUnion) <=
            lit(0.10) * nUnion + lit(32)).as("union_ok"),
          (abs(Kmv.jaccardEst(col("ska"), col("skb")) -
            col("n_inter").cast("double") / nUnion) <= lit(0.08)).as("jac_ok"))
        .orderBy(col("flag_a"), col("flag_b"))
    },

    // B73: KMV sketch ROLLUP — B57's stored-sketch workflow with the
    // bottom-k sketch: daily per-type KMV sketches of the user_id
    // domain are the stored pre-aggregate, per-type totals come from
    // kmvMerge over the sketch COLUMN (≤ k longs per group shuffle,
    // never rows). KMV's distinct-bottom-k is order-free, so the
    // merged sketch is BIT-IDENTICAL to sketching all events directly
    // — merge_det_ok gates that in the driver (not just the spec):
    // array-equality of the rolled-up and direct sketches. est_ok is
    // the B22/B57 construction (exact recount + bound flag; KMV
    // estimates are hash-deterministic, so flags cannot flap).
    "q_kmv_rollup" -> { (s, dir) =>
      import graft.functions.Kmv
      val ev = Tables.events(s, dir)
        .select(col("event_type"), to_date(col("ts")).as("day"),
          col("user_id"), Kmv.hash63(col("user_id")).as("h"))
      val daily = ev.groupBy(col("event_type"), col("day"))
        .agg(Kmv.kmvOf(col("h")).as("sk"), count(lit(1)).as("n"))
      val rolled = daily.groupBy(col("event_type"))
        .agg(Kmv.kmvMerge(col("sk")).as("sk"),
          sum(col("n")).as("n_events"), count(lit(1)).as("n_days"))
      val direct = ev.groupBy(col("event_type"))
        .agg(Kmv.kmvOf(col("h")).as("dsk"),
          countDistinct(col("user_id")).as("n_exact"))
      rolled.join(direct, "event_type")
        .select(col("event_type"), col("n_events"), col("n_days"),
          col("n_exact"),
          (abs(Kmv.distinctEst(col("sk")) - col("n_exact")) <=
            lit(0.10) * col("n_exact") + lit(32)).as("est_ok"),
          (col("sk") === col("dsk")).as("merge_det_ok"))
        .orderBy(col("event_type"))
    },

    // B74: the SQL-TEXT KMV path (B68/B70/B71's construction for the
    // FOURTH registered sketch surface): the migrating user's literal
    // set-expression workflow authored as spark.sql over a temp view —
    // daily `kmv_sketch(kmv_hash(user_id))` pre-aggregates roll up
    // via `kmv_union`, and the injected scalar estimator family
    // answers per-type audience sizes and pairwise overlaps from the
    // SKETCH COLUMNS alone (every kmv_* SQL name expands to the same
    // native-expression composition the typed helpers build — zero
    // UDFs). Gate output = exact recounts + bound flags, the
    // q_kmv_setops construction on the events cross-type audience.
    "q_sql_kmv" -> { (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
        .createOrReplaceTempView("events_ksql")
      val est = s.sql("""
        WITH daily AS (
          SELECT event_type, day, kmv_sketch(kmv_hash(user_id)) AS sk
          FROM events_ksql GROUP BY event_type, day),
        rolled AS (
          SELECT event_type, kmv_union(sk) AS sk FROM daily GROUP BY event_type)
        SELECT a.event_type AS type_a, b.event_type AS type_b,
          kmv_distinct_est(a.sk) AS da_est, kmv_distinct_est(b.sk) AS db_est,
          kmv_intersect_est(a.sk, b.sk) AS inter_est,
          kmv_union_est(a.sk, b.sk) AS union_est,
          kmv_jaccard_est(a.sk, b.sk) AS jac_est
        FROM rolled a JOIN rolled b ON a.event_type < b.event_type""")
      // exact-verify leg: the q_kmv_setops one-shuffle construction —
      // per-user distinct type set, then totals and pairwise
      // intersections from row-local explodes (no distinct self-join)
      val fs = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(collect_set(col("event_type")).as("types"))
      val t = fs.select(explode(col("types")).as("event_type"))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val inter = fs.select(explode(col("types")).as("fa"), col("types"))
        .select(col("fa"), explode(col("types")).as("fb"))
        .where(col("fa") < col("fb"))
        .groupBy(col("fa").as("type_a"), col("fb").as("type_b"))
        .agg(count(lit(1)).as("n_inter"))
      val nUnion = col("n_a") + col("n_b") - col("n_inter")
      est.join(broadcast(t.select(col("event_type").as("type_a"),
          col("n").as("n_a"))), "type_a")
        .join(broadcast(t.select(col("event_type").as("type_b"),
          col("n").as("n_b"))), "type_b")
        .join(broadcast(inter), Seq("type_a", "type_b"))
        .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
          col("n_inter"), nUnion.as("n_union"),
          (abs(col("da_est") - col("n_a")) <=
            lit(0.10) * col("n_a") + lit(32)).as("da_ok"),
          (abs(col("db_est") - col("n_b")) <=
            lit(0.10) * col("n_b") + lit(32)).as("db_ok"),
          (abs(col("inter_est") - col("n_inter")) <=
            lit(0.15) * col("n_inter") + lit(32)).as("inter_ok"),
          (abs(col("union_est") - nUnion) <=
            lit(0.10) * nUnion + lit(32)).as("union_ok"),
          (abs(col("jac_est") - col("n_inter").cast("double") / nUnion) <=
            lit(0.08)).as("jac_ok"))
        .orderBy(col("type_a"), col("type_b"))
    },

    // B69: mergeable PERCENTILE sketch ROLLUP — the third StarRocks
    // sketch-column workflow beside B57 (HLL) and B58 (BITMAP): the
    // PERCENTILE type's percentile_union. Daily per-type quantile
    // sketches (functions.Qsk, the MRL/KLL compactor family — ≤ k
    // values per level, weight-conserving compaction) are the stored
    // pre-aggregate; per-type p50/p90 come from MERGING sketches,
    // never re-scanning raw events. Sketch values are partition-order
    // dependent → the gate output carries exact counts + rank-bound
    // flags (the B22/B42/B57 construction): each estimate's actual
    // rank, recomputed against the raw rows via a 5-row broadcast
    // join, must sit within 5% of target (QskSpec pins the tighter
    // ~2% bound and weight conservation under shuffled partitionings).
    "q_percentile_rollup" -> { (s, dir) =>
      import graft.functions.Qsk
      val daily = Tables.events(s, dir)
        .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
        .groupBy(col("event_type"), col("day"))
        .agg(Qsk.qskOf(col("value")).as("sk"), count(lit(1)).as("n"))
      val rolled = daily.groupBy(col("event_type"))
        .agg(Qsk.qskMergeQuantile(col("sk"), 0.5).as("p50_est"),
          Qsk.qskMergeQuantile(col("sk"), 0.9).as("p90_est"),
          sum(col("n")).as("n_events"), count(lit(1)).as("n_days"))
      val ranks = Tables.events(s, dir)
        .join(broadcast(rolled), "event_type")
        .groupBy(col("event_type"), col("n_events"), col("n_days"))
        .agg(sum((col("value") <= col("p50_est")).cast("long")).as("r50"),
          sum((col("value") <= col("p90_est")).cast("long")).as("r90"))
      def ok(r: String, q: Double) =
        abs(col(r) - lit(q) * col("n_events")) <=
          lit(0.05) * col("n_events") + lit(1.0)
      ranks.select(col("event_type"), col("n_events"), col("n_days"),
          ok("r50", 0.5).as("p50_ok"), ok("r90", 0.9).as("p90_ok"))
        .orderBy(col("event_type"))
    },

    // B59: SLIDING-window exact distinct users (2 h windows every
    // 30 min). The naive form re-shuffles every raw event once per
    // overlapping window (4× here, 48× for day/half-hour); instead
    // each 30-min bucket folds to ONE compressed bitmap and only the
    // bucket bitmaps fan out ×4 and OR-merge per window — exact
    // distincts with re-aggregation ∝ buckets × overlap, never
    // ∝ events × overlap. The streaming twin is
    // EventStream.bitmapDistinctStream with a slide.
    "q_sliding_distinct" -> { (s, dir) =>
      import graft.functions.Rbm
      val bucketed = Tables.events(s, dir)
        .groupBy(org.apache.spark.sql.functions.window(col("ts"), "30 minutes"))
        .agg(Rbm.rbmOf(col("user_id")).as("bm"), count(lit(1)).as("n"))
        .select(col("window.start").as("bucket"), col("bm"), col("n"))
      bucketed
        .select(col("bucket"), col("bm"), col("n"),
          explode(sequence(lit(0), lit(3))).as("off"))
        .withColumn("ws", expr("timestampadd(MINUTE, -30 * off, bucket)"))
        .groupBy(col("ws"))
        .agg(Rbm.rbmUnionCount(col("bm")).as("n_users"), sum(col("n")).as("n_events"))
        .select(date_format(col("ws"), TsFmt).as("window_start"),
          col("n_users"), col("n_events"))
        .orderBy(col("window_start"))
    },

    // B60: median absolute deviation — the robust dispersion statistic
    // (outlier-insensitive where stddev is not). Two exact-percentile
    // passes: per-group median, broadcast back (group-count-sized),
    // median of absolute deviations; the percentile aggregate is the
    // counting-sort form q_percentiles pinned, so both passes stay
    // hash aggregates.
    "q_mad" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val med = li.groupBy(col("l_returnflag"))
        .agg(percentile(col("l_quantity"), lit(0.5)).as("med"))
      li.join(broadcast(med), "l_returnflag")
        .groupBy(col("l_returnflag"))
        .agg(
          Rounding.r(percentile(abs(col("l_quantity") - col("med")), lit(0.5)), 4).as("mad"),
          Rounding.r(max(col("med")), 4).as("median"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },

    // B50: deterministic mode + exact median per group. Library mode()
    // tie-breaking is engine-specific, so the mode is the explicit
    // (count desc, bucket asc) argmax — one partial-agg'd count pass
    // plus a 5-row argmax; the median is the exact interpolating
    // percentile both engines define identically.
    "q_mode_median" -> { (s, dir) =>
      val e = Tables.events(s, dir)
        .select(col("event_type"), col("value"),
          floor(col("value")).cast("long").as("bucket"))
      val counts = e.groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("c"))
      val mode = counts.groupBy(col("event_type"))
        .agg(max_by(col("bucket"), struct(col("c"), -col("bucket"))).as("mode_bucket"))
      val med = e.groupBy(col("event_type"))
        .agg(Rounding.r(median(col("value")), 4).as("median_value"),
          count(lit(1)).as("n"))
      mode.join(med, "event_type").orderBy(col("event_type"))
    },

    // B56: per-group least-squares regression (regr_slope /
    // regr_intercept / r² of price on quantity). Library regr_* sums
    // doubles in partition order — not cross-engine-stable — so the
    // moments are EXACT integer aggregates instead: x = quantity,
    // y = price cents (the B3 floor(x·100+0.5) recovery), Σx Σy Σx²
    // Σxy Σy² as DECIMAL(38,0) (DuckDB: HUGEINT). The closed forms
    // divide one exact integer by another, so each output is one
    // correctly-rounded double op + one 4dp round: slope = (nΣxy −
    // ΣxΣy)/(nΣx² − Σx²), intercept = (ΣyΣx² − ΣxΣxy)/same, r² =
    // num²/(denx·deny) composed as (num/denx)·(num/deny) because num²
    // overflows even int128 at sf1. nΣy² stays inside 38 digits to
    // ~10⁵× sf1 — the 100 TB envelope.
    "q_regr" -> { (s, dir) =>
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val m = Tables.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_linestatus"),
          floor(col("l_quantity") + 0.5).cast(dec).as("x"),
          floor(col("l_extendedprice") * 100 + 0.5).cast(dec).as("y"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).cast(dec).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("y") * col("y")).as("syy"))
      m.select(col("l_returnflag"), col("l_linestatus"),
          col("n").cast("long").as("n"),
          (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
          (col("sy") * col("sxx") - col("sx") * col("sxy")).as("inum"),
          (col("n") * col("sxx") - col("sx") * col("sx")).as("denx"),
          (col("n") * col("syy") - col("sy") * col("sy")).as("deny"))
        .select(col("l_returnflag"), col("l_linestatus"), col("n"),
          when(col("denx") === 0, lit(null))
            .otherwise(Rounding.r(col("num").cast("double") /
              col("denx").cast("double"), 4)).as("slope_cents"),
          when(col("denx") === 0, lit(null))
            .otherwise(Rounding.r(col("inum").cast("double") /
              col("denx").cast("double"), 4)).as("intercept_cents"),
          when(col("denx") === 0 || col("deny") === 0, lit(null))
            .otherwise(Rounding.r((col("num").cast("double") / col("denx").cast("double")) *
              (col("num").cast("double") / col("deny").cast("double")), 6)).as("r2"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // B44: correlated scalar subquery — Catalyst DECORRELATES the
    // per-row subquery into an aggregate + left join (RewriteCorrelated
    // ScalarSubquery); without that rewrite this shape is a per-row
    // table scan. Exercised through the SQL surface (temp view), the
    // form users actually write.
    "q_correlated_subquery" -> { (s, dir) =>
      Tables.customer(s, dir).createOrReplaceTempView("gq_customer")
      Tables.orders(s, dir).createOrReplaceTempView("gq_orders")
      s.sql("""
        SELECT c_custkey, c_mktsegment,
          (SELECT COUNT(*) FROM gq_orders o WHERE o.o_custkey = c.c_custkey) AS n_orders,
          (SELECT COALESCE(floor(SUM(o_totalprice) * 100 + 0.5) / 100, 0.0)
           FROM gq_orders o WHERE o.o_custkey = c.c_custkey) AS total_spent
        FROM gq_customer c
        WHERE c_custkey < 300
        ORDER BY c_custkey""")
    },

    // B45: JSON map explode — parse the props JSON into a map and
    // LATERAL-explode its entries (schema-on-read over semi-structured
    // payloads); one Generate, grouped tally per key
    "q_map_explode" -> { (s, dir) =>
      Tables.events(s, dir)
        .where(col("props").isNotNull)
        .select(explode(from_json(col("props"), MapType(StringType, StringType)))
          .as(Seq("pkey", "pval")))
        .groupBy(col("pkey"))
        .agg(count(lit(1)).as("n"), count_distinct(col("pval")).as("n_vals"))
        .orderBy(col("pkey"))
    },

    // B46: null-safe equality join (<=> / IS NOT DISTINCT FROM):
    // derived nullable keys join with NULL <=> NULL matching — the
    // semantics a plain = join silently drops. Both sides AGGREGATE
    // to segment cardinality BEFORE the join: the join key has ~5
    // values, so joining the raw rows first would fan out
    // |customers_seg| × |orders_seg| per segment (measured 121 s at
    // sf0.1) for the same answer the 5×5-row join gives.
    "q_null_safe_join" -> { (s, dir) =>
      val cAgg = Tables.customer(s, dir)
        .select(col("c_custkey"), nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"))
        .groupBy(col("seg"))
        .agg(count_distinct(col("c_custkey")).as("n_cust"))
      val oAgg = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"),
          nullif(col("c_mktsegment"), lit("BUILDING")).as("oseg"))
        .groupBy(col("oseg"))
        .agg(count_distinct(col("o_orderkey")).as("n_ord"))
      cAgg.join(oAgg, col("seg") <=> col("oseg"))
        .select(coalesce(col("seg"), lit("NULL_SEG")).as("seg"),
          col("n_cust"), col("n_ord"))
        .orderBy(col("seg"))
    },

    // B41: date/time function surface — trunc granularities, ISO week
    // fields, interval arithmetic, month boundaries; evaluated
    // identically by the oracle (UTC session, string-exported
    // timestamps per SURVEY §5)
    "q_datetime_funcs" -> { (s, dir) =>
      Tables.orders(s, dir)
        .where(col("o_orderkey") < 500)
        .select(col("o_orderkey"),
          date_format(date_trunc("week", col("o_orderdate")), TsFmt).as("wk_start"),
          date_format(date_trunc("quarter", col("o_orderdate")), TsFmt).as("q_start"),
          dayofweek(col("o_orderdate")).cast("long").as("dow"),
          weekofyear(col("o_orderdate")).cast("long").as("iso_week"),
          quarter(col("o_orderdate")).cast("long").as("qtr"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
          date_format(col("o_orderdate") + expr("INTERVAL 90 DAY"), TsFmt).as("due_90d"),
          datediff(lit("2026-01-01").cast("date"), col("o_orderdate").cast("date"))
            .cast("long").as("age_days"))
        .orderBy(col("o_orderkey"))
    },

    // B39: explicit GROUPING SETS with grouping_id — finer than
    // cube/rollup (caller picks exactly which set combinations
    // materialize; here detail + per-status + grand total), gid
    // disambiguates a NULL group value from a rolled-up level
    "q_grouping_sets" -> { (s, dir) =>
      Tables.orders(s, dir)
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")), Seq.empty),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          Rounding.r(sum(col("o_totalprice")), 2).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
          col("gid"), col("n"), col("total"))
        .orderBy(col("gid"), col("status"), col("prio"))
    },

    // B40: statistical aggregate surface — corr/covar/stddev/var per
    // group (engines differ in merge algorithm but agree to well past
    // 4dp; single hash aggregation, partial map-side merge)
    "q_stats_agg" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          Rounding.r(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
          Rounding.r(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          Rounding.r(var_samp(col("l_quantity")), 4).as("var_qty"),
          Rounding.r(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cov_qp"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },

    // B38: value-picking window frames — first/last/nth over the full
    // partition (explicit unbounded frame: last_value under the
    // default frame would read the current row, a classic silent bug)
    "q_first_last" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          first(col("event_type")).over(w).as("first_type"),
          last(col("event_type")).over(w).as("last_type"),
          nth_value(col("event_type"), 2).over(w).as("second_type"))
        .where(col("event_id") % 100 === 0)
        .orderBy(col("event_id"))
    },

    // B51: sequence pattern match (ClickHouse/StarRocks
    // sequenceMatch('(?1).*(?2).*(?3)') analogue, no window bound):
    // per user, did the steps occur in strict time order anywhere in
    // the history. Earliest-chain min-chaining — matched iff
    // ∃ t1<t2<t3 — in B29's staged-aggregation shape (the stages
    // co-partition on user_id after one exchange); two patterns
    // evaluated from the same stages.
    "q_sequence_match" -> { (s, dir) =>
      val e = Tables.events(s, dir).select(col("user_id"), col("ts"), col("event_type"))
      val s1 = e.groupBy(col("user_id")).agg(
        min(when(col("event_type") === "signup", col("ts"))).as("t1"),
        min(when(col("event_type") === "view", col("ts"))).as("v1"))
      val s2 = e.join(s1, "user_id").groupBy(col("user_id"), col("t1"), col("v1")).agg(
        min(when(col("event_type") === "purchase" && col("ts") > col("t1"), col("ts"))).as("t2"),
        min(when(col("event_type") === "click" && col("ts") > col("v1"), col("ts"))).as("v2"))
      val s3 = e.join(s2, "user_id").groupBy(col("user_id"), col("t2"), col("v2")).agg(
        min(when(col("event_type") === "error" && col("ts") > col("t2"), col("ts"))).as("t3"))
      s3.select(col("user_id"),
          col("t3").isNotNull.as("m_signup_purchase_error"),
          col("v2").isNotNull.as("m_view_click"))
        .orderBy(col("user_id"))
    },

    // B53: array-function surface (StarRocks/ClickHouse array_* parity)
    // — set-aggregated per-user type arrays transformed with the array
    // algebra (sort/size/contains/slice/position/intersect/reverse),
    // exported as joined strings so the compare is
    // representation-stable. One hash aggregation; the array ops are
    // row-local expressions on k-sized (≤5-element) arrays.
    "q_array_funcs" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(sort_array(collect_set(col("event_type"))).as("types"))
        .select(col("user_id"),
          concat_ws("|", col("types")).as("types_joined"),
          size(col("types")).cast("long").as("n_types"),
          array_contains(col("types"), "purchase").as("has_purchase"),
          concat_ws("|", slice(col("types"), 1, 2)).as("first2"),
          array_position(col("types"), "error").cast("long").as("error_pos"),
          concat_ws("|", sort_array(
            array_intersect(col("types"),
              array(lit("purchase"), lit("error"))))).as("conversions"),
          concat_ws("|", reverse(col("types"))).as("rev"))
        .orderBy(col("user_id"))
    },

    // B54: equi-depth histogram per group (the ANALYZE-stats shape:
    // every bin holds ~the same row count, bin EDGES carry the
    // information) — ntile over the (value, key) total order inside
    // each group partition, then one aggregation to (bin, lo, hi, n);
    // the window is partitioned by group, never a global sort
    "q_equidepth_histogram" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, dir)
        .select(col("o_orderpriority").as("prio"), col("o_totalprice"),
          ntile(8).over(w).cast("long").as("bin"))
        .groupBy(col("prio"), col("bin"))
        .agg(Rounding.r(min(col("o_totalprice")), 2).as("lo"),
          Rounding.r(max(col("o_totalprice")), 2).as("hi"),
          count(lit(1)).as("n"))
        .orderBy(col("prio"), col("bin"))
    },

    // B52: non-overlapping sequence count (ClickHouse sequenceCount
    // analogue): per user, how many disjoint signup→purchase chains,
    // greedy state machine over the time-ordered history. ONE
    // aggregation pass: collect the step-filtered (ts, event_id, step)
    // list, sort, left-fold the state machine as an array expression —
    // the fold order is the (ts, event_id) total order, so both
    // engines replay the identical transition sequence. Shuffle
    // carries only signup/purchase events (step-filtered before the
    // exchange, the ops.Funnel working-set bound).
    "q_sequence_count" -> { (s, dir) =>
      Funnel.sequenceCount(Tables.events(s, dir),
          keyCol = col("user_id"), tsCol = col("ts"), tieCol = col("event_id"),
          typeCol = col("event_type"),
          openType = "signup", closeType = "purchase")
        .select(col("key").as("user_id"), col("n_matches"))
        .orderBy(col("user_id"))
    })

  // lazy: oracleSqlBase is declared below (initialization order)
  lazy val oracleSql: Map[String, String] = oracleSqlBase +
    // B71 rides B32's replay: the SQL-text scalar implements the same
    // multi-anchor max contract, so one oracle gates both paths
    ("q_sql_funnel" -> oracleSqlBase("q_window_funnel_multi"))

  private val oracleSqlBase: Map[String, String] = Map(
    // The three sketch queries emit exact values + a boolean bound
    // flag (est_ok / pNN_ok) computed Spark-side from the
    // engine-internal estimate; the oracle recomputes the exact side
    // and asserts the flag TRUE — a per-round error-bound audit in
    // place of the former rows-only check.
    "q_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_exact,
        |  true AS est_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_approx_percentile" ->
      """SELECT l_returnflag, count(*) AS n, true AS p25_ok,
        |  true AS p50_ok, true AS p75_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_hll_rollup" ->
      """SELECT event_type, count(*) AS n_events,
        |  count(DISTINCT CAST(ts AS DATE)) AS n_days,
        |  count(DISTINCT user_id) AS n_exact, true AS est_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_kmv_setops" ->
      """WITH d AS (SELECT DISTINCT l_returnflag AS f, l_orderkey AS k FROM lineitem),
        |t AS (SELECT f, count(*) AS n FROM d GROUP BY f),
        |i AS (SELECT a.f AS fa, b.f AS fb, count(*) AS n_inter
        |      FROM d a JOIN d b ON a.k = b.k AND a.f < b.f GROUP BY 1, 2)
        |SELECT fa AS flag_a, fb AS flag_b, ta.n AS n_a, tb.n AS n_b, n_inter,
        |  ta.n + tb.n - n_inter AS n_union,
        |  round(CAST(n_inter AS DOUBLE) / (ta.n + tb.n - n_inter), 4) AS jaccard,
        |  true AS da_ok, true AS db_ok, true AS inter_ok,
        |  true AS union_ok, true AS jac_ok
        |FROM i JOIN t ta ON ta.f = fa JOIN t tb ON tb.f = fb
        |ORDER BY flag_a, flag_b""".stripMargin,
    "q_sql_kmv" ->
      """WITH d AS (SELECT DISTINCT event_type AS f, user_id AS u FROM events),
        |t AS (SELECT f, count(*) AS n FROM d GROUP BY f),
        |i AS (SELECT a.f AS fa, b.f AS fb, count(*) AS n_inter
        |      FROM d a JOIN d b ON a.u = b.u AND a.f < b.f GROUP BY 1, 2)
        |SELECT fa AS type_a, fb AS type_b, ta.n AS n_a, tb.n AS n_b, n_inter,
        |  ta.n + tb.n - n_inter AS n_union,
        |  true AS da_ok, true AS db_ok, true AS inter_ok,
        |  true AS union_ok, true AS jac_ok
        |FROM i JOIN t ta ON ta.f = fa JOIN t tb ON tb.f = fb
        |ORDER BY type_a, type_b""".stripMargin,
    "q_kmv_rollup" ->
      """SELECT event_type, count(*) AS n_events,
        |  count(DISTINCT CAST(ts AS DATE)) AS n_days,
        |  count(DISTINCT user_id) AS n_exact,
        |  true AS est_ok, true AS merge_det_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_percentile_rollup" ->
      """SELECT event_type, count(*) AS n_events,
        |  count(DISTINCT CAST(ts AS DATE)) AS n_days,
        |  true AS p50_ok, true AS p90_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_sql_percentile" ->
      """SELECT event_type, count(*) AS n_events,
        |  true AS p50_ok, true AS p90_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // Spark array_position yields 0 for a miss; DuckDB list_position
    // yields NULL → coalesce. list_reverse is absent in DuckDB 1.0 →
    // descending re-sort of the ascending-sorted list is its reverse.
    "q_array_funcs" ->
      """WITH t AS (SELECT user_id,
        |  list_sort(list_distinct(list(event_type))) AS types
        |  FROM events GROUP BY user_id)
        |SELECT user_id,
        |  array_to_string(types, '|') AS types_joined,
        |  CAST(len(types) AS BIGINT) AS n_types,
        |  list_contains(types, 'purchase') AS has_purchase,
        |  array_to_string(types[1:2], '|') AS first2,
        |  CAST(coalesce(list_position(types, 'error'), 0) AS BIGINT) AS error_pos,
        |  array_to_string(list_sort(list_intersect(types,
        |    ['purchase', 'error'])), '|') AS conversions,
        |  array_to_string(list_sort(types, 'DESC'), '|') AS rev
        |FROM t ORDER BY user_id""".stripMargin,
    "q_equidepth_histogram" ->
      """WITH b AS (SELECT o_orderpriority AS prio, o_totalprice,
        |  CAST(ntile(8) OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS bin
        |  FROM orders)
        |SELECT prio, bin, round(min(o_totalprice), 2) AS lo,
        |  round(max(o_totalprice), 2) AS hi, count(*) AS n
        |FROM b GROUP BY prio, bin ORDER BY prio, bin""".stripMargin,
    "q_sequence_match" ->
      """WITH s1 AS (SELECT user_id,
        |  min(CASE WHEN event_type = 'signup' THEN ts END) AS t1,
        |  min(CASE WHEN event_type = 'view' THEN ts END) AS v1
        |  FROM events GROUP BY user_id),
        |s2 AS (SELECT e.user_id, any_value(s1.t1) AS t1, any_value(s1.v1) AS v1,
        |  min(CASE WHEN e.event_type = 'purchase' AND e.ts > s1.t1 THEN e.ts END) AS t2,
        |  min(CASE WHEN e.event_type = 'click' AND e.ts > s1.v1 THEN e.ts END) AS v2
        |  FROM events e JOIN s1 USING (user_id) GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, any_value(s2.v2) AS v2,
        |  min(CASE WHEN e.event_type = 'error' AND e.ts > s2.t2 THEN e.ts END) AS t3
        |  FROM events e JOIN s2 USING (user_id) GROUP BY e.user_id)
        |SELECT user_id,
        |  t3 IS NOT NULL AS m_signup_purchase_error,
        |  v2 IS NOT NULL AS m_view_click
        |FROM s3 ORDER BY user_id""".stripMargin,
    // the recursion replays Spark's aggregate() fold
    // transition-for-transition: same (ts, event_id) order, same state
    // variables, one recursion step per event (depth = max events per
    // user). NOT list_reduce: DuckDB 1.0's list_reduce mis-evaluates
    // struct-accumulator folds under multi-row vectorization (verified:
    // a fold returning cnt=5 for a user standalone returns 0 when 150
    // rows fold in one vector) — the recursive CTE is the same pattern
    // dedup_clusters' oracle already relies on.
    "q_sequence_count" ->
      """WITH RECURSIVE f AS (SELECT user_id,
        |  CASE WHEN event_type = 'signup' THEN 1 ELSE 2 END AS step,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
        |  FROM events WHERE event_type IN ('signup', 'purchase')),
        |m AS (SELECT user_id, max(seq) AS mx FROM f GROUP BY user_id),
        |st AS (
        |  SELECT user_id, CAST(0 AS BIGINT) AS seq, 0 AS open,
        |         CAST(0 AS BIGINT) AS cnt
        |  FROM m
        |  UNION ALL
        |  SELECT s.user_id, s.seq + 1,
        |    CASE WHEN f.step = 1 THEN 1
        |         WHEN f.step = 2 AND s.open = 1 THEN 0
        |         ELSE s.open END,
        |    s.cnt + CASE WHEN f.step = 2 AND s.open = 1 THEN 1 ELSE 0 END
        |  FROM st s JOIN f ON f.user_id = s.user_id AND f.seq = s.seq + 1)
        |SELECT st.user_id AS user_id, st.cnt AS n_matches
        |FROM st JOIN m ON st.user_id = m.user_id AND st.seq = m.mx
        |ORDER BY st.user_id""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |round(sum(l_quantity), 2) AS sum_qty,
        |round(sum(l_extendedprice), 2) AS sum_base_price,
        |round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |round(avg(l_quantity), 4) AS avg_qty,
        |round(avg(l_extendedprice), 4) AS avg_price,
        |round(avg(l_discount), 4) AS avg_disc,
        |count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_unshipped" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
        |round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, o_orderkey LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      """SELECT n_name,
        |round(CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
        |  (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS DOUBLE) / 10000.0, 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "q_status_counts" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_large_orders" ->
      """WITH big AS (SELECT l_orderkey, sum(l_quantity) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150),
        |sel AS (SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
        |  FROM orders JOIN big ON o_orderkey = l_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 100)
        |SELECT c_name, c_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
        |  round(o_totalprice, 2) AS o_totalprice, round(sum_qty, 2) AS sum_qty
        |FROM sel ORDER BY o_totalprice DESC, o_orderkey""".stripMargin,
    "q_waiting_supplier" ->
      """WITH lo AS (SELECT l_orderkey, l_suppkey,
        |    (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |po AS (SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp,
        |    count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
        |  FROM lo GROUP BY 1),
        |w AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lo WHERE late)
        |SELECT l_suppkey, CAST(count(*) AS BIGINT) AS numwait
        |FROM w JOIN po USING (l_orderkey)
        |WHERE n_supp >= 2 AND n_late = 1
        |GROUP BY l_suppkey ORDER BY numwait DESC, l_suppkey""".stripMargin,
    // B77: Q17's correlated scalar replayed decorrelated — exact
    // per-part (n, Σqty) BIGINT pair joined to the fact scan, the
    // threshold compared by cross-multiplication (5·n·qty < Σqty —
    // no divide, no 0.2 literal, no avg: FP-free in BOTH engines),
    // avg_yearly as integer round-half-up of cents/7 with one final
    // exact-input /100.0 (DuckDB `//` = Spark `DIV` on BIGINT)
    "q_small_qty_revenue" ->
      """WITH thr AS (SELECT l_partkey AS t_partkey,
        |    count(*) AS n, sum(CAST(l_quantity AS BIGINT)) AS sq
        |  FROM lineitem GROUP BY 1)
        |SELECT p_brand, count(*) AS n_small,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  ((2 * sum(cents) + 7) // 14) / 100.0 AS avg_yearly
        |FROM (
        |  SELECT p_brand,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  JOIN thr ON t_partkey = l_partkey
        |  WHERE 5 * n * CAST(l_quantity AS BIGINT) < sq)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    // B78: the Q20-shaped nested IN + correlated scalar, replayed as
    // two part-keyed aggregates + a semi join (same decorrelation
    // Catalyst applies)
    "q_excess_supply" ->
      """WITH red AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
        |sp AS (SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
        |  FROM lineitem WHERE l_partkey IN (SELECT p_partkey FROM red)
        |  GROUP BY 1, 2),
        |tot AS (SELECT l_partkey AS t_partkey, 0.2 * sum(l_quantity) AS thr
        |  FROM lineitem GROUP BY 1)
        |SELECT s_suppkey, s_name, n_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (
        |  SELECT sp.l_suppkey FROM sp JOIN tot ON t_partkey = l_partkey
        |  WHERE qty > thr)
        |ORDER BY s_suppkey""".stripMargin,
    // B79: Q2's correlated MIN replayed decorrelated — one per-part
    // MIN over the EU-restricted (part, supplier) unit-cost rollup
    // joined back (the same plan Catalyst derives); unit cost is
    // MIN(cents // qty), exact BIGINT both engines
    "q_min_cost_supplier" ->
      """WITH ps AS (SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |    min(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |        // CAST(l_quantity AS BIGINT)) AS ps_supplycost
        |  FROM lineitem GROUP BY 1, 2),
        |eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |mn AS (SELECT ps_partkey AS m_partkey,
        |    min(ps_supplycost) AS m_cost
        |  FROM ps JOIN eu ON s_suppkey = ps_suppkey GROUP BY 1)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
        |  ps_supplycost
        |FROM part
        |JOIN ps ON ps_partkey = p_partkey
        |JOIN eu ON s_suppkey = ps_suppkey
        |JOIN mn ON m_partkey = p_partkey
        |WHERE p_type = 'PROMO' AND p_size <= 10
        |  AND ps_supplycost = m_cost
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,
    "q_filter_pushdown" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue, count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "q_window_running" ->
      """SELECT l_suppkey,
        |row_number() OVER w AS rn, l_orderkey, l_linenumber,
        |round(sum(l_extendedprice) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_rev
        |FROM lineitem WHERE l_suppkey < 5
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
        |ORDER BY l_suppkey, rn""".stripMargin,
    "q_distinct_users" ->
      """SELECT event_type, count(*) AS n_events, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // B68: plain distincts — the bitmap machinery must agree exactly
    "q_sql_surface" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        |  (SELECT count(DISTINCT user_id) FROM events) AS total_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // B66: same trailing frame, same lower-median element pick —
    // DuckDB's list window + list_sort + 1-based element index
    "q_moving_median" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |               FROM events GROUP BY 1, 2),
        |fr AS (SELECT event_type, day, n,
        |  list_sort(list(n) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS vs
        |  FROM daily)
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n,
        |  vs[CAST((len(vs) + 1) // 2 AS INT)] AS med7
        |FROM fr ORDER BY event_type, day""".stripMargin,
    // B65: same distinct-value cumulative walk; weights summed as
    // BIGINT from the cast (sum of integral doubles would be exact
    // too, but the cast keeps HUGEINT out of the rank test's operands)
    "q_weighted_percentile" ->
      """WITH g AS (SELECT l_returnflag, l_extendedprice,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (SELECT l_returnflag, l_extendedprice, w,
        |  CAST(sum(w) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS BIGINT) AS cum,
        |  CAST(sum(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tot
        |  FROM g)
        |SELECT l_returnflag,
        |  min(CASE WHEN cum * 2 >= tot THEN l_extendedprice END) AS w_median,
        |  min(CASE WHEN cum * 10 >= tot * 9 THEN l_extendedprice END) AS w_p90,
        |  max(tot) AS total_qty
        |FROM c GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // B64: same trailing-8 frame (list_slice of the running window),
    // same left-to-right fold, same 1<<k weights — 1-based lambda
    // index maps k = n - i (Spark's 0-based gives n - 1 - i)
    "q_ewma" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |               FROM events GROUP BY 1, 2),
        |fr AS (SELECT event_type, day, n,
        |  list_slice(list(n) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 7 PRECEDING AND CURRENT ROW), 1, 8) AS vs
        |  FROM daily)
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n,
        |  round(
        |    list_reduce(list_prepend(0.0::DOUBLE, list_transform(vs, (x, i) ->
        |      CAST(x AS DOUBLE) / CAST(1 << (len(vs) - i) AS DOUBLE))),
        |      (a, b) -> a + b) /
        |    list_reduce(list_prepend(0.0::DOUBLE, list_transform(vs, (x, i) ->
        |      1.0::DOUBLE / CAST(1 << (len(vs) - i) AS DOUBLE))),
        |      (a, b) -> a + b), 4) AS ewma
        |FROM fr ORDER BY event_type, day""".stripMargin,
    // B62: DuckDB lacks DISTINCT window aggregates too — the oracle
    // replays the RANGE frame as a correlated distinct count on the
    // same floored epoch seconds
    "q_window_distinct" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS tss FROM events)
        |SELECT e.event_id, e.user_id, e.tss AS ts,
        |  (SELECT count(DISTINCT e2.event_type) FROM e e2
        |   WHERE e2.user_id = e.user_id
        |     AND e2.tsec BETWEEN e.tsec - 3600 AND e.tsec) AS n_types_1h
        |FROM e ORDER BY event_id""".stripMargin,
    // B63: the 2σ flag replayed in the same division-free integer
    // form; only n (BIGINT) and the 4dp z cross the boundary — the
    // HUGEINT sums never reach the final SELECT uncast
    "q_zscore_anomaly" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |               FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, count(*) AS k, sum(n) AS s1, sum(n*n) AS s2
        |       FROM daily GROUP BY 1)
        |SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day, d.n,
        |  round(abs(CAST(d.n*k - s1 AS DOUBLE)/k) /
        |        sqrt(CAST(k*s2 - s1*s1 AS DOUBLE)/(k*(k-1))), 4) AS z
        |FROM daily d JOIN st USING (event_type)
        |WHERE (d.n*k - s1)*(d.n*k - s1)*(k-1) > 4*k*(k*s2 - s1*s1)
        |ORDER BY event_type, day""".stripMargin,
    // B61: previous day = lag over the DISTINCT day sequence (mirrors
    // the Spark lag over the aggregated frame, not calendar adjacency)
    "q_bitmap_retention" ->
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |seq AS (SELECT day, lag(day) OVER (ORDER BY day) AS pd
        |        FROM (SELECT DISTINCT day FROM du) t),
        |co AS (SELECT s.day, count(DISTINCT a.user_id) AS retained
        |       FROM seq s JOIN du a ON a.day = s.day
        |       JOIN du b ON b.day = s.pd AND b.user_id = a.user_id
        |       GROUP BY s.day),
        |act AS (SELECT day, count(*) AS n FROM du GROUP BY day)
        |SELECT strftime(s.day, '%Y-%m-%d') AS day,
        |  act.n AS active, pa.n AS prev_active,
        |  COALESCE(co.retained, 0) AS retained,
        |  act.n - COALESCE(co.retained, 0) AS new_users,
        |  pa.n - COALESCE(co.retained, 0) AS churned
        |FROM seq s JOIN act ON act.day = s.day JOIN act pa ON pa.day = s.pd
        |LEFT JOIN co ON co.day = s.day
        |WHERE s.pd IS NOT NULL ORDER BY day""".stripMargin,
    "q_time_bucket_agg" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
        |event_type, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY date_trunc('hour', ts), event_type
        |ORDER BY bucket, event_type""".stripMargin,
    "q_semi_anti_join" ->
      """SELECT c_mktsegment AS seg,
        |count(*) FILTER (WHERE has_order) AS n_active,
        |count(*) FILTER (WHERE NOT has_order) AS n_inactive
        |FROM (SELECT c_mktsegment,
        |  EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) AS has_order
        |  FROM customer c)
        |GROUP BY c_mktsegment ORDER BY seg""".stripMargin,
    "q_rollup" ->
      """SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
        |count(*) AS n_cust, round(sum(c_acctbal), 2) AS acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name) ORDER BY region, nation""".stripMargin,
    "q_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM flagged)
        |SELECT user_id, CAST(max(sess) AS BIGINT) AS n_sessions, count(*) AS n_events
        |FROM sess GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_conditional_pivot" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
        |FROM events GROUP BY strftime(ts, '%Y-%m-%d') ORDER BY day""".stripMargin,
    "q_json_extract" ->
      """SELECT event_type, round(avg(k), 4) AS avg_k, min(k) AS min_k,
        |max(k) AS max_k, count(k) AS n
        |FROM (SELECT event_type, CAST(props->>'k' AS INT) AS k FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_bitmap_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_set_ops" ->
      """SELECT
        |(SELECT count(*) FROM (
        |  SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
        |  INTERSECT SELECT o_custkey FROM orders)) AS n_active_rich,
        |(SELECT count(*) FROM (
        |  SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
        |  EXCEPT SELECT o_custkey FROM orders)) AS n_inactive_rich""".stripMargin,
    "q_scalar_funcs" ->
      """SELECT o_orderkey,
        |upper(o_orderstatus) AS status_u,
        |lower(o_orderpriority) AS prio_l,
        |length(o_orderpriority) AS prio_len,
        |substr(o_orderpriority, 1, 3) AS prio_3,
        |lpad(CAST(o_orderkey AS VARCHAR), 8, '0') AS key_pad,
        |concat_ws('-', o_orderstatus, o_orderpriority) AS tag,
        |abs(o_totalprice - 1000) AS abs_p,
        |round(sqrt(o_totalprice), 4) AS sqrt_p,
        |round(ln(o_totalprice), 4) AS ln_p,
        |CAST(floor(o_totalprice / 100) AS BIGINT) AS bucket,
        |CAST(year(o_orderdate) AS BIGINT) AS y,
        |CAST(month(o_orderdate) AS BIGINT) AS m,
        |CAST(day(o_orderdate) AS BIGINT) AS d,
        |COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_nn
        |FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""".stripMargin,
    "q_cube" ->
      """SELECT COALESCE(c_mktsegment, 'ALL') AS seg,
        |COALESCE(o_orderstatus, 'ALL') AS status,
        |count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY CUBE(c_mktsegment, o_orderstatus)
        |ORDER BY seg, status""".stripMargin,
    "q_percentiles" ->
      """SELECT l_returnflag,
        |quantile_cont(l_quantity, 0.25) AS q25,
        |quantile_cont(l_quantity, 0.5) AS q50,
        |quantile_cont(l_quantity, 0.75) AS q75,
        |count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_topk_per_group" ->
      """WITH rev AS (
        |  SELECT p_brand, p_partkey, sum(l_extendedprice) AS rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand, p_partkey),
        |ranked AS (
        |  SELECT p_brand, p_partkey, rev,
        |    row_number() OVER (PARTITION BY p_brand ORDER BY rev DESC, p_partkey) AS rk
        |  FROM rev)
        |SELECT p_brand, rk, p_partkey, round(rev, 2) AS rev
        |FROM ranked WHERE rk <= 3 ORDER BY p_brand, rk""".stripMargin,
    "q_string_agg" ->
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations, count(*) AS n
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q_regexp_extract" ->
      """SELECT CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT) AS k, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY k""".stripMargin,
    "q_window_trailing" ->
      """WITH e AS (SELECT event_id, user_id, value,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events)
        |SELECT event_id, user_id,
        |  count(*) OVER w AS n_1h,
        |  round(sum(value) OVER w, 4) AS sum_1h
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec
        |  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q_window_funnel" ->
      """WITH s AS (SELECT user_id, min(CASE WHEN event_type = 'signup' THEN ts END) AS s0
        |           FROM events GROUP BY user_id),
        |c AS (SELECT e.user_id, any_value(s.s0) AS s0,
        |             min(CASE WHEN e.event_type = 'click' AND e.ts > s.s0
        |                       AND e.ts <= s.s0 + INTERVAL 1 DAY THEN e.ts END) AS c1
        |      FROM events e JOIN s USING (user_id) GROUP BY e.user_id),
        |p AS (SELECT e.user_id, any_value(c.s0) AS s0, any_value(c.c1) AS c1,
        |             min(CASE WHEN e.event_type = 'purchase' AND e.ts > c.c1
        |                       AND e.ts <= c.s0 + INTERVAL 1 DAY THEN e.ts END) AS p2
        |      FROM events e JOIN c USING (user_id) GROUP BY e.user_id)
        |SELECT user_id,
        |       CAST(s0 IS NOT NULL AS BIGINT) + CAST(c1 IS NOT NULL AS BIGINT) +
        |       CAST(p2 IS NOT NULL AS BIGINT) AS funnel_depth
        |FROM p ORDER BY user_id""".stripMargin,
    // B30 shares B29's oracle: the one-pass array formulation and the
    // staged-join formulation compute the same value-based steps
    "q_funnel_native" ->
      """WITH s AS (SELECT user_id, min(CASE WHEN event_type = 'signup' THEN ts END) AS s0
        |           FROM events GROUP BY user_id),
        |c AS (SELECT e.user_id, any_value(s.s0) AS s0,
        |             min(CASE WHEN e.event_type = 'click' AND e.ts > s.s0
        |                       AND e.ts <= s.s0 + INTERVAL 1 DAY THEN e.ts END) AS c1
        |      FROM events e JOIN s USING (user_id) GROUP BY e.user_id),
        |p AS (SELECT e.user_id, any_value(c.s0) AS s0, any_value(c.c1) AS c1,
        |             min(CASE WHEN e.event_type = 'purchase' AND e.ts > c.c1
        |                       AND e.ts <= c.s0 + INTERVAL 1 DAY THEN e.ts END) AS p2
        |      FROM events e JOIN c USING (user_id) GROUP BY e.user_id)
        |SELECT user_id,
        |       CAST(s0 IS NOT NULL AS BIGINT) + CAST(c1 IS NOT NULL AS BIGINT) +
        |       CAST(p2 IS NOT NULL AS BIGINT) AS funnel_depth
        |FROM p ORDER BY user_id""".stripMargin,
    "q_window_funnel_dedup" ->
      """WITH s AS (SELECT user_id, min(CASE WHEN event_type = 'signup' THEN ts END) AS s0
        |           FROM events GROUP BY user_id),
        |c AS (SELECT e.user_id, any_value(s.s0) AS s0,
        |             min(CASE WHEN e.event_type = 'click' AND e.ts > s.s0
        |                       AND e.ts <= s.s0 + INTERVAL 1 DAY THEN e.ts END) AS c1r,
        |             min(CASE WHEN e.event_type = 'signup' AND e.ts > s.s0
        |                       AND e.ts <= s.s0 + INTERVAL 1 DAY THEN e.ts END) AS k1
        |      FROM events e JOIN s USING (user_id) GROUP BY e.user_id),
        |c2 AS (SELECT user_id, s0,
        |              CASE WHEN c1r IS NOT NULL AND (k1 IS NULL OR c1r < k1)
        |                   THEN c1r END AS c1
        |       FROM c),
        |p AS (SELECT e.user_id, any_value(c2.s0) AS s0, any_value(c2.c1) AS c1,
        |             min(CASE WHEN e.event_type = 'purchase' AND e.ts > c2.c1
        |                       AND e.ts <= c2.s0 + INTERVAL 1 DAY THEN e.ts END) AS p2r,
        |             min(CASE WHEN e.event_type IN ('signup', 'click') AND e.ts > c2.c1
        |                       AND e.ts <= c2.s0 + INTERVAL 1 DAY THEN e.ts END) AS k2
        |      FROM events e JOIN c2 USING (user_id) GROUP BY e.user_id)
        |SELECT user_id,
        |       CAST(s0 IS NOT NULL AS BIGINT) + CAST(c1 IS NOT NULL AS BIGINT) +
        |       CAST(p2r IS NOT NULL AND (k2 IS NULL OR p2r < k2) AS BIGINT) AS funnel_depth
        |FROM p ORDER BY user_id""".stripMargin,
    // B32: per-anchor trial funnels, max depth wins; users who never
    // fire the anchor step score 0. B71 (q_sql_funnel) is the same
    // semantics reached through the registered SQL scalar, so it
    // shares this replay verbatim (assigned after the map literal).
    "q_window_funnel_multi" ->
      """WITH anchors AS (SELECT user_id, ts AS a FROM events WHERE event_type = 'signup'),
        |c AS (SELECT an.user_id, an.a, min(e.ts) AS c1
        |      FROM anchors an LEFT JOIN events e
        |        ON e.user_id = an.user_id AND e.event_type = 'click'
        |       AND e.ts > an.a AND e.ts <= an.a + INTERVAL 1 DAY
        |      GROUP BY an.user_id, an.a),
        |p AS (SELECT c.user_id, c.a, c.c1, min(e.ts) AS p2
        |      FROM c LEFT JOIN events e
        |        ON e.user_id = c.user_id AND e.event_type = 'purchase'
        |       AND e.ts > c.c1 AND e.ts <= c.a + INTERVAL 1 DAY
        |      GROUP BY c.user_id, c.a, c.c1),
        |d AS (SELECT user_id,
        |             1 + CAST(c1 IS NOT NULL AS BIGINT) + CAST(p2 IS NOT NULL AS BIGINT) AS dep
        |      FROM p),
        |u AS (SELECT DISTINCT user_id FROM events)
        |SELECT u.user_id, CAST(coalesce(max(d.dep), 0) AS BIGINT) AS funnel_depth
        |FROM u LEFT JOIN d USING (user_id)
        |GROUP BY u.user_id ORDER BY user_id""".stripMargin,
    "q_retention" ->
      """WITH s AS (SELECT user_id, min(CASE WHEN event_type = 'signup' THEN ts END) AS s0
        |           FROM events GROUP BY user_id),
        |p AS (SELECT e.user_id, any_value(s.s0) AS s0,
        |             min(CASE WHEN e.event_type = 'purchase' AND e.ts > s.s0 THEN e.ts END) AS p1
        |      FROM events e JOIN s USING (user_id) GROUP BY e.user_id),
        |r AS (SELECT e.user_id,
        |             max(CASE WHEN e.event_type = 'error' AND e.ts > p.p1 THEN 1 ELSE 0 END) AS e3
        |      FROM events e JOIN p USING (user_id) GROUP BY e.user_id)
        |SELECT p.user_id,
        |       CAST(p.s0 IS NOT NULL AS BIGINT) AS r1,
        |       CAST(p.p1 IS NOT NULL AS BIGINT) AS r2,
        |       CAST(p.p1 IS NOT NULL AND r.e3 = 1 AS BIGINT) AS r3
        |FROM p JOIN r USING (user_id) ORDER BY user_id""".stripMargin,
    "q_asof_range" ->
      """WITH p AS (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS esec FROM events),
        |w AS (SELECT event_id AS err_event_id, user_id AS err_user,
        |             CAST(floor(epoch(ts)) AS BIGINT) AS wsec
        |      FROM events WHERE event_type = 'error')
        |SELECT p.event_id, p.user_id, w.err_event_id, p.esec - w.wsec AS offset_sec
        |FROM p JOIN w ON p.user_id = w.err_user
        | AND p.esec >= w.wsec AND p.esec < w.wsec + 3600
        |ORDER BY event_id, err_event_id""".stripMargin,
    "q_asof_native" ->
      """WITH u AS (
        |  SELECT o_custkey AS k, o_orderdate AS t, 0 AS kind, o_orderkey AS ordkey,
        |         o_totalprice AS price, CAST(NULL AS BIGINT) AS event_id FROM orders
        |  UNION ALL
        |  SELECT user_id, ts, 1, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), event_id FROM events),
        |j AS (
        |  SELECT *,
        |    last_value(ordkey IGNORE NULLS) OVER w AS o_orderkey,
        |    last_value(price IGNORE NULLS) OVER w AS o_totalprice
        |  FROM u WINDOW w AS (PARTITION BY k ORDER BY t, kind, COALESCE(ordkey, event_id)
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, k AS user_id, strftime(t, '%Y-%m-%d %H:%M:%S') AS ts,
        |       o_orderkey, o_totalprice
        |FROM j WHERE kind = 1 ORDER BY event_id""".stripMargin,
    "q_asof_join" ->
      """WITH u AS (
        |  SELECT o_custkey AS k, o_orderdate AS t, 0 AS kind, o_orderkey AS ordkey,
        |         o_totalprice AS price, CAST(NULL AS BIGINT) AS event_id FROM orders
        |  UNION ALL
        |  SELECT user_id, ts, 1, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), event_id FROM events),
        |j AS (
        |  SELECT *,
        |    last_value(ordkey IGNORE NULLS) OVER w AS o_orderkey,
        |    last_value(price IGNORE NULLS) OVER w AS o_totalprice
        |  FROM u WINDOW w AS (PARTITION BY k ORDER BY t, kind, COALESCE(ordkey, event_id)
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, k AS user_id, strftime(t, '%Y-%m-%d %H:%M:%S') AS ts,
        |       o_orderkey, o_totalprice
        |FROM j WHERE kind = 1 ORDER BY event_id""".stripMargin,
    "q_pivot_native" ->
      """SELECT o_orderstatus,
        |round(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN o_totalprice END), 2) AS "AUTOMOBILE",
        |round(sum(CASE WHEN c_mktsegment = 'BUILDING' THEN o_totalprice END), 2) AS "BUILDING",
        |round(sum(CASE WHEN c_mktsegment = 'FURNITURE' THEN o_totalprice END), 2) AS "FURNITURE",
        |round(sum(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN o_totalprice END), 2) AS "HOUSEHOLD",
        |round(sum(CASE WHEN c_mktsegment = 'MACHINERY' THEN o_totalprice END), 2) AS "MACHINERY"
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_unpivot" ->
      """WITH wide AS (
        |  SELECT l_returnflag,
        |         round(sum(l_quantity), 2) AS sum_qty,
        |         round(sum(l_extendedprice), 2) AS sum_price,
        |         round(sum(l_discount), 4) AS sum_disc
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, m.metric AS metric, m.value AS value FROM wide,
        |  unnest([{'metric': 'sum_qty', 'value': sum_qty},
        |          {'metric': 'sum_price', 'value': sum_price},
        |          {'metric': 'sum_disc', 'value': sum_disc}]) AS t(m)
        |ORDER BY l_returnflag, m.metric""".stripMargin,
    "q_ntile" ->
      """SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nation,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(floor(o_totalprice / 20000) AS BIGINT) AS bin,
        |  count(*) AS n, round(min(o_totalprice), 2) AS lo,
        |  round(max(o_totalprice), 2) AS hi
        |FROM orders GROUP BY 1 ORDER BY bin""".stripMargin,
    "q_lateral_explode" ->
      """SELECT doc_id, s.pos AS pos, s.word AS word FROM (
        |  SELECT doc_id, unnest([{'pos': CAST(i-1 AS BIGINT), 'word': w[i]}
        |    for i in range(1, least(len(w), 10)+1)]) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w
        |        FROM documents WHERE doc_id < 200))
        |ORDER BY doc_id, pos""".stripMargin,
    "q_percentile_disc" ->
      """WITH r AS (SELECT l_returnflag, l_quantity,
        |  row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
        |  count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  max(CASE WHEN rn = ceil(n * 0.25) THEN l_quantity END) AS p25_disc,
        |  max(CASE WHEN rn = ceil(n * 0.5) THEN l_quantity END) AS p50_disc,
        |  max(CASE WHEN rn = ceil(n * 0.75) THEN l_quantity END) AS p75_disc,
        |  count(*) AS n
        |FROM r GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_window_centered" ->
      """WITH e AS (SELECT event_id, user_id, value,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events)
        |SELECT event_id, user_id, n_window, sum_window FROM (
        |  SELECT event_id, user_id,
        |    count(*) OVER w AS n_window,
        |    round(sum(value) OVER w, 4) AS sum_window
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec
        |    RANGE BETWEEN 1800 PRECEDING AND 1800 FOLLOWING))
        |WHERE event_id % 100 = 0 ORDER BY event_id""".stripMargin,
    "q_gap_fill" ->
      """WITH e AS (SELECT event_id, user_id, ts,
        |  CASE WHEN event_type = 'purchase' THEN value END AS v FROM events)
        |SELECT event_id, user_id, filled FROM (
        |  SELECT event_id, user_id,
        |    round(last_value(v IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS filled
        |  FROM e)
        |WHERE event_id % 50 = 0 ORDER BY event_id""".stripMargin,
    "q_mode_median" ->
      """WITH e AS (SELECT event_type, value,
        |  CAST(floor(value) AS BIGINT) AS bucket FROM events),
        |cnt AS (SELECT event_type, bucket, count(*) AS c FROM e GROUP BY 1, 2),
        |md AS (SELECT event_type, bucket AS mode_bucket FROM (
        |  SELECT event_type, bucket,
        |    row_number() OVER (PARTITION BY event_type ORDER BY c DESC, bucket) AS rn
        |  FROM cnt) WHERE rn = 1),
        |m2 AS (SELECT event_type, round(median(value), 4) AS median_value,
        |  count(*) AS n FROM e GROUP BY 1)
        |SELECT event_type, mode_bucket, median_value, n
        |FROM md JOIN m2 USING (event_type) ORDER BY event_type""".stripMargin,
    // exact 1e-4-unit basis mirroring the Spark side: unit averages
    // and the interpolation both round half-up via floor((2m+d)/(2d))
    // over exact integers, so the sf1 boundary flap cannot recur
    "q_interpolate" ->
      """WITH e AS (SELECT event_type,
        |  CAST(floor(epoch(ts)/3600) AS BIGINT) AS bucket,
        |  CAST(floor(value * 10000 + 0.5) AS BIGINT) AS vu FROM events),
        |obs AS (SELECT event_type, bucket,
        |  CAST(floor(CAST(2 * sum(vu) + count(*) AS DOUBLE) /
        |             CAST(2 * count(*) AS DOUBLE)) AS BIGINT) AS vu_obs,
        |  count(*) AS n_obs FROM e GROUP BY 1, 2),
        |bounds AS (SELECT event_type, min(bucket) AS mn, max(bucket) AS mx
        |  FROM obs GROUP BY 1),
        |spine AS (SELECT event_type, unnest(generate_series(mn, mx)) AS bucket
        |  FROM bounds),
        |j AS (SELECT s.event_type, s.bucket, o.vu_obs, o.n_obs
        |  FROM spine s LEFT JOIN obs o USING (event_type, bucket)),
        |w AS (SELECT *,
        |  last_value(vu_obs IGNORE NULLS) OVER wp AS pv,
        |  last_value(CASE WHEN vu_obs IS NOT NULL THEN bucket END IGNORE NULLS)
        |    OVER wp AS pt,
        |  first_value(vu_obs IGNORE NULLS) OVER wn AS nv,
        |  first_value(CASE WHEN vu_obs IS NOT NULL THEN bucket END IGNORE NULLS)
        |    OVER wn AS nt
        |  FROM j WINDOW
        |  wp AS (PARTITION BY event_type ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wn AS (PARTITION BY event_type ORDER BY bucket
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type, bucket, COALESCE(n_obs, 0) AS n_obs,
        |  vu_obs IS NULL AS gap,
        |  CAST(CASE WHEN vu_obs IS NOT NULL THEN vu_obs
        |       WHEN pt IS NULL THEN nv
        |       WHEN nt IS NULL THEN pv
        |       ELSE pv + CAST(floor(
        |         CAST(2 * (nv - pv) * (bucket - pt) + (nt - pt) AS DOUBLE) /
        |         CAST(2 * (nt - pt) AS DOUBLE)) AS BIGINT) END
        |    AS DOUBLE) / 10000 AS filled
        |FROM w ORDER BY event_type, bucket""".stripMargin,
    "q_bitmap_rollup" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, user_id
        |  FROM events)
        |SELECT event_type,
        |  count(DISTINCT user_id) AS n_users,
        |  count(*) AS n_events,
        |  count(DISTINCT day) AS n_days
        |FROM d GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_sliding_distinct" ->
      """WITH e AS (SELECT time_bucket(INTERVAL '30 minutes', ts) AS bucket, user_id
        |  FROM events),
        |x AS (SELECT bucket - to_minutes(30 * o) AS ws, user_id
        |  FROM e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS o) t)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  count(DISTINCT user_id) AS n_users,
        |  count(*) AS n_events
        |FROM x GROUP BY ws ORDER BY window_start""".stripMargin,
    "q_mad" ->
      """WITH m AS (SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l.l_returnflag,
        |  round(quantile_cont(abs(l.l_quantity - m.med), 0.5), 4) AS mad,
        |  round(max(m.med), 4) AS median,
        |  count(*) AS n
        |FROM lineitem l JOIN m USING (l_returnflag)
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin,
    "q_regr" ->
      """WITH m AS (SELECT l_returnflag, l_linestatus,
        |  CAST(count(*) AS HUGEINT) AS n,
        |  sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx,
        |  sum(x*y) AS sxy, sum(y*y) AS syy
        |  FROM (SELECT l_returnflag, l_linestatus,
        |    CAST(floor(l_quantity + 0.5) AS HUGEINT) AS x,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS HUGEINT) AS y
        |    FROM lineitem) GROUP BY 1, 2),
        |d AS (SELECT l_returnflag, l_linestatus, CAST(n AS BIGINT) AS n,
        |  n*sxy - sx*sy AS num, sy*sxx - sx*sxy AS inum,
        |  n*sxx - sx*sx AS denx, n*syy - sy*sy AS deny FROM m)
        |SELECT l_returnflag, l_linestatus, n,
        |  CASE WHEN denx = 0 THEN NULL
        |    ELSE round(CAST(num AS DOUBLE) / CAST(denx AS DOUBLE), 4) END
        |    AS slope_cents,
        |  CASE WHEN denx = 0 THEN NULL
        |    ELSE round(CAST(inum AS DOUBLE) / CAST(denx AS DOUBLE), 4) END
        |    AS intercept_cents,
        |  CASE WHEN denx = 0 OR deny = 0 THEN NULL
        |    ELSE round((CAST(num AS DOUBLE) / CAST(denx AS DOUBLE)) *
        |      (CAST(num AS DOUBLE) / CAST(deny AS DOUBLE)), 6) END AS r2
        |FROM d ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_correlated_subquery" ->
      """SELECT c_custkey, c_mktsegment,
        |  (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders,
        |  (SELECT COALESCE(round(SUM(o_totalprice), 2), 0.0)
        |   FROM orders o WHERE o.o_custkey = c.c_custkey) AS total_spent
        |FROM customer c WHERE c_custkey < 300 ORDER BY c_custkey""".stripMargin,
    "q_map_explode" ->
      """SELECT k AS pkey, count(*) AS n, count(DISTINCT props ->> k) AS n_vals
        |FROM (SELECT props, unnest(json_keys(props)) AS k
        |      FROM events WHERE props IS NOT NULL)
        |GROUP BY 1 ORDER BY pkey""".stripMargin,
    "q_null_safe_join" ->
      """WITH c AS (SELECT nullif(c_mktsegment, 'BUILDING') AS seg,
        |             count(DISTINCT c_custkey) AS n_cust
        |           FROM customer GROUP BY 1),
        |o AS (SELECT nullif(c_mktsegment, 'BUILDING') AS oseg,
        |        count(DISTINCT o_orderkey) AS n_ord
        |      FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1)
        |SELECT coalesce(c.seg, 'NULL_SEG') AS seg, n_cust, n_ord
        |FROM c JOIN o ON c.seg IS NOT DISTINCT FROM o.oseg
        |ORDER BY seg""".stripMargin,
    "q_bitmap_intersect" ->
      """SELECT
        |  (SELECT count(DISTINCT user_id) FROM events WHERE event_type = 'signup') AS n_signup,
        |  (SELECT count(DISTINCT user_id) FROM events WHERE event_type = 'purchase') AS n_purchase,
        |  (SELECT count(*) FROM (
        |     SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
        |     INTERSECT
        |     SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')) AS n_both""".stripMargin,
    "q_datetime_funcs" ->
      """SELECT o_orderkey,
        |  strftime(date_trunc('week', o_orderdate), '%Y-%m-%d %H:%M:%S') AS wk_start,
        |  strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d %H:%M:%S') AS q_start,
        |  CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
        |  CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
        |  strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d %H:%M:%S') AS due_90d,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2026-01-01') AS BIGINT) AS age_days
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin,
    "q_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS prio,
        |  CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        |ORDER BY gid, status, prio""".stripMargin,
    "q_stats_agg" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
        |  round(stddev_samp(l_quantity), 4) AS sd_qty,
        |  round(var_samp(l_quantity), 4) AS var_qty,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qp,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_first_last" ->
      """SELECT * FROM (
        |  SELECT event_id, user_id,
        |    first_value(event_type) OVER w AS first_type,
        |    last_value(event_type) OVER w AS last_type,
        |    nth_value(event_type, 2) OVER w AS second_type
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |WHERE event_id % 100 = 0 ORDER BY event_id""".stripMargin)
}
