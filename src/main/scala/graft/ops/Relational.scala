package graft.ops

import graft.core.{Num, QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational capability set over the star schema: hash aggregation, rollup,
  * broadcast/semi/anti/outer joins, window functions, deterministic dedup,
  * pivot/unpivot (`stack`), set ops, pushdown-friendly scans, top-k.
  *
  * The reference exercises only a subset of these (SURVEY.md §2: unpivot R1,
  * window W1-W3, dedup O1, counts A1-A3); the rest are the capability-parity
  * demos its category implies (§2.4/§2.5/§2.8). Everything is stock Catalyst —
  * declared with the DataFrame API so pushdown, pruning, partial aggregation,
  * broadcast planning and AQE all apply.
  *
  * Determinism contract for the DuckDB oracle: see [[graft.core.Num]] —
  * money aggregates are quantized to integer cents, divisions happen on
  * identical doubles in identical order, every output column is cast to an
  * explicit type on both sides.
  */
object Relational {

  private val C = "CAST(round(l_extendedprice * 100) AS BIGINT)"
  private val DISC = "CAST(round((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)"

  /** TPC-H Q1-flavor pricing summary: map-side partial aggregation + single
    * shuffle on the (tiny-cardinality) group keys. At 100 TB this is the
    * canonical scan-bound query; no other plan shape beats it.
    */
  val aggPricingSummary: QueryDef = QueryDef(
    "agg_pricing_summary",
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       |  CAST(SUM($C) AS DOUBLE) / 100.0 AS sum_base_price,
       |  CAST(SUM($DISC) AS DOUBLE) / 100.0 AS sum_disc_price,
       |  CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty,
       |  CAST(count(*) AS BIGINT) AS count_order
       |FROM lineitem
       |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
    val l = Tables.lineitem(spark, dir)
    val qty = round(col("l_quantity")).cast("long")
    val discPrice = Num.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
    l.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(qty).as("sum_qty"),
        Num.centsToDouble(sum(Num.cents(col("l_extendedprice")))).as("sum_base_price"),
        Num.centsToDouble(sum(discPrice)).as("sum_disc_price"),
        Num.ratio(sum(qty), count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
  }

  /** Exact distinct counts (A3's exact-distinct contract, scaled to groups).
    * Expands to Catalyst's two-phase distinct aggregation automatically.
    */
  val aggDistinctCounts: QueryDef = QueryDef(
    "agg_distinct_counts",
    """SELECT l_returnflag,
      |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
      |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_part,
      |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
      |FROM lineitem
      |GROUP BY l_returnflag""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        countDistinct(col("l_orderkey")).as("n_orders"))
  }

  /** ROLLUP grouping sets (partial aggregation + Expand; one shuffle). */
  val aggRollup: QueryDef = QueryDef(
    "agg_rollup",
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |       coalesce(l_linestatus, 'ALL') AS linestatus,
      |       CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(round(col("l_quantity")).cast("long")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n_rows"),
        col("sum_qty"))
  }

  /** Fact ⋈ three dims -> per-region revenue. nation (25) and region (5) are
    * constant-size at every SF, so those two hints are pinned; supplier GROWS
    * with SF, so its join carries no hint — the size-based planner (and AQE at
    * runtime) picks broadcast while supplier is small and falls back to a
    * shuffled join when it isn't, instead of OOMing on a pinned hint at 100 TB.
    */
  val joinRegionRevenue: QueryDef = QueryDef(
    "join_region_revenue",
    s"""SELECT r.r_name,
       |  CAST(SUM($DISC) AS DOUBLE) / 100.0 AS revenue,
       |  CAST(count(*) AS BIGINT) AS n_items
       |FROM lineitem l
       |JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |JOIN nation n ON s.s_nationkey = n.n_nationkey
       |JOIN region r ON n.n_regionkey = r.r_regionkey
       |GROUP BY r.r_name""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        Num.centsToDouble(sum(Num.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Left-semi join (EXISTS): orders from one market segment's customers. */
  val joinSemiOrders: QueryDef = QueryDef(
    "join_semi_orders",
    """SELECT o_orderpriority,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_price
      |FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      |GROUP BY o_orderpriority""".stripMargin) { (spark, dir) =>
    val bldg = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    Tables.orders(spark, dir)
      .join(bldg, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        Num.centsToDouble(sum(Num.cents(col("o_totalprice")))).as("total_price"))
  }

  /** Left-anti join (NOT EXISTS): customers that never ordered. */
  val joinAntiCustomers: QueryDef = QueryDef(
    "join_anti_customers",
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |GROUP BY c_mktsegment""".stripMargin) { (spark, dir) =>
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
  }

  /** Left-outer join with null-preserving aggregates (0 orders kept). */
  val joinOuterCustomerOrders: QueryDef = QueryDef(
    "join_outer_customer_orders",
    """SELECT c.c_custkey, c.c_mktsegment,
      |  CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
      |  CAST(coalesce(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0) AS DOUBLE) / 100.0 AS total_spent
      |FROM customer c
      |LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      |GROUP BY c.c_custkey, c.c_mktsegment""".stripMargin) { (spark, dir) =>
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        Num.centsToDouble(coalesce(sum(Num.cents(col("o_totalprice"))), lit(0L))).as("total_spent"))
  }

  /** Top-k per group via rank over an exact-integer order with a key
    * tiebreak — fully deterministic, and the standard scale-out top-k (no
    * global sort; one window per nation partition).
    */
  val topkSuppliersPerNation: QueryDef = QueryDef(
    "topk_suppliers_per_nation",
    s"""SELECT n_name, s_suppkey, s_name,
       |       CAST(revenue_cents AS DOUBLE) / 100.0 AS revenue,
       |       CAST(rnk AS INTEGER) AS rnk
       |FROM (
       |  SELECT n_name, s_suppkey, s_name, revenue_cents,
       |         rank() OVER (PARTITION BY n_name ORDER BY revenue_cents DESC, s_suppkey) AS rnk
       |  FROM (
       |    SELECT n.n_name, s.s_suppkey, s.s_name,
       |           CAST(SUM($DISC) AS BIGINT) AS revenue_cents
       |    FROM lineitem l
       |    JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |    JOIN nation n ON s.s_nationkey = n.n_nationkey
       |    GROUP BY 1, 2, 3))
       |WHERE rnk <= 3""".stripMargin) { (spark, dir) =>
    val rev = Tables.lineitem(spark, dir)
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("s_suppkey"), col("s_name"))
      .agg(sum(Num.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_cents"))
    val w = Window.partitionBy(col("n_name")).orderBy(col("revenue_cents").desc, col("s_suppkey"))
    rev.withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= 3)
      .select(
        col("n_name"), col("s_suppkey"), col("s_name"),
        Num.centsToDouble(col("revenue_cents")).as("revenue"),
        col("rnk").cast("int").as("rnk"))
  }

  /** Exact interpolated percentiles over integer cents. Spark `percentile`
    * and DuckDB `quantile_cont` share the (n-1)*p linear-interpolation
    * definition, and on exact integer input the interpolation arithmetic is
    * bit-identical (verified empirically: identical IEEE bit patterns across
    * engines). approx_percentile (t-digest) is the constant-memory sketch
    * path — different sketch families per engine, so its query below states
    * an oracle on sketch-independent invariants rather than exact quantiles.
    */
  val aggPercentiles: QueryDef = QueryDef(
    "agg_percentiles",
    s"""SELECT l_returnflag,
       |  quantile_cont($C, 0.25) AS p25,
       |  quantile_cont($C, 0.50) AS p50,
       |  quantile_cont($C, 0.75) AS p75,
       |  quantile_cont($C, 0.95) AS p95
       |FROM lineitem
       |GROUP BY l_returnflag""".stripMargin) { (spark, dir) =>
    val cents = "CAST(round(l_extendedprice * 100) AS BIGINT)"
    // one percentile aggregate with an array of ps = one value buffer per
    // group (four scalar aggregates would buffer the column four times)
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(expr(s"percentile($cents, array(0.25D, 0.50D, 0.75D, 0.95D))").as("ps"))
      .select(
        col("l_returnflag"),
        col("ps").getItem(0).as("p25"),
        col("ps").getItem(1).as("p50"),
        col("ps").getItem(2).as("p75"),
        col("ps").getItem(3).as("p95"))
  }

  /** Exact variance via integer moments: quantize to whole dollars, carry
    * (n, sum, sum-of-squares) as exact decimal sums, assemble the sample
    * variance in a fixed-order double expression. Unlike streaming variance
    * (Welford), the aggregation itself is associative integer math —
    * deterministic under any partitioning, hence oracle-checkable.
    */
  val aggVarianceExact: QueryDef = QueryDef(
    "agg_variance_exact",
    """SELECT l_returnflag,
      |  (CAST(SUM(CAST(d * d AS DECIMAL(38, 0))) AS DOUBLE)
      |    - (CAST(SUM(CAST(d AS DECIMAL(38, 0))) AS DOUBLE)
      |       * CAST(SUM(CAST(d AS DECIMAL(38, 0))) AS DOUBLE)) / CAST(count(*) AS DOUBLE))
      |    / (CAST(count(*) AS DOUBLE) - 1.0) AS var_samp_dollars,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM (SELECT l_returnflag, CAST(round(l_extendedprice) AS BIGINT) AS d FROM lineitem)
      |GROUP BY l_returnflag""".stripMargin) { (spark, dir) =>
    val d = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), round(col("l_extendedprice")).cast("long").as("d"))
    // BigSum keeps the per-row work on the long fast path (d is whole
    // dollars, domain-bounded ≤ ~1.1e5, so d² ≤ ~1.2e10 per row at any
    // table size); the rollover buffer preserves the exact decimal value
    d.groupBy(col("l_returnflag"))
      .agg(
        graft.functions.BigSum.of(col("d") * col("d")).as("ssq"),
        graft.functions.BigSum.of(col("d")).as("s"),
        count(lit(1)).as("n"))
      .select(
        col("l_returnflag"),
        ((col("ssq").cast("double") -
          (col("s").cast("double") * col("s").cast("double")) / col("n").cast("double"))
          / (col("n").cast("double") - lit(1.0))).as("var_samp_dollars"),
        col("n").cast("long").as("n"))
  }

  /** Approximate percentile (constant memory at any scale) next to the exact
    * value. The sketch itself isn't cross-engine reproducible, so the oracle
    * checks its contract instead: exact p50 (DuckDB `quantile_cont`) plus a
    * boolean asserting the estimate lands within 2% of it — fixed sketch over
    * fixed data, so the flag is deterministic. ScalaTest bounds the error
    * in-process as well.
    */
  val aggApproxPercentile: QueryDef = QueryDef(
    "agg_approx_percentile",
    s"""SELECT l_returnflag,
       |  quantile_cont($C, 0.50) AS exact_p50,
       |  TRUE AS approx_within_2pct
       |FROM lineitem
       |GROUP BY l_returnflag""".stripMargin) { (spark, dir) =>
    val cents = "CAST(round(l_extendedprice * 100) AS BIGINT)"
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr(s"approx_percentile($cents, 0.5, 1000)").as("approx_p50"),
        expr(s"percentile($cents, 0.5)").as("exact_p50"))
      .select(
        col("l_returnflag"),
        col("exact_p50"),
        (abs(col("approx_p50").cast("double") - col("exact_p50")) <=
          lit(0.02) * col("exact_p50")).as("approx_within_2pct"))
  }

  /** Range (band) join: fact rows land in value intervals from a tiny
    * broadcast dimension — planned as a broadcast nested-loop with the range
    * predicate, so the fact side never shuffles.
    */
  val rangeJoinBands: QueryDef = QueryDef(
    "range_join_bands",
    """WITH bands(lo, hi, band) AS (
      |  VALUES (0, 10000000, 'low'),
      |         (10000000, 30000000, 'mid'),
      |         (30000000, 9223372036854775807, 'high')),
      |o AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
      |SELECT band,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(cents) AS DOUBLE) / 100.0 AS total_price
      |FROM o JOIN bands ON o.cents >= lo AND o.cents < hi
      |GROUP BY band""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val bands = Seq(
      (0L, 10000000L, "low"),
      (10000000L, 30000000L, "mid"),
      (30000000L, Long.MaxValue, "high")).toDF("lo", "hi", "band")
    Tables.orders(spark, dir)
      .select(Num.cents(col("o_totalprice")).as("cents"))
      .join(broadcast(bands), col("cents") >= col("lo") && col("cents") < col("hi"))
      .groupBy(col("band"))
      .agg(
        count(lit(1)).as("n_orders"),
        Num.centsToDouble(sum(col("cents"))).as("total_price"))
  }

  /** Oracle-deterministic dedup (SURVEY.md §7 hard-parts, option (b)):
    * `row_number over (partition by keys order by <total order>) = 1`. The
    * faithful arbitrary-survivor `dropDuplicates` lives in
    * [[graft.rentals.Transforms.deduplicate]]; this is the reproducible form.
    */
  val dedupDeterministic: QueryDef = QueryDef(
    "dedup_deterministic_events",
    """SELECT user_id, event_type, event_id, ts
      |FROM (
      |  SELECT user_id, event_type, event_id, ts,
      |         row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
      |  FROM events)
      |WHERE rn = 1""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("user_id"), col("event_type")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"))
  }

  /** W1 analog on the star schema: lag-based MoM revenue change per nation.
    * No rounding in the ratio — every double derives from exact integer cents,
    * so the result is bit-stable (see Num).
    */
  val windowMomNation: QueryDef = QueryDef(
    "window_mom_nation",
    s"""WITH monthly AS (
       |  SELECT n.n_name, strftime(l.l_shipdate, '%Y-%m') AS month,
       |         CAST(SUM($DISC) AS BIGINT) AS rev_cents
       |  FROM lineitem l
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  JOIN nation n ON s.s_nationkey = n.n_nationkey
       |  GROUP BY 1, 2)
       |SELECT n_name, month,
       |       CAST(rev_cents AS DOUBLE) / 100.0 AS revenue,
       |       ((CAST(rev_cents AS DOUBLE) / 100.0 - CAST(prev_cents AS DOUBLE) / 100.0)
       |         / (CAST(prev_cents AS DOUBLE) / 100.0)) * 100 AS mom_pct
       |FROM (
       |  SELECT n_name, month, rev_cents,
       |         lag(rev_cents) OVER (PARTITION BY n_name ORDER BY month) AS prev_cents
       |  FROM monthly)""".stripMargin) { (spark, dir) =>
    val monthly = Tables.lineitem(spark, dir)
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), date_format(col("l_shipdate"), "yyyy-MM").as("month"))
      .agg(sum(Num.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("rev_cents"))
    val w = Window.partitionBy(col("n_name")).orderBy(col("month"))
    val revD = Num.centsToDouble(col("rev_cents"))
    val prevD = Num.centsToDouble(lag(col("rev_cents"), 1).over(w))
    monthly.select(
      col("n_name"), col("month"),
      revD.as("revenue"),
      (((revD - prevD) / prevD) * 100).as("mom_pct"))
  }

  /** Pivot (wide) then `stack` unpivot (long) — the reference's signature R1
    * generator, null rows preserved (`jobs/transform.py:73-79`).
    */
  val unpivotFlagRevenue: QueryDef = QueryDef(
    "unpivot_flag_revenue",
    s"""WITH wide AS (
       |  SELECT l_suppkey,
       |    SUM(CASE WHEN l_returnflag = 'A' THEN $C END) AS rev_a,
       |    SUM(CASE WHEN l_returnflag = 'N' THEN $C END) AS rev_n,
       |    SUM(CASE WHEN l_returnflag = 'R' THEN $C END) AS rev_r
       |  FROM lineitem GROUP BY l_suppkey)
       |SELECT l_suppkey, 'A' AS returnflag, CAST(rev_a AS BIGINT) AS revenue_cents FROM wide
       |UNION ALL
       |SELECT l_suppkey, 'N' AS returnflag, CAST(rev_n AS BIGINT) AS revenue_cents FROM wide
       |UNION ALL
       |SELECT l_suppkey, 'R' AS returnflag, CAST(rev_r AS BIGINT) AS revenue_cents FROM wide""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sum(Num.cents(col("l_extendedprice"))))
      .selectExpr(
        "l_suppkey",
        "stack(3, 'A', `A`, 'N', `N`, 'R', `R`) as (returnflag, revenue_cents)")
  }

  /** Pushdown-friendly scan: the timestamp range + discount predicates and the
    * 3-column projection must reach the parquet reader (PushedFilters /
    * ReadSchema) — verified in the plan spec.
    */
  val scanFilterProject: QueryDef = QueryDef(
    "scan_filter_project",
    """SELECT l_orderkey, l_linenumber,
      |       CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount >= 0.05""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .filter(
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        Num.cents(col("l_extendedprice")).as("price_cents"))
  }

  /** Set ops: EXCEPT / INTERSECT / UNION all use set (distinct) semantics in
    * both engines.
    */
  val setExceptOrders: QueryDef = QueryDef(
    "set_except_orders",
    """SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
      |EXCEPT
      |SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'""".stripMargin) { (spark, dir) =>
    val l = Tables.lineitem(spark, dir)
    l.filter(col("l_returnflag") === "A").select(col("l_orderkey"))
      .except(l.filter(col("l_returnflag") === "R").select(col("l_orderkey")))
  }

  val setIntersectOrders: QueryDef = QueryDef(
    "set_intersect_orders",
    """SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
      |INTERSECT
      |SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'""".stripMargin) { (spark, dir) =>
    val l = Tables.lineitem(spark, dir)
    l.filter(col("l_returnflag") === "A").select(col("l_orderkey"))
      .intersect(l.filter(col("l_returnflag") === "R").select(col("l_orderkey")))
  }

  /** Full-outer join: supplier/customer account balance per nation — both
    * null sides retained.
    */
  val joinFullOuterBalances: QueryDef = QueryDef(
    "join_full_outer_balances",
    """WITH s AS (SELECT s_nationkey AS nk,
      |             CAST(SUM(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT) AS supp_cents
      |           FROM supplier GROUP BY 1),
      |c AS (SELECT c_nationkey AS nk,
      |        CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS cust_cents
      |      FROM customer GROUP BY 1)
      |SELECT coalesce(s.nk, c.nk) AS nationkey,
      |       CAST(coalesce(s.supp_cents, 0) AS BIGINT) AS supp_cents,
      |       CAST(coalesce(c.cust_cents, 0) AS BIGINT) AS cust_cents
      |FROM s FULL OUTER JOIN c ON s.nk = c.nk""".stripMargin) { (spark, dir) =>
    val s = Tables.supplier(spark, dir)
      .groupBy(col("s_nationkey").as("snk"))
      .agg(sum(Num.cents(col("s_acctbal"))).as("supp_cents"))
    val c = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey").as("cnk"))
      .agg(sum(Num.cents(col("c_acctbal"))).as("cust_cents"))
    s.join(c, col("snk") === col("cnk"), "full_outer")
      .select(
        coalesce(col("snk"), col("cnk")).as("nationkey"),
        coalesce(col("supp_cents"), lit(0L)).as("supp_cents"),
        coalesce(col("cust_cents"), lit(0L)).as("cust_cents"))
  }

  /** Multiset (ALL) set-op semantics: duplicates preserved per multiplicity
    * arithmetic, unlike the distinct-set EXCEPT above.
    */
  val setExceptAll: QueryDef = QueryDef(
    "set_except_all_suppkeys",
    """SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
      |EXCEPT ALL
      |SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'""".stripMargin) { (spark, dir) =>
    val l = Tables.lineitem(spark, dir)
    l.filter(col("l_returnflag") === "A").select(col("l_suppkey"))
      .exceptAll(l.filter(col("l_returnflag") === "R").select(col("l_suppkey")))
  }

  val setUnionNations: QueryDef = QueryDef(
    "set_union_nations",
    """SELECT c_nationkey AS nationkey FROM customer
      |UNION
      |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin) { (spark, dir) =>
    Tables.customer(spark, dir).select(col("c_nationkey").as("nationkey"))
      .union(Tables.supplier(spark, dir).select(col("s_nationkey").as("nationkey")))
      .distinct()
  }

  /** TPC-H Q3-flavor composite: selective dim filter -> two fact joins ->
    * hash agg -> deterministic global top-n. The canonical
    * filter-join-agg-sort pipeline in one plan.
    */
  val tpchQ3Style: QueryDef = QueryDef(
    "tpch_q3_style",
    s"""SELECT o.o_orderkey,
       |  CAST(SUM($DISC) AS DOUBLE) / 100.0 AS revenue,
       |  o.o_orderdate, o.o_orderpriority
       |FROM customer c
       |JOIN orders o ON c.c_custkey = o.o_custkey
       |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       |WHERE c.c_mktsegment = 'BUILDING'
       |  AND o.o_orderdate < TIMESTAMP '1998-01-01'
       |  AND l.l_shipdate > TIMESTAMP '1998-01-01'
       |GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
       |ORDER BY revenue DESC, o.o_orderkey
       |LIMIT 10""".stripMargin) { (spark, dir) =>
    val cutoff = lit("1998-01-01").cast("timestamp")
    Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(spark, dir).filter(col("o_orderdate") < cutoff),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, dir).filter(col("l_shipdate") > cutoff),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(Num.centsToDouble(
        sum(Num.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))).as("revenue"))
      .select(col("o_orderkey"), col("revenue"), col("o_orderdate"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-flavor composite: six-table join (two big facts + four dims)
    * with the local-supplier predicate (customer and supplier share a
    * nation) and a region filter — the widest join fan in the suite. The two
    * fact joins shuffle on the fact keys. Broadcast hints are pinned ONLY on
    * the constant-size dims (nation=25, region=5); customer and supplier
    * grow linearly with SF (~15 B customers at 100 TB), so their joins are
    * left to the size-based planner/AQE — broadcast at bench scale, shuffled
    * at cluster scale, never a pinned OOM.
    */
  val tpchQ5Style: QueryDef = QueryDef(
    "tpch_q5_style",
    s"""SELECT n.n_name,
       |  CAST(SUM($DISC) AS DOUBLE) / 100.0 AS revenue,
       |  CAST(count(*) AS BIGINT) AS n_rows
       |FROM lineitem l
       |JOIN orders o ON l.l_orderkey = o.o_orderkey
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |JOIN nation n ON s.s_nationkey = n.n_nationkey
       |JOIN region r ON n.n_regionkey = r.r_regionkey
       |WHERE c.c_nationkey = s.s_nationkey
       |  AND r.r_name = 'ASIA'
       |GROUP BY n.n_name""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("c_nationkey") === col("s_nationkey") && col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(
        Num.centsToDouble(
          sum(Num.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))).as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  /** TPC-H Q8-style national market share: of all revenue sold into the
    * AMERICA customer market, the fraction supplied by NATION_1, per order
    * year — the conditional-aggregate ratio over a six-table join
    * (cf. TPC-H Q8's two-nation-role shape: nation joins BOTH through
    * customer→region for the market filter AND through supplier for the
    * share predicate). Numerator and denominator are exact integer-cents
    * sums accumulated in ONE pass (a conditional aggregate, not two
    * queries); the share is a single integer-ratio division. Plan shape:
    * lineitem ⋈ orders shuffles on the fact keys; the constant-size nation
    * roles and region are pinned broadcasts, while customer and supplier
    * (linear in SF) are left to the size-based planner/AQE — Q5's scale
    * story with a second nation role added. The year group-by is the one
    * aggregation exchange.
    */
  val tpchQ8Style: QueryDef = QueryDef(
    "tpch_q8_style",
    s"""SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
       |  CAST(SUM(CASE WHEN sn.n_name = 'NATION_1' THEN $DISC ELSE 0 END) AS DOUBLE)
       |    / CAST(SUM($DISC) AS DOUBLE) AS mkt_share,
       |  CAST(SUM($DISC) AS DOUBLE) / 100.0 AS total_revenue,
       |  CAST(count(*) AS BIGINT) AS n_rows
       |FROM lineitem l
       |JOIN orders o ON l.l_orderkey = o.o_orderkey
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
       |JOIN region r ON cn.n_regionkey = r.r_regionkey
       |JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
       |WHERE r.r_name = 'AMERICA'
       |GROUP BY 1""".stripMargin) { (spark, dir) =>
    val disc = Num.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
    val custNation = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("cn_key"), col("n_regionkey").as("cn_region"))
    val suppNation = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("sn_name"))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(custNation), col("c_nationkey") === col("cn_key"))
      .join(broadcast(Tables.region(spark, dir)), col("cn_region") === col("r_regionkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
      .filter(col("r_name") === "AMERICA")
      .groupBy(year(col("o_orderdate")).cast("int").as("o_year"))
      .agg(
        Num.ratio(
          sum(when(col("sn_name") === "NATION_1", disc).otherwise(lit(0L))),
          sum(disc)).as("mkt_share"),
        Num.centsToDouble(sum(disc)).as("total_revenue"),
        count(lit(1)).as("n_rows"))
  }

  /** Snapshot reconciliation (table diff): classify every key across two
    * dataset versions as added / removed / changed / unchanged, with the
    * exact net value delta per class — the audit every incremental pipeline
    * runs before publishing ("what did today's load actually do?"). The two
    * snapshots are derived deterministically from orders (yesterday drops
    * keys ≡ 0 mod 7; today drops ≡ 0 mod 5 and bumps values on ≡ 0 mod 3),
    * so the oracle replays the derivation and the classification must match
    * bit-for-bit. One full-outer sort-merge join on the key — the diff
    * never materializes more than the two snapshots, and the class rollup
    * is a 4-key aggregate. At 100 TB both sides shuffle once on the key;
    * with bucketed snapshots even that exchange disappears.
    */
  val snapshotDiff: QueryDef = QueryDef(
    "snapshot_diff",
    """WITH a AS (
      |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders WHERE o_orderkey % 7 <> 0),
      |b AS (
      |  SELECT o_orderkey AS k,
      |    CAST(round(o_totalprice * 100) AS BIGINT)
      |      + CASE WHEN o_orderkey % 3 = 0 THEN 100 ELSE 0 END AS v
      |  FROM orders WHERE o_orderkey % 5 <> 0)
      |SELECT
      |  CASE WHEN a.k IS NULL THEN 'added'
      |       WHEN b.k IS NULL THEN 'removed'
      |       WHEN a.v <> b.v THEN 'changed'
      |       ELSE 'unchanged' END AS class,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(SUM(COALESCE(b.v, 0) - COALESCE(a.v, 0)) AS BIGINT) AS net_delta_cents
      |FROM a FULL OUTER JOIN b ON b.k = a.k
      |GROUP BY 1""".stripMargin) { (spark, dir) =>
    val cents = Num.cents(col("o_totalprice"))
    val a = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey").as("ak"), cents.as("av"))
    val b = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 5 =!= 0)
      .select(
        col("o_orderkey").as("bk"),
        (cents + when(col("o_orderkey") % 3 === 0, lit(100L)).otherwise(lit(0L))).as("bv"))
    a.join(b, col("ak") === col("bk"), "full_outer")
      .select(
        when(col("ak").isNull, "added")
          .when(col("bk").isNull, "removed")
          .when(col("av") =!= col("bv"), "changed")
          .otherwise("unchanged").as("class"),
        (coalesce(col("bv"), lit(0L)) - coalesce(col("av"), lit(0L))).as("delta"))
      .groupBy(col("class"))
      .agg(count(lit(1)).as("n"), sum(col("delta")).as("net_delta_cents"))
  }

  /** Referential-integrity audit: orphan counts for three FK relations in
    * one result — the DQ dimension the null/range checks can't see. The
    * parent side of the first relation is deliberately sampled (orders
    * keys ≡ 0 mod 97 removed) so the check provably FINDS orphans rather
    * than vacuously passing; the other two relations are intact. Each
    * relation is a LEFT ANTI join — child-side scan + one join, parent side
    * broadcast when small; counts are exact. At scale anti joins shuffle
    * only on the FK — the cheapest possible shape for an integrity sweep.
    */
  val dqReferential: QueryDef = QueryDef(
    "dq_referential",
    """SELECT 'lineitem->orders_sampled' AS relation,
      |  CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_child,
      |  CAST((SELECT count(*) FROM lineitem l
      |        WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                          WHERE o.o_orderkey = l.l_orderkey
      |                            AND o.o_orderkey % 97 <> 0)) AS BIGINT) AS n_orphans
      |UNION ALL
      |SELECT 'lineitem->supplier',
      |  CAST((SELECT count(*) FROM lineitem) AS BIGINT),
      |  CAST((SELECT count(*) FROM lineitem l
      |        WHERE NOT EXISTS (SELECT 1 FROM supplier s
      |                          WHERE s.s_suppkey = l.l_suppkey)) AS BIGINT)
      |UNION ALL
      |SELECT 'customer->nation',
      |  CAST((SELECT count(*) FROM customer) AS BIGINT),
      |  CAST((SELECT count(*) FROM customer c
      |        WHERE NOT EXISTS (SELECT 1 FROM nation n
      |                          WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT)""".stripMargin) {
    (spark, dir) =>
      import spark.implicits._
      val li = Tables.lineitem(spark, dir)
      // one count job per distinct child table — lineitem is the child of
      // two relations and must not be scanned-and-counted twice for it
      val liCount = li.count()
      val sampledOrders = Tables.orders(spark, dir)
        .filter(col("o_orderkey") % 97 =!= 0).select(col("o_orderkey"))
      def orphanCount(child: org.apache.spark.sql.DataFrame, childKey: String,
                      parent: org.apache.spark.sql.DataFrame, parentKey: String,
                      broadcastParent: Boolean): Long = {
        val p = if (broadcastParent) broadcast(parent) else parent
        child.join(p, col(childKey) === col(parentKey), "left_anti").count()
      }
      val customer = Tables.customer(spark, dir)
      Seq(
        ("lineitem->orders_sampled", liCount,
          orphanCount(li, "l_orderkey", sampledOrders, "o_orderkey", broadcastParent = false)),
        ("lineitem->supplier", liCount,
          orphanCount(li, "l_suppkey",
            Tables.supplier(spark, dir).select(col("s_suppkey")), "s_suppkey",
            broadcastParent = true)),
        ("customer->nation", customer.count(),
          orphanCount(customer, "c_nationkey",
            Tables.nation(spark, dir).select(col("n_nationkey")), "n_nationkey",
            broadcastParent = true)))
        .toDF("relation", "n_child", "n_orphans")
  }

  /** The SQL surface with a correlated scalar subquery (decorrelated by
    * Catalyst into a join): orders more than twice their customer's average.
    * Runs through `spark.sql` over temp views — same SQL text the oracle
    * executes. Averages come from exact integer cents, so the threshold
    * comparison is deterministic.
    */
  val sqlCorrelatedSubquery: QueryDef = {
    val sql =
      """SELECT o.o_orderkey,
        |       CAST(round(o.o_totalprice * 100) AS BIGINT) AS price_cents
        |FROM orders o
        |WHERE CAST(round(o.o_totalprice * 100) AS BIGINT) > (
        |  SELECT 2.0 * (CAST(SUM(CAST(round(o2.o_totalprice * 100) AS BIGINT)) AS DOUBLE)
        |                 / CAST(count(*) AS DOUBLE))
        |  FROM orders o2
        |  WHERE o2.o_custkey = o.o_custkey)""".stripMargin
    QueryDef("sql_correlated_subquery", sql) { (spark, dir) =>
      Tables.orders(spark, dir).createOrReplaceTempView("orders")
      spark.sql(sql)
    }
  }

  /** Column profiling: per-column counts/nulls/min/max/distinct — the
    * data-quality reconnaissance pass a pipeline runs before ingesting an
    * unknown 100 TB table (single scan, all metrics partial-aggregated).
    */
  val profileLineitem: QueryDef = QueryDef(
    "profile_lineitem",
    s"""SELECT
       |  CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(count(l_orderkey) AS BIGINT) AS orderkey_nonnull,
       |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS orderkey_distinct,
       |  CAST(min(l_orderkey) AS BIGINT) AS orderkey_min,
       |  CAST(max(l_orderkey) AS BIGINT) AS orderkey_max,
       |  CAST(min($C) AS BIGINT) AS price_cents_min,
       |  CAST(max($C) AS BIGINT) AS price_cents_max,
       |  CAST(count(DISTINCT l_returnflag) AS BIGINT) AS returnflag_distinct,
       |  min(l_shipdate) AS shipdate_min,
       |  max(l_shipdate) AS shipdate_max
       |FROM lineitem""".stripMargin) { (spark, dir) =>
    val cents = Num.cents(col("l_extendedprice"))
    Tables.lineitem(spark, dir).agg(
      count(lit(1)).as("n_rows"),
      count(col("l_orderkey")).as("orderkey_nonnull"),
      countDistinct(col("l_orderkey")).as("orderkey_distinct"),
      min(col("l_orderkey")).as("orderkey_min"),
      max(col("l_orderkey")).as("orderkey_max"),
      min(cents).as("price_cents_min"),
      max(cents).as("price_cents_max"),
      countDistinct(col("l_returnflag")).as("returnflag_distinct"),
      min(col("l_shipdate")).as("shipdate_min"),
      max(col("l_shipdate")).as("shipdate_max"))
  }

  /** Deterministic ~1% sample via Knuth's multiplicative hash on the row
    * key — plain modular integer arithmetic, so (unlike engine-internal
    * hash functions or `TABLESAMPLE`) the *same rows* are selected by any
    * engine: reproducible sampling you can oracle-check, re-run, and share
    * across systems. The key is masked to 31 bits before the multiply so
    * the product peaks at 2^31·2654435761 ≈ 5.7e18 < int64 max — the
    * arithmetic stays exact (no silent wrap, no ANSI overflow error) at any
    * key magnitude, including 100 TB-scale surrogate keys.
    */
  val deterministicSample: QueryDef = QueryDef(
    "deterministic_sample",
    s"""SELECT CAST(count(*) AS BIGINT) AS n_sampled,
      |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sampled_cents
      |FROM lineitem
      |WHERE (${Num.sqlSplitHash("l_orderkey", "l_linenumber")}) < 42949672""".stripMargin) {
    (spark, dir) =>
      Tables.lineitem(spark, dir)
        .filter(Num.splitHash(col("l_orderkey"), col("l_linenumber")) < lit(42949672L))
        .agg(
          count(lit(1)).as("n_sampled"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          sum(Num.cents(col("l_extendedprice"))).as("sampled_cents"))
  }

  /** Stratified deterministic sampling: per-stratum rates (rebalancing a
    * skewed class mix — the training-data form of sampling) with the same
    * multiplicative-hash row selection as `deterministic_sample`, so any
    * engine draws the identical rows. Output proves both the rate and the
    * exact membership (cents checksum) per stratum.
    */
  val sampleStratified: QueryDef = QueryDef(
    "sample_stratified",
    s"""SELECT l_returnflag,
      |  CAST(count(*) AS BIGINT) AS n_sampled,
      |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sampled_cents
      |FROM (
      |  SELECT l_returnflag, l_extendedprice,
      |         ${Num.sqlSplitHash("l_orderkey", "l_linenumber")} AS h
      |  FROM lineitem)
      |WHERE h < CASE l_returnflag
      |          WHEN 'A' THEN 858993459
      |          WHEN 'R' THEN 429496729
      |          ELSE 42949672 END
      |GROUP BY l_returnflag""".stripMargin) { (spark, dir) =>
    // rates: A 20%, R 10%, N 1% of 2^32
    val h = Num.splitHash(col("l_orderkey"), col("l_linenumber"))
    val threshold = when(col("l_returnflag") === "A", lit(858993459L))
      .when(col("l_returnflag") === "R", lit(429496729L))
      .otherwise(lit(42949672L))
    Tables.lineitem(spark, dir)
      .filter(h < threshold)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_sampled"),
        sum(Num.cents(col("l_extendedprice"))).as("sampled_cents"))
  }

  /** Fixed-width histogram: Spark's `width_bucket` vs the equivalent
    * integer-arithmetic bucketing in the oracle (DuckDB 1.0 has no
    * width_bucket) — exact-cents input keeps the boundary math unambiguous.
    */
  val histogramPrices: QueryDef = QueryDef(
    "histogram_prices",
    s"""SELECT CAST(CASE WHEN c < 0 THEN 0
       |                 WHEN c >= 12000000 THEN 25
       |                 ELSE (c * 24) // 12000000 + 1 END AS BIGINT) AS bucket,
       |       CAST(count(*) AS BIGINT) AS n
       |FROM (SELECT $C AS c FROM lineitem)
       |GROUP BY 1""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy(width_bucket(Num.cents(col("l_extendedprice")), lit(0), lit(12000000), lit(24)).as("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Quantity-weighted average price — ratio of two exact sums (weighted
    * aggregation without floating accumulation). The product sum runs in
    * decimal(38,0): qty*cents per row fits a long, but the *sum* would
    * overflow int64 around 1e19 — i.e. exactly at the 100 TB row counts this
    * engine targets.
    */
  val aggWeightedAvg: QueryDef = QueryDef(
    "agg_weighted_avg",
    s"""SELECT l_returnflag,
       |  CAST(SUM(CAST(CAST(round(l_quantity) AS BIGINT) * $C AS DECIMAL(38, 0))) AS DOUBLE)
       |    / CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) / 100.0 AS wavg_price
       |FROM lineitem
       |GROUP BY l_returnflag""".stripMargin) { (spark, dir) =>
    val qty = round(col("l_quantity")).cast("long")
    val weighted = (qty * Num.cents(col("l_extendedprice"))).cast("decimal(38,0)")
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg((sum(weighted).cast("double") /
        sum(qty).cast("double") / lit(100.0)).as("wavg_price"))
  }

  /** Pearson correlation from exact integer moments — the bivariate
    * extension of `agg_variance_exact`'s pattern: the five sums
    * (Σx, Σy, Σx², Σy², Σxy) accumulate as exact integers (decimal(38,0)
    * where a 64-bit sum could overflow at 100 TB row counts), so they are
    * associative and partitioning-independent; only the final closed-form
    * expression converts to double, in identical order in both engines.
    * `corr()` built-ins stream floating intermediates and can't hash-match
    * across engines — this form does.
    */
  val aggCorrExact: QueryDef = QueryDef(
    "agg_corr_exact",
    s"""WITH m AS (
       |  SELECT l_returnflag,
       |    CAST(count(*) AS BIGINT) AS n,
       |    CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sx,
       |    SUM(CAST($C AS HUGEINT)) AS sy,
       |    SUM(CAST(round(l_quantity) AS BIGINT) * CAST(round(l_quantity) AS BIGINT)) AS sxx,
       |    SUM(CAST($C AS HUGEINT) * CAST($C AS HUGEINT)) AS syy,
       |    SUM(CAST(round(l_quantity) AS BIGINT) * CAST($C AS HUGEINT)) AS sxy
       |  FROM lineitem GROUP BY 1)
       |SELECT l_returnflag, n,
       |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |  / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |     * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
       |    AS corr_qty_price
       |FROM m""".stripMargin) { (spark, dir) =>
    val qty = round(col("l_quantity")).cast("long")
    val cents = Num.cents(col("l_extendedprice"))
    val dec = "decimal(38,0)"
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(qty).as("sx"),
        sum(cents.cast(dec)).as("sy"),
        sum((qty * qty).cast(dec)).as("sxx"),
        sum((cents.cast(dec) * cents.cast(dec))).as("syy"),
        sum((qty * cents).cast(dec)).as("sxy"))
      .select(
        col("l_returnflag"), col("n"),
        ((col("n").cast("double") * col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double"))
          / (sqrt(col("n").cast("double") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double"))
            * sqrt(col("n").cast("double") * col("syy").cast("double")
              - col("sy").cast("double") * col("sy").cast("double"))))
          .as("corr_qty_price"))
  }

  /** Full pairwise Pearson correlation matrix over the four lineitem
    * numerics — `agg_corr_exact`'s integer-moment mechanism generalized:
    * ONE scan accumulates every first and second cross moment as exact
    * wide-integer sums (4 + 4 + 6 = 14 accumulators in a single aggregate —
    * not six self-joined corr() queries), and the six correlations assemble
    * from the one-row moment table with the shared closed form. Both the
    * SQL and the Spark side are GENERATED from the same column list, so
    * adding a metric extends the matrix in one place. The reduce state is
    * constant-size regardless of row count — the canonical 100 TB shape for
    * moment statistics.
    */
  val corrMatrix: QueryDef = {
    // (name, exact-integer SQL quantizer) — basis points for the two
    // sub-unit rates so every value is an integer
    val cols = Seq(
      "qty" -> "CAST(round(l_quantity) AS BIGINT)",
      "price_c" -> "CAST(round(l_extendedprice * 100) AS BIGINT)",
      "disc_bp" -> "CAST(round(l_discount * 10000) AS BIGINT)",
      "tax_bp" -> "CAST(round(l_tax * 10000) AS BIGINT)")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i)._1, cols(j)._1)
    def corrSql(a: String, b: String) =
      s"""(CAST(n AS DOUBLE) * CAST(s_${a}_$b AS DOUBLE) - CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE))
         |  / (sqrt(CAST(n AS DOUBLE) * CAST(s_${a}_$a AS DOUBLE) - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE))
         |     * sqrt(CAST(n AS DOUBLE) * CAST(s_${b}_$b AS DOUBLE) - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE)))""".stripMargin
    val momentSql =
      cols.map { case (n, q) => s"SUM(CAST($q AS HUGEINT)) AS s_$n" } ++
        (for { i <- cols.indices; j <- cols.indices if i <= j }
          yield s"SUM(CAST(${cols(i)._2} AS HUGEINT) * CAST(${cols(j)._2} AS HUGEINT)) AS s_${cols(i)._1}_${cols(j)._1}")
    val pairSelects = pairs.map { case (a, b) =>
      s"SELECT '$a' AS col_a, '$b' AS col_b, n,\n${corrSql(a, b)} AS r\nFROM m"
    }
    QueryDef(
      "corr_matrix",
      s"""WITH m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |  ${momentSql.mkString(",\n  ")}
         |  FROM lineitem)
         |${pairSelects.mkString("\nUNION ALL\n")}""".stripMargin) { (spark, dir) =>
      val q: Map[String, org.apache.spark.sql.Column] = Map(
        "qty" -> round(col("l_quantity")).cast("long"),
        "price_c" -> Num.cents(col("l_extendedprice")),
        "disc_bp" -> round(col("l_discount") * 10000).cast("long"),
        "tax_bp" -> round(col("l_tax") * 10000).cast("long"))
      // moment sums via BigSum: the per-row work is long multiply + long
      // add (codegen fast path) instead of 128-bit decimal ALU, while the
      // rollover-to-decimal buffer keeps the exact DECIMAL(38,0) value at
      // any row count — the products are bounded by the metric DOMAINS
      // (≤ ~1.1e14 for price²), not by table size, so the long stage is
      // scale-safe (guide §1.2-2 / VERDICT r16 #7)
      val firsts = cols.map { case (n, _) =>
        graft.functions.BigSum.of(q(n)).as(s"s_$n") }
      val seconds = for { i <- cols.indices; j <- cols.indices if i <= j } yield {
        val (a, b) = (cols(i)._1, cols(j)._1)
        graft.functions.BigSum.of(q(a) * q(b)).as(s"s_${a}_$b")
      }
      val m = Tables.lineitem(spark, dir)
        .agg(count(lit(1)).as("n"), (firsts ++ seconds): _*)
      def d(c: String) = col(c).cast("double")
      val rows = pairs.map { case (a, b) =>
        struct(
          lit(a).as("col_a"), lit(b).as("col_b"), col("n").as("n"),
          ((d("n") * d(s"s_${a}_$b") - d(s"s_$a") * d(s"s_$b"))
            / (sqrt(d("n") * d(s"s_${a}_$a") - d(s"s_$a") * d(s"s_$a"))
              * sqrt(d("n") * d(s"s_${b}_$b") - d(s"s_$b") * d(s"s_$b")))).as("r"))
      }
      m.select(explode(array(rows: _*)).as("p"))
        .select(col("p.col_a"), col("p.col_b"), col("p.n"), col("p.r"))
    }
  }

  /** Explicit GROUPING SETS (the general grouping-lattice form rollup/cube
    * specialize) through the SQL surface — the same SQL text runs in both
    * engines.
    */
  val aggGroupingSets: QueryDef = {
    val sql =
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |       coalesce(l_linestatus, 'ALL') AS linestatus,
        |       CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin
    QueryDef("agg_grouping_sets", sql) { (spark, dir) =>
      Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
      spark.sql(sql)
    }
  }

  /** Nested aggregation output through the gate: per-flag sorted array of
    * the distinct suppliers (deterministic: sorted, distinct). The array is
    * serialized to a CSV string for the cross-engine compare — the driver's
    * hash step can't order raw array cells, so the list itself is the value.
    */
  val arrayAggSorted: QueryDef = QueryDef(
    "array_agg_sorted",
    """SELECT l_returnflag,
      |  array_to_string(list(DISTINCT l_suppkey ORDER BY l_suppkey), ',') AS suppliers_csv,
      |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
      |FROM lineitem
      |GROUP BY l_returnflag""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        array_join(transform(array_sort(collect_set(col("l_suppkey"))),
          _.cast("string")), ",").as("suppliers_csv"),
        countDistinct(col("l_suppkey")).as("n_suppliers"))
  }

  /** Global deterministic top-n (order by exact cents + key tiebreak). */
  val sortLimitTopOrders: QueryDef = QueryDef(
    "sort_limit_top_orders",
    """SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
      |FROM orders
      |ORDER BY price_cents DESC, o_orderkey
      |LIMIT 20""".stripMargin) { (spark, dir) =>
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), Num.cents(col("o_totalprice")).as("price_cents"))
      .orderBy(col("price_cents").desc, col("o_orderkey"))
      .limit(20)
  }

  /** CUBE grouping sets (rollup's full-lattice sibling). */
  val aggCube: QueryDef = QueryDef(
    "agg_cube",
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |       coalesce(l_linestatus, 'ALL') AS linestatus,
      |       CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(round(col("l_quantity")).cast("long")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n_rows"),
        col("sum_qty"))
  }

  /** The full analytic-window surface over monthly nation revenue: lead,
    * ntile, percent_rank, cume_dist, first/last value, sliding-frame moving
    * average, running total. One shuffle on n_name; every frame reuses that
    * partitioning. All inputs are exact integer cents -> bit-stable.
    */
  val windowFrames: QueryDef = QueryDef(
    "window_frames",
    s"""WITH monthly AS (
       |  SELECT n.n_name, strftime(l.l_shipdate, '%Y-%m') AS month,
       |         CAST(SUM($DISC) AS BIGINT) AS rev_cents
       |  FROM lineitem l
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  JOIN nation n ON s.s_nationkey = n.n_nationkey
       |  GROUP BY 1, 2)
       |SELECT n_name, month,
       |  CAST(rev_cents AS DOUBLE) / 100.0 AS revenue,
       |  CAST(lead(rev_cents) OVER w AS DOUBLE) / 100.0 AS lead_revenue,
       |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
       |  percent_rank() OVER w AS pct_rank,
       |  cume_dist() OVER w AS cume,
       |  CAST(first_value(rev_cents) OVER w AS DOUBLE) / 100.0 AS first_revenue,
       |  CAST(last_value(rev_cents) OVER (PARTITION BY n_name ORDER BY month
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE) / 100.0 AS last_revenue,
       |  (CAST(sum(rev_cents) OVER (PARTITION BY n_name ORDER BY month
       |     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0)
       |    / CAST(count(rev_cents) OVER (PARTITION BY n_name ORDER BY month
       |        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_avg_3,
       |  CAST(sum(rev_cents) OVER (PARTITION BY n_name ORDER BY month
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents
       |FROM monthly
       |WINDOW w AS (PARTITION BY n_name ORDER BY month)""".stripMargin) { (spark, dir) =>
    val monthly = Tables.lineitem(spark, dir)
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), date_format(col("l_shipdate"), "yyyy-MM").as("month"))
      .agg(sum(Num.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("rev_cents"))
    val w = Window.partitionBy(col("n_name")).orderBy(col("month"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wMov = w.rowsBetween(-2, Window.currentRow)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    monthly.select(
      col("n_name"), col("month"),
      Num.centsToDouble(col("rev_cents")).as("revenue"),
      Num.centsToDouble(lead(col("rev_cents"), 1).over(w)).as("lead_revenue"),
      ntile(4).over(w).cast("int").as("quartile"),
      percent_rank().over(w).as("pct_rank"),
      cume_dist().over(w).as("cume"),
      Num.centsToDouble(first(col("rev_cents")).over(w)).as("first_revenue"),
      Num.centsToDouble(last(col("rev_cents")).over(wFull)).as("last_revenue"),
      (Num.centsToDouble(sum(col("rev_cents")).over(wMov)) /
        count(col("rev_cents")).over(wMov).cast("double")).as("moving_avg_3"),
      sum(col("rev_cents")).over(wRun).as("running_cents"))
  }

  /** Top-k per group via the typed [[graft.functions.TopKAggregator]]: an
    * O(k) buffer per group with map-side partial merge — the shuffle carries
    * k rows per group, not the whole group (the window formulation sorts
    * every group in full). Same deterministic order as the row_number
    * oracle.
    */
  val topkAggregatorSuppliers: QueryDef = QueryDef(
    "topk_aggregator_suppliers",
    s"""SELECT n_name, s_suppkey, CAST(revenue_cents AS BIGINT) AS revenue_cents,
       |       CAST(rnk AS INTEGER) AS rnk
       |FROM (
       |  SELECT n_name, s_suppkey, revenue_cents,
       |         row_number() OVER (PARTITION BY n_name ORDER BY revenue_cents DESC, s_suppkey) AS rnk
       |  FROM (
       |    SELECT n.n_name, s.s_suppkey,
       |           CAST(SUM($DISC) AS BIGINT) AS revenue_cents
       |    FROM lineitem l
       |    JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |    JOIN nation n ON s.s_nationkey = n.n_nationkey
       |    GROUP BY 1, 2))
       |WHERE rnk <= 3""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val rev = Tables.lineitem(spark, dir)
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("s_suppkey"))
      .agg(sum(Num.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_cents"))
    val topk = new graft.functions.TopKAggregator(3).toColumn
    rev.select(col("n_name"), col("revenue_cents"), col("s_suppkey"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(r => graft.functions.ScoredId(r._2, r._3))(graft.functions.TopKAggregator.scoredIdEncoder)
      .agg(topk.name("top"))
      .toDF("n_name", "top")
      .select(col("n_name"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(
        col("n_name"),
        col("e.id").as("s_suppkey"),
        col("e.score").as("revenue_cents"),
        (col("pos") + 1).cast("int").as("rnk"))
  }

  /** Skew-resistant two-stage aggregation: salt the (few, heavy) group keys
    * with a deterministic row attribute, partially aggregate per
    * (key, salt), then merge per key. At 100 TB this is how a handful of hot
    * keys stops capping parallelism at #keys; the result is provably
    * identical to the direct group-by (integer sums are associative), which
    * is exactly what the oracle asserts.
    */
  val aggSaltedTwoStage: QueryDef = QueryDef(
    "agg_salted_two_stage",
    s"""SELECT l_returnflag,
       |  CAST(SUM($DISC) AS DOUBLE) / 100.0 AS revenue,
       |  CAST(count(*) AS BIGINT) AS n_rows
       |FROM lineitem
       |GROUP BY l_returnflag""".stripMargin) { (spark, dir) =>
    val salted = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), pmod(col("l_orderkey"), lit(16)).as("salt"))
      .agg(
        sum(Num.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("c"),
        count(lit(1)).as("n"))
    salted.groupBy(col("l_returnflag"))
      .agg(
        Num.centsToDouble(sum(col("c"))).as("revenue"),
        sum(col("n")).as("n_rows"))
  }

  /** HLL sketch distinct (approx_count_distinct) next to the exact count —
    * the constant-memory path for distinct cardinality at 100 TB. DuckDB's
    * HLL differs, so the oracle checks the exact count plus the sketch's
    * relative-error contract (default rsd 5%; flag allows 10%) — fixed
    * sketch over fixed data makes the flag deterministic. ScalaTest bounds
    * the relative error in-process as well.
    */
  val aggApproxDistinct: QueryDef = QueryDef(
    "agg_approx_distinct",
    """SELECT l_returnflag,
      |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
      |  TRUE AS hll_within_10pct
      |FROM lineitem
      |GROUP BY l_returnflag""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .select(
        col("l_returnflag"),
        col("exact_parts"),
        (abs(col("approx_parts").cast("double") - col("exact_parts").cast("double")) <=
          lit(0.10) * col("exact_parts").cast("double")).as("hll_within_10pct"))
  }

  /** Value-RANGE window frame (vs the ROWS frames in `window_frames`): a
    * centered ±1-month revenue sum over a numeric month index — rows enter
    * the frame by *value distance*, so gaps in the series are handled
    * correctly (a missing month simply contributes nothing, where a ROWS
    * frame would wrongly pull in a farther month).
    */
  val windowRangeFrame: QueryDef = QueryDef(
    "window_range_frame",
    s"""WITH monthly AS (
       |  SELECT n.n_name,
       |         CAST((EXTRACT(year FROM l.l_shipdate) - 1995) * 12
       |              + EXTRACT(month FROM l.l_shipdate) AS BIGINT) AS month_idx,
       |         CAST(SUM($DISC) AS BIGINT) AS rev_cents
       |  FROM lineitem l
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  JOIN nation n ON s.s_nationkey = n.n_nationkey
       |  GROUP BY 1, 2)
       |SELECT n_name, month_idx,
       |  CAST(SUM(rev_cents) OVER (PARTITION BY n_name ORDER BY month_idx
       |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT) AS centered_3mo_cents
       |FROM monthly""".stripMargin) { (spark, dir) =>
    val monthly = Tables.lineitem(spark, dir)
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(
        col("n_name"),
        ((year(col("l_shipdate")) - 1995) * 12 + month(col("l_shipdate")))
          .cast("long").as("month_idx"))
      .agg(sum(Num.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("rev_cents"))
    val w = Window.partitionBy(col("n_name")).orderBy(col("month_idx")).rangeBetween(-1, 1)
    monthly.select(
      col("n_name"), col("month_idx"),
      sum(col("rev_cents")).over(w).as("centered_3mo_cents"))
  }

  /** Typed `KeyValueGroupedDataset.cogroup` — the Dataset API's "both
    * groups of one key in one function call" surface (the batch sibling of
    * the streaming `mapGroupsWithState` family): per order, reconcile the
    * order header's total against the sum of its line items, emitting the
    * item count and the exact-cents discrepancy. Arbitrary Scala runs per
    * key, but the PLAN is still the co-partitioned pair: one exchange +
    * sort per side, then a single streamed CoGroup pass — per-key state is
    * one group's rows, never a whole partition. The oracle states the same
    * reconciliation as a LEFT JOIN + GROUP BY.
    *
    * (TPC-H data reconciles to sum(extendedprice) exactly, headers with no
    * items keep n_items = 0 — both facts the oracle would catch if the
    * cogroup dropped or double-counted a side.)
    */
  val cogroupOrderTotals: QueryDef = QueryDef(
    "cogroup_order_totals",
    s"""SELECT o.o_orderkey,
       |  ${Num.sqlCents("o.o_totalprice")} AS total_cents,
       |  CAST(count(l.l_orderkey) AS BIGINT) AS n_items,
       |  CAST(coalesce(sum(${Num.sqlCents("l.l_extendedprice")}), 0) AS BIGINT)
       |    AS sum_item_cents
       |FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val ords = Tables.orders(spark, dir)
      .select(col("o_orderkey"), Num.cents(col("o_totalprice")).as("cents"))
      .as[(Long, Long)]
    val items = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), Num.cents(col("l_extendedprice")).as("cents"))
      .as[(Long, Long)]
    ords.groupByKey(_._1).cogroup(items.groupByKey(_._1)) { (k, os, ls) =>
      val headers = os.toSeq
      if (headers.isEmpty) Iterator.empty // item rows without a header: no output
      else {
        var n = 0L
        var sum = 0L
        ls.foreach { l => n += 1L; sum += l._2 }
        Iterator((k, headers.head._2, n, sum))
      }
    }.toDF("o_orderkey", "total_cents", "n_items", "sum_item_cents")
  }

  val all: Seq[QueryDef] = Seq(
    aggPricingSummary, aggDistinctCounts, aggRollup, aggCube, windowFrames, windowRangeFrame,
    topkAggregatorSuppliers, aggSaltedTwoStage, aggApproxDistinct,
    aggPercentiles, aggVarianceExact, aggApproxPercentile,
    joinRegionRevenue, joinSemiOrders, joinAntiCustomers, joinOuterCustomerOrders,
    rangeJoinBands, topkSuppliersPerNation, dedupDeterministic, windowMomNation,
    unpivotFlagRevenue, scanFilterProject, joinFullOuterBalances,
    tpchQ3Style, tpchQ5Style, tpchQ8Style, sqlCorrelatedSubquery, snapshotDiff, dqReferential,
    profileLineitem, deterministicSample, sampleStratified, histogramPrices, arrayAggSorted,
    aggGroupingSets, aggWeightedAvg, aggCorrExact, corrMatrix,
    setExceptOrders, setIntersectOrders, setUnionNations, setExceptAll,
    sortLimitTopOrders, cogroupOrderTotals)
}
