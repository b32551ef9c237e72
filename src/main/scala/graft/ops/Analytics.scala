package graft.ops

import graft.core.{Num, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution analytics: the ranking-distribution window functions
  * (`ntile` / `percent_rank` / `cume_dist`), higher statistical moments from
  * exact integer sums, wide pivots, null-safe joins and LOCF gap filling —
  * the remaining "every analyst uses these weekly" surface around the core
  * aggregates (reference scope: the summary statistics family of
  * jobs/transform.py:120-181, extended per the category-parity mandate).
  *
  * Scale notes are per-query; the common thread is that every window here is
  * PARTITIONED (no global single-partition window — the distributed global
  * rank lives in [[Ranking]]), and every aggregate carries exact integer /
  * decimal sums so results are bit-stable under any partitioning.
  */
object Analytics {

  /** Quartile bucket + relative rank position of every order within its
    * priority class. One partitioned window (5 priority classes spread over
    * the cluster; at 100 TB the partition count is the parallelism bound, so
    * a skewed single class would need the [[Ranking]] range-partition trick
    * — with ~uniform classes the plain window is the right plan). The
    * `(cents, o_orderkey)` sort key is a total order, which is what makes
    * ntile/percent_rank/cume_dist all deterministic.
    */
  val windowNtileCume: QueryDef = QueryDef(
    "window_ntile_cume",
    """SELECT o_orderkey, o_orderpriority,
      |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cum_dist
      |FROM (SELECT o_orderkey, o_orderpriority,
      |        CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |      FROM orders)
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY cents, o_orderkey)""".stripMargin) {
    (spark, dir) =>
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("cents"), col("o_orderkey"))
      Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderpriority"),
          Num.cents(col("o_totalprice")).as("cents"))
        .select(
          col("o_orderkey"), col("o_orderpriority"),
          ntile(4).over(w).cast("int").as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cum_dist"))
  }

  /** Exact skewness / excess kurtosis per return flag, extending
    * `agg_variance_exact`'s integer-moment pattern to the 3rd and 4th
    * moments: quantize to whole dollars, carry (n, Σd, Σd², Σd³, Σd⁴) as
    * exact decimal sums (d ≤ ~1.1e5 so d⁴ ≤ ~1.5e20 — far inside
    * DECIMAL(38)/int128), then assemble the standardized moments in ONE
    * fixed-order double expression shared verbatim with the oracle. The
    * denominator is written `m2 * sqrt(m2)` (and `m2 * m2`), never
    * `pow(x, 1.5)` — sqrt is IEEE-correctly-rounded in every engine, pow is
    * not. Aggregation is associative integer math: one partial-agg exchange,
    * bit-stable at any scale.
    */
  val aggSkewKurtExact: QueryDef = {
    // Shared double-assembly fragments (identical text → identical IEEE op
    // order on both engines). n/s1..s4 are exact integers already cast to
    // double.
    val mean = "(s1 / n)"
    val v = s"(s2 / n - $mean * $mean)"
    val skew = s"(s3 / n - 3.0 * $mean * (s2 / n) + 2.0 * $mean * $mean * $mean) / ($v * sqrt($v))"
    val kurt = s"(s4 / n - 4.0 * $mean * (s3 / n) + 6.0 * $mean * $mean * (s2 / n) " +
      s"- 3.0 * ($mean * $mean) * ($mean * $mean)) / ($v * $v) - 3.0"
    QueryDef(
      "agg_skew_kurt_exact",
      s"""WITH d AS (SELECT l_returnflag, CAST(round(l_extendedprice) AS BIGINT) AS d
         |           FROM lineitem),
         |m AS (SELECT l_returnflag,
         |        CAST(count(*) AS DOUBLE) AS n,
         |        CAST(SUM(CAST(d AS HUGEINT)) AS DOUBLE) AS s1,
         |        CAST(SUM(CAST(d AS HUGEINT) * d) AS DOUBLE) AS s2,
         |        CAST(SUM(CAST(d AS HUGEINT) * d * d) AS DOUBLE) AS s3,
         |        CAST(SUM(CAST(d AS HUGEINT) * d * d * d) AS DOUBLE) AS s4
         |      FROM d GROUP BY 1)
         |SELECT l_returnflag, $skew AS skewness_pop, $kurt AS kurtosis_excess
         |FROM m""".stripMargin) { (spark, dir) =>
      Tables.lineitem(spark, dir)
        .select(col("l_returnflag"), round(col("l_extendedprice")).cast("long").as("d"))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).cast("double").as("n"),
          sum(expr("CAST(d AS DECIMAL(38, 0))")).cast("double").as("s1"),
          sum(expr("CAST(d AS DECIMAL(38, 0)) * d")).cast("double").as("s2"),
          sum(expr("CAST(d AS DECIMAL(38, 0)) * d * d")).cast("double").as("s3"),
          sum(expr("CAST(d AS DECIMAL(38, 0)) * d * d * d")).cast("double").as("s4"))
        .select(
          col("l_returnflag"),
          expr(skew).as("skewness_pop"),
          expr(kurt).as("kurtosis_excess"))
    }
  }

  /** Wide pivot: revenue per ship-year spread across return-flag columns —
    * `groupBy(yr).pivot(flag, explicitValues)`. Passing the value list is
    * what keeps this scale-safe: without it Spark runs an extra distinct
    * job over the fact table just to learn the column set. Physically one
    * partial-aggregated exchange (pivot compiles to conditional aggregates,
    * exactly the oracle's CASE form — same plan shape as a plain group-by).
    */
  val pivotReturnflagRevenue: QueryDef = QueryDef(
    "pivot_returnflag_revenue",
    """SELECT CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS yr,
      |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(round(l_extendedprice * 100) AS BIGINT) END) AS DOUBLE) / 100.0 AS rev_a,
      |  CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(round(l_extendedprice * 100) AS BIGINT) END) AS DOUBLE) / 100.0 AS rev_n,
      |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(round(l_extendedprice * 100) AS BIGINT) END) AS DOUBLE) / 100.0 AS rev_r
      |FROM lineitem
      |GROUP BY 1""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .select(
        year(col("l_shipdate")).as("yr"),
        col("l_returnflag"),
        Num.cents(col("l_extendedprice")).as("c"))
      .groupBy(col("yr"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sum(col("c")))
      .select(
        col("yr"),
        Num.centsToDouble(col("A")).as("rev_a"),
        Num.centsToDouble(col("N")).as("rev_n"),
        Num.centsToDouble(col("R")).as("rev_r"))
  }

  /** Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): suppliers and
    * customers bucketed by a nation hash where one residue class per side is
    * deliberately NULLed — under plain `=` those rows silently vanish; under
    * null-safe equality NULL is a join key like any other. Spark plans this
    * as a regular hash join (the null bucket hashes to one key — if nulls
    * were a large fraction at 100 TB that one key is a skew hotspot, the
    * documented trade; salt or filter-and-union in that regime). Aggregated
    * to pair counts per key so the many-to-many blowup stays summarized.
    */
  val joinNullSafe: QueryDef = QueryDef(
    "join_null_safe",
    """WITH l AS (SELECT CASE WHEN s_nationkey % 7 = 3 THEN NULL
      |                      ELSE s_nationkey % 7 END AS k
      |           FROM supplier),
      |r AS (SELECT CASE WHEN c_nationkey % 7 = 5 THEN NULL
      |                  ELSE c_nationkey % 7 END AS k
      |      FROM customer)
      |SELECT l.k AS k, CAST(count(*) AS BIGINT) AS n_pairs
      |FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
      |GROUP BY 1""".stripMargin) { (spark, dir) =>
    val l = Tables.supplier(spark, dir)
      .select(when(col("s_nationkey") % 7 === 3, lit(null))
        .otherwise(col("s_nationkey") % 7).as("k"))
    val r = Tables.customer(spark, dir)
      .select(when(col("c_nationkey") % 7 === 5, lit(null))
        .otherwise(col("c_nationkey") % 7).as("k").as("rk"))
    l.join(r, col("k") <=> col("rk"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** LOCF (last-observation-carried-forward) gap fill: customer-bucket
    * monthly order totals densified onto the full calendar, missing months
    * filled with the latest preceding value — the standard time-series
    * repair before any trend model. Three bounded stages: one partial-agg
    * exchange to (bucket, month); a broadcast of the 1-row global month
    * bounds onto the distinct buckets (calendar generation is narrow — an
    * explode, no shuffle); and a per-bucket window for the fill. Every
    * stage is partitioned by bucket — nothing global, so the shape holds at
    * any scale.
    */
  val tsLocfFill: QueryDef = QueryDef(
    "ts_locf_fill",
    """WITH series AS (
      |  SELECT o_custkey % 50 AS bucket,
      |         date_trunc('month', o_orderdate) AS month,
      |         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS c
      |  FROM orders GROUP BY 1, 2),
      |bounds AS (SELECT min(month) AS mn, max(month) AS mx FROM series),
      |cal AS (
      |  SELECT b.bucket, UNNEST(generate_series(mn, mx, INTERVAL 1 MONTH)) AS month
      |  FROM (SELECT DISTINCT bucket FROM series) b, bounds)
      |SELECT cal.bucket, cal.month,
      |  CAST(last_value(s.c IGNORE NULLS) OVER (
      |         PARTITION BY cal.bucket ORDER BY cal.month
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0
      |    AS filled_total,
      |  s.c IS NOT NULL AS was_present
      |FROM cal LEFT JOIN series s ON s.bucket = cal.bucket AND s.month = cal.month""".stripMargin) {
    (spark, dir) =>
      val series = Tables.orders(spark, dir)
        .select(
          (col("o_custkey") % 50).as("bucket"),
          date_trunc("month", col("o_orderdate")).as("month"),
          Num.cents(col("o_totalprice")).as("cc"))
        .groupBy(col("bucket"), col("month"))
        .agg(sum(col("cc")).as("c"))
      val bounds = series.agg(min(col("month")).as("mn"), max(col("month")).as("mx"))
      val cal = series.select(col("bucket")).distinct()
        .crossJoin(broadcast(bounds))
        .select(col("bucket"),
          explode(sequence(col("mn"), col("mx"), expr("interval 1 month"))).as("month"))
      val w = Window.partitionBy(col("bucket")).orderBy(col("month"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cal.join(series, Seq("bucket", "month"), "left")
        .select(
          col("bucket"), col("month"),
          Num.centsToDouble(last(col("c"), ignoreNulls = true).over(w)).as("filled_total"),
          col("c").isNotNull.as("was_present"))
  }

  /** Finite-window exponentially weighted moving average (decay 1/2 over the
    * last 7 observations) of each customer-bucket's monthly order totals —
    * the trend smoother behind every "7-day EWMA" dashboard metric. The
    * windowed-lag formulation keeps it bit-stable where a recursive EWMA
    * never could be: weights are powers of two (lag k gets 2^(6-k)), the
    * numerator and denominator are exact integer sums over the ≤ 7 present
    * lags, and the result is two fixed-order IEEE divisions on identical
    * inputs in both engines. One partial-agg exchange plus one per-bucket
    * window — same bounded shape as `ts_locf_fill`, holds at any scale.
    */
  /** Shared monthly per-bucket series for the rolling-window queries
    * (`rolling_ewma` / `rolling_median`) — ONE definition per engine so the
    * pair can't drift, and the single-exchange contract lives in one place:
    * hash-partitioning on bucket alone satisfies the (bucket, month)
    * grouping's clustering AND the downstream window's partitioning, so the
    * aggregate and the window share one shuffle (PlanSpec asserts it for
    * both queries).
    */
  private val monthlySeriesSql =
    """series AS (
      |  SELECT o_custkey % 50 AS bucket,
      |         CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS c
      |  FROM orders GROUP BY 1, 2)""".stripMargin

  private def monthlyBucketSeries(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        (col("o_custkey") % 50).as("bucket"),
        date_trunc("month", col("o_orderdate")).cast(org.apache.spark.sql.types.DateType)
          .as("month"),
        Num.cents(col("o_totalprice")).as("cc"))
      .repartition(col("bucket"))
      .groupBy(col("bucket"), col("month"))
      .agg(sum(col("cc")).as("c"))

  val rollingEwma: QueryDef = {
    val sqlW = "PARTITION BY bucket ORDER BY month"
    val sqlNum = (0 to 6)
      .map(k => s"COALESCE(lag(c, $k) OVER ($sqlW), 0) * ${1L << (6 - k)}")
      .mkString(" + ")
    val sqlDen = (0 to 6)
      .map(k => s"CASE WHEN lag(c, $k) OVER ($sqlW) IS NULL THEN 0 ELSE ${1L << (6 - k)} END")
      .mkString(" + ")
    QueryDef(
      "rolling_ewma",
      s"""WITH $monthlySeriesSql
         |SELECT bucket, month,
         |  CAST($sqlNum AS DOUBLE) / CAST($sqlDen AS DOUBLE) / 100.0 AS ewma,
         |  CAST(${(0 to 6).map(k => s"CASE WHEN lag(c, $k) OVER ($sqlW) IS NULL THEN 0 ELSE 1 END").mkString(" + ")}
         |       AS INTEGER) AS n_window
         |FROM series""".stripMargin) { (spark, dir) =>
      val series = monthlyBucketSeries(spark, dir)
      val w = Window.partitionBy(col("bucket")).orderBy(col("month"))
      val lagged = (0 to 6).map(k => lag(col("c"), k).over(w))
      val num = (0 to 6).map(k => coalesce(lagged(k), lit(0L)) * lit(1L << (6 - k))).reduce(_ + _)
      val den = (0 to 6)
        .map(k => when(lagged(k).isNull, lit(0L)).otherwise(lit(1L << (6 - k))))
        .reduce(_ + _)
      val nw = (0 to 6).map(k => when(lagged(k).isNull, lit(0)).otherwise(lit(1))).reduce(_ + _)
      series.select(
        col("bucket"), col("month"),
        (num.cast("double") / den.cast("double") / lit(100.0)).as("ewma"),
        nw.cast("int").as("n_window"))
    }
  }

  /** Robust outlier detection via MAD (median absolute deviation): per
    * return flag, the median price, the MAD, and how many rows deviate more
    * than 3 MADs — the robust alternative to `outlier_zscore` (a single
    * fat-tailed cluster can inflate σ and mask outliers; the median/MAD
    * can't be dragged by them). Inherently multi-pass: medians, then
    * deviations, then the MAD, then the count — each pass a per-group
    * aggregate with the tiny (3-row) group stats broadcast back, so the
    * fact table is never windowed or shuffled on a row key. The three
    * passes share ONE fact scan: the 2-column (flag, cents) projection is
    * pinned with `localCheckpoint`, so the parquet read happens once and
    * the med/MAD/rollup passes replay the pinned projection — at 100 TB
    * that's a narrow columnar spill instead of three full-table reads.
    *
    * Bit-stability: cents are exact integers, medians interpolate at
    * worst to .5 (exact in double), deviations are half-integer-valued
    * doubles, the MAD quarter-integer — every quantity dyadic-rational,
    * so `percentile`/`quantile_cont` agree bitwise across engines.
    */
  val madOutliers: QueryDef = QueryDef(
    "mad_outliers",
    """WITH c AS (
      |  SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      |  FROM lineitem),
      |med AS (SELECT l_returnflag, quantile_cont(cents, 0.5) AS m FROM c GROUP BY 1),
      |dev AS (
      |  SELECT c.l_returnflag, abs(CAST(c.cents AS DOUBLE) - med.m) AS d, med.m
      |  FROM c JOIN med USING (l_returnflag)),
      |mad AS (SELECT l_returnflag, quantile_cont(d, 0.5) AS mad FROM dev GROUP BY 1)
      |SELECT dev.l_returnflag,
      |  dev.m / 100.0 AS median_price,
      |  mad.mad / 100.0 AS mad_price,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(count(*) FILTER (WHERE dev.d > 3.0 * mad.mad) AS BIGINT) AS n_outliers
      |FROM dev JOIN mad USING (l_returnflag)
      |GROUP BY 1, 2, 3""".stripMargin) { (spark, dir) =>
    val c = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), Num.cents(col("l_extendedprice")).as("cents"))
      .localCheckpoint()
    val med = c.groupBy(col("l_returnflag"))
      .agg(expr("percentile(cents, 0.5D)").as("m"))
    val dev = c.join(broadcast(med), "l_returnflag")
      .select(col("l_returnflag"), abs(col("cents").cast("double") - col("m")).as("d"), col("m"))
    val mad = dev.groupBy(col("l_returnflag"))
      .agg(expr("percentile(d, 0.5D)").as("mad"))
    dev.join(broadcast(mad), "l_returnflag")
      .groupBy(col("l_returnflag"), (col("m") / lit(100.0)).as("median_price"),
        (col("mad") / lit(100.0)).as("mad_price"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(when(col("d") > lit(3.0) * col("mad"), 1)).as("n_outliers"))
  }

  /** Incremental aggregate maintenance — reaggregation algebra: the stored
    * per-bucket (sum, count) state from the historical partition (orders
    * before 1997) is MERGED with a delta partial aggregate (1997+) instead
    * of recomputing from scratch, and the merged result must equal the
    * full-recompute oracle. Sum-of-sums / sum-of-counts is the exact
    * associative merge every incremental-view / streaming-state system
    * relies on; exact integer cents make it bit-stable. At 100 TB this is
    * the difference between touching the delta and touching the table: the
    * stored state is aggregate-sized (one row per bucket), and the only
    * full-width scan is the day's delta.
    */
  val incrementalAggMerge: QueryDef = QueryDef(
    "incremental_agg_merge",
    """SELECT o_custkey % 50 AS bucket,
      |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) AS avg_cents
      |FROM orders
      |GROUP BY 1""".stripMargin) { (spark, dir) =>
    val statePath = graft.rentals.Scratch.dir("graft_incr_agg_state")
    def partialAgg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy((col("o_custkey") % 50).as("bucket"))
      .agg(
        sum(Num.cents(col("o_totalprice"))).as("total_cents"),
        count(lit(1)).as("n_orders"))
    val orders = Tables.orders(spark, dir)
    // historical state, persisted once (aggregate-sized, not fact-sized)
    partialAgg(orders.filter(year(col("o_orderdate")) < 1997))
      .write.mode("overwrite").parquet(statePath)
    // merge = union of state and the delta's partial aggregate, re-summed
    spark.read.parquet(statePath)
      .unionByName(partialAgg(orders.filter(year(col("o_orderdate")) >= 1997)))
      .groupBy(col("bucket"))
      .agg(sum(col("total_cents")).as("total_cents"), sum(col("n_orders")).as("n_orders"))
      .select(
        col("bucket"), col("total_cents"), col("n_orders"),
        Num.ratio(col("total_cents"), col("n_orders")).as("avg_cents"))
  }

  /** Quantile binning (decile discretizer) — the feature-engineering step
    * that turns a skewed numeric column into 10 equal-population ordinal
    * bins. One percentile aggregate produces the 9 interior boundaries
    * (a 1-row broadcast); bin assignment is then a row-local count of
    * boundaries strictly below the value, so the fact table never shuffles
    * for the assignment — only for the final per-bin rollup, whose key
    * space is fixed at 10. Values exactly ON a boundary take the lower bin
    * in both engines (strict `>` both sides). Integer-cents inputs keep
    * the interpolated boundaries bit-identical cross-engine (the
    * `agg_percentiles` contract).
    */
  val quantileBinning: QueryDef = QueryDef(
    "quantile_binning",
    """WITH c AS (
      |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
      |b AS (
      |  SELECT quantile_cont(cents, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs
      |  FROM c)
      |SELECT CAST(1 + len(list_filter(b.bs, x -> CAST(c.cents AS DOUBLE) > x)) AS INTEGER) AS bin,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(min(c.cents) AS BIGINT) AS min_cents,
      |  CAST(max(c.cents) AS BIGINT) AS max_cents
      |FROM c CROSS JOIN b
      |GROUP BY 1""".stripMargin) { (spark, dir) =>
    val c = Tables.orders(spark, dir).select(Num.cents(col("o_totalprice")).as("cents"))
    val bounds = c.agg(expr(
      "percentile(cents, array(0.1D, 0.2D, 0.3D, 0.4D, 0.5D, 0.6D, 0.7D, 0.8D, 0.9D))").as("bs"))
    c.crossJoin(broadcast(bounds))
      .select(
        (lit(1) + size(expr("filter(bs, x -> CAST(cents AS DOUBLE) > x)"))).cast("int").as("bin"),
        col("cents"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        min(col("cents")).as("min_cents"),
        max(col("cents")).as("max_cents"))
  }

  /** Trailing 7-observation rolling MEDIAN per bucket — the robust smoother
    * next to [[rollingEwma]]'s weighted mean (one delayed spike drags a mean
    * for 7 rows; the median ignores it). `percentile` as a WINDOW aggregate
    * over a ROWS frame: the frame holds ≤ 7 integer-cents values, so the
    * interpolated median is dyadic-rational and bit-identical to DuckDB's
    * windowed `quantile_cont`. Same single-exchange shape as the EWMA (the
    * explicit bucket repartition serves aggregate and window alike).
    */
  val rollingMedian: QueryDef = QueryDef(
    "rolling_median",
    s"""WITH $monthlySeriesSql
       |SELECT bucket, month,
       |  quantile_cont(c, 0.5) OVER (PARTITION BY bucket ORDER BY month
       |                              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) / 100.0
       |    AS rolling_median
       |FROM series""".stripMargin) { (spark, dir) =>
    val series = monthlyBucketSeries(spark, dir)
    val w = Window.partitionBy(col("bucket")).orderBy(col("month")).rowsBetween(-6, 0)
    series.select(
      col("bucket"), col("month"),
      (expr("percentile(c, 0.5D)").over(w) / lit(100.0)).as("rolling_median"))
  }

  /** Several DISTINCT aggregates with different keys in one query — the
    * shape Catalyst plans with an Expand (one row replica per distinct
    * group, NULL-padded), turning N distinct columns into one aggregation
    * tree instead of N self-joined queries. Worth pinning because the naive
    * alternative (N separate scans + join) is the 100 TB anti-pattern;
    * Expand costs one shuffle carrying n_distinct_cols × rows but scans the
    * fact table once.
    */
  val aggMultiDistinct: QueryDef = QueryDef(
    "agg_multi_distinct",
    """SELECT l_returnflag,
      |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
      |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
      |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      |FROM lineitem
      |GROUP BY 1""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_suppliers"),
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        sum(Num.cents(col("l_extendedprice"))).as("rev_cents"))
  }

  /** Join-key skew profile — the diagnostic that decides the shuffle
    * strategy BEFORE a 100-TB join: per-key row counts for a join key
    * (l_suppkey here), reduced to key count, max/mean load, exact p50/p99
    * of the per-key load, and the skew factor (max / mean). A skew factor
    * near 1 says hash-partitioning balances; a large one says the top key
    * dominates a task and the join needs salting
    * ([[graft.ops.Skew.saltedEquiJoin]]) or AQE skew splitting. Two-level
    * aggregate: the per-key count is the one fact-table shuffle
    * (map-side combined), the stats pass runs over the keys-sized count
    * table. Counts are exact integers, so the quantile interpolation is
    * dyadic-rational and the mean an integer ratio — bit-stable.
    */
  val joinKeySkewProfile: QueryDef = QueryDef(
    "join_key_skew_profile",
    """WITH c AS (
      |  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n
      |  FROM lineitem GROUP BY 1)
      |SELECT CAST(count(*) AS BIGINT) AS n_keys,
      |  CAST(max(n) AS BIGINT) AS max_n,
      |  CAST(SUM(n) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_n,
      |  quantile_cont(n, 0.5) AS p50_n,
      |  quantile_cont(n, 0.99) AS p99_n,
      |  CAST(max(n) AS DOUBLE) / (CAST(SUM(n) AS DOUBLE) / CAST(count(*) AS DOUBLE))
      |    AS skew_factor
      |FROM c""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
      .agg(
        count(lit(1)).as("n_keys"),
        max(col("n")).as("max_n"),
        (sum(col("n")).cast("double") / count(lit(1)).cast("double")).as("mean_n"),
        expr("percentile(n, 0.5D)").as("p50_n"),
        expr("percentile(n, 0.99D)").as("p99_n"),
        (max(col("n")).cast("double") /
          (sum(col("n")).cast("double") / count(lit(1)).cast("double"))).as("skew_factor"))
  }

  /** Market-basket association rules over order baskets (basket = order,
    * item = part): every co-purchased pair with support >= 2, with exact
    * support counts and bit-stable confidence/lift (single IEEE divisions of
    * exact int64 products — [[graft.core.Num]] discipline).
    *
    * Scale shape: the per-order item dedup and the pair self-join share ONE
    * order-keyed exchange (the co-purchase pattern of [[Graph]]); pair
    * support is a map-side-combined rollup on the pair key; per-item basket
    * counts are an item-keyed rollup joined back to the (already much
    * smaller, support-filtered) rule table. The basket count is a 1-row
    * aggregate broadcast into the projection. No all-pairs work ever
    * happens outside a shared order: candidate pairs are generated only
    * within baskets — at 100 TB the pair table is bounded by
    * sum over orders of C(items_per_order, 2), not by |parts|^2.
    */
  val basketRules: QueryDef = QueryDef(
    "basket_rules",
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |n_baskets AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS nb FROM items),
      |item_n AS (SELECT p, CAST(count(*) AS BIGINT) AS n FROM items GROUP BY 1),
      |pairs AS (
      |  SELECT a.p AS u, b.p AS v, CAST(count(*) AS BIGINT) AS n_uv
      |  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
      |  GROUP BY 1, 2 HAVING count(*) >= 2)
      |SELECT pairs.u, pairs.v, pairs.n_uv,
      |  iu.n AS n_u, iv.n AS n_v, nb.nb AS n_baskets,
      |  CAST(pairs.n_uv AS DOUBLE) / CAST(iu.n AS DOUBLE) AS conf_u_v,
      |  CAST(pairs.n_uv AS DOUBLE) / CAST(iv.n AS DOUBLE) AS conf_v_u,
      |  CAST(pairs.n_uv * nb.nb AS DOUBLE) / CAST(iu.n * iv.n AS DOUBLE) AS lift
      |FROM pairs
      |JOIN item_n iu ON iu.p = pairs.u
      |JOIN item_n iv ON iv.p = pairs.v
      |CROSS JOIN n_baskets nb""".stripMargin) { (spark, dir) =>
    val items = Graph.basketItemsPinned(spark, dir)
    val nBaskets = items.agg(countDistinct(col("o")).as("nb"))
    val itemN = items.groupBy(col("p")).agg(count(lit(1)).as("n"))
    val pairs = Graph.pairSupportPinned(spark, dir)
      .filter(col("n_uv") >= 2)
    pairs
      .join(itemN.select(col("p").as("u"), col("n").as("n_u")), Seq("u"))
      .join(itemN.select(col("p").as("v"), col("n").as("n_v")), Seq("v"))
      .crossJoin(broadcast(nBaskets))
      .select(
        col("u"), col("v"), col("n_uv"), col("n_u"), col("n_v"),
        col("nb").as("n_baskets"),
        (col("n_uv").cast("double") / col("n_u").cast("double")).as("conf_u_v"),
        (col("n_uv").cast("double") / col("n_v").cast("double")).as("conf_v_u"),
        ((col("n_uv") * col("nb")).cast("double") /
          (col("n_u") * col("n_v")).cast("double")).as("lift"))
  }

  /** Pareto frontier (skyline) of parts under (minimize retail price,
    * maximize size): a part is ON the skyline iff no other part is at most
    * its price AND at least its size with one strict. The textbook
    * formulation is the O(n^2) NOT EXISTS self-join (which IS the oracle);
    * the engine derives the same set with domain-bounded work:
    *
    *   dominated(q)  <=>  maxsize(price < q.price) >= q.size
    *                   OR maxsize(price = q.price) >  q.size
    *
    * Per-price max sizes are one map-side-combined rollup whose cardinality
    * is the PRICE DOMAIN (10k distinct cents here), not the table; the
    * strict-prefix max over that tiny table is a range-frame window (single
    * partition over a domain-bounded input — the global_rank_ranged
    * precedent); both maxima broadcast-join back and the verdict is
    * row-local. At 100 TB: one rollup + one broadcast join, zero all-pairs
    * work, versus the oracle's quadratic loop.
    */
  val skylinePareto: QueryDef = QueryDef(
    "skyline_pareto",
    s"""WITH pts AS (
      |  SELECT p_partkey, ${graft.core.Num.sqlCents("p_retailprice")} AS price_cents,
      |         CAST(p_size AS BIGINT) AS size
      |  FROM part)
      |SELECT q.p_partkey, q.price_cents, q.size
      |FROM pts q
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM pts p
      |  WHERE p.price_cents <= q.price_cents AND p.size >= q.size
      |    AND (p.price_cents < q.price_cents OR p.size > q.size))""".stripMargin) {
    (spark, dir) =>
      val pts = Tables.part(spark, dir).select(
        col("p_partkey"),
        graft.core.Num.cents(col("p_retailprice")).as("price_cents"),
        col("p_size").cast("long").as("size"))
      skyline2D(pts, minimize = "price_cents", maximize = "size")
  }

  /** 2-D skyline of `pts`: the rows not dominated under (minimize `minimize`
    * column, maximize `maximize` column). Domain-bounded plan: one rollup on
    * the minimized value, a strict-prefix range-frame window over that
    * (domain-sized) table, one broadcast join back, row-local verdict.
    */
  def skyline2D(pts: DataFrame, minimize: String, maximize: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perX = pts.groupBy(col(minimize)).agg(max(col(maximize)).as("gmax"))
    val w = Window.orderBy(col(minimize))
      .rangeBetween(Window.unboundedPreceding, -1)
    val bounds = perX.select(
      col(minimize),
      col("gmax"),
      max(col("gmax")).over(w).as("prefmax"))
    pts.join(broadcast(bounds), Seq(minimize))
      .filter(!(coalesce(col("prefmax") >= col(maximize), lit(false)) ||
        col("gmax") > col(maximize)))
      .select(pts.columns.map(col).toIndexedSeq: _*)
  }

  /** Free pipeline telemetry via `Observation`: input row count, null-drop
    * count, exact revenue cents, and the post-filter output count are all
    * collected on the SAME single scan that produces the output — the
    * accumulator mechanism Spark exposes for production monitoring, the
    * 100 TB answer to "instrument the pipeline without a second pass". The
    * query returns the metrics row itself; the oracle recomputes the same
    * four aggregates relationally.
    */
  val pipelineObserve: QueryDef = QueryDef(
    "pipeline_observe",
    s"""SELECT
      |  CAST(count(*) AS BIGINT) AS n_input,
      |  CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_null_qty,
      |  CAST(sum(${graft.core.Num.sqlCents("l_extendedprice")}) AS BIGINT)
      |    AS revenue_cents,
      |  CAST(sum(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_output
      |FROM lineitem""".stripMargin) { (spark, dir) =>
    val obs = new org.apache.spark.sql.Observation()
    val staged = Tables.lineitem(spark, dir)
      .select(col("l_quantity"), col("l_extendedprice"))
      .observe(
        obs,
        count(lit(1)).as("n_input"),
        sum(when(col("l_quantity").isNull, 1L).otherwise(0L)).as("n_null_qty"),
        sum(graft.core.Num.cents(col("l_extendedprice"))).as("revenue_cents"))
      .filter(col("l_quantity") >= 25)
    val nOutput = staged.count()
    val m = obs.get
    import spark.implicits._
    Seq((
      m("n_input").asInstanceOf[Long],
      m("n_null_qty").asInstanceOf[Long],
      m("revenue_cents").asInstanceOf[Long],
      nOutput))
      .toDF("n_input", "n_null_qty", "revenue_cents", "n_output")
  }

  /** Per-nation revenue trend by EXACT least squares: monthly revenue in
    * integer cents, month index x offset to 1995-01 (keeps every moment
    * sum inside int64), and the closed-form OLS solution computed from
    * exact integer moment sums —
    * slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), intercept analogous — so
    * the ONLY floating-point operations are the two final divisions of
    * identical int64 values (bit-stable in any engine, unlike the
    * accumulate-doubles `regr_slope`).
    *
    * Scale shape: the fact table folds to (nation × month) moment sums in
    * one map-side-combined aggregate; the OLS fold is a second rollup over
    * that calendar-bounded table. Nothing downstream of the first
    * aggregate depends on data size.
    */
  val trendByNation: QueryDef = QueryDef(
    "trend_by_nation",
    s"""WITH monthly AS (
       |  SELECT n.n_name,
       |         CAST((year(l.l_shipdate) - 1995) * 12 + month(l.l_shipdate) - 1
       |              AS BIGINT) AS x,
       |         CAST(SUM(${Num.sqlCents("l.l_extendedprice * (1.0 - l.l_discount)")})
       |              AS BIGINT) AS y
       |  FROM lineitem l
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  JOIN nation n ON s.s_nationkey = n.n_nationkey
       |  GROUP BY 1, 2),
       |m AS (
       |  SELECT n_name, CAST(count(*) AS BIGINT) AS n,
       |         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
       |  FROM monthly GROUP BY 1)
       |SELECT n_name, n AS n_months,
       |  CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
       |    AS slope_cents,
       |  CAST(sy * sxx - sx * sxy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
       |    AS intercept_cents
       |FROM m WHERE n * sxx - sx * sx != 0""".stripMargin) { (spark, dir) =>
    val monthly = Tables.lineitem(spark, dir)
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(
        col("n_name"),
        ((year(col("l_shipdate")) - 1995) * 12 + month(col("l_shipdate")) - 1)
          .cast("long").as("x"))
      .agg(sum(Num.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("y"))
    val m = monthly.groupBy(col("n_name")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    m.filter(den =!= 0)
      .select(
        col("n_name"), col("n").as("n_months"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          den.cast("double")).as("slope_cents"),
        ((col("sy") * col("sxx") - col("sx") * col("sxy")).cast("double") /
          den.cast("double")).as("intercept_cents"))
  }

  /** Per-language source-mix diversity as GINI IMPURITY, 1 − Σ p_s² — the
    * rational cousin of entropy (whose ln is libm-defined and therefore
    * banned from the oracle contract): exact integer counts, one final
    * division (N² − Σ n_s²) / N². The mixture-collapse monitor for a
    * multi-source corpus — impurity 0 means a language is fed by one
    * source. Two tiny rollups ((lang × source), then lang); nothing scales
    * past the group-count table.
    */
  val sourceGiniDiversity: QueryDef = QueryDef(
    "source_gini_diversity",
    """WITH c AS (
      |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n
      |  FROM documents GROUP BY 1, 2)
      |SELECT lang,
      |  CAST(sum(n) AS BIGINT) AS n_docs,
      |  CAST(count(*) AS BIGINT) AS n_sources,
      |  CAST(sum(n) * sum(n) - sum(n * n) AS DOUBLE)
      |    / CAST(sum(n) * sum(n) AS DOUBLE) AS gini
      |FROM c GROUP BY 1""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("lang"))
      .agg(
        sum(col("n")).as("n_docs"),
        count(lit(1)).as("n_sources"),
        ((sum(col("n")) * sum(col("n")) - sum(col("n") * col("n"))).cast("double") /
          (sum(col("n")) * sum(col("n"))).cast("double")).as("gini"))
  }

  /** Forecast-evaluation harness in exact arithmetic: score the naive
    * forecast (next month = this month) per nation with MAE over the
    * monthly revenue series — |Δ| sums stay integer cents, the mean is one
    * division. The lag rides one nation-keyed window; everything after the
    * monthly rollup is calendar-bounded. The shape generalizes: any
    * forecast expressible as a window over the series (seasonal-naive,
    * moving average) backtests on the same plan.
    */
  val backtestNaiveMae: QueryDef = QueryDef(
    "backtest_naive_mae",
    s"""WITH monthly AS (
       |  SELECT n.n_name, strftime(l.l_shipdate, '%Y-%m') AS month,
       |         CAST(SUM(${Num.sqlCents("l.l_extendedprice * (1.0 - l.l_discount)")})
       |              AS BIGINT) AS y
       |  FROM lineitem l
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  JOIN nation n ON s.s_nationkey = n.n_nationkey
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT n_name, y,
       |         lag(y) OVER (PARTITION BY n_name ORDER BY month) AS yhat
       |  FROM monthly)
       |SELECT n_name,
       |  CAST(count(yhat) AS BIGINT) AS n_evals,
       |  CAST(sum(abs(y - yhat)) AS BIGINT) AS total_abs_err_cents,
       |  CAST(sum(abs(y - yhat)) AS DOUBLE) / CAST(count(yhat) AS DOUBLE)
       |    AS mae_cents
       |FROM scored WHERE yhat IS NOT NULL
       |GROUP BY 1""".stripMargin) { (spark, dir) =>
    val monthly = Tables.lineitem(spark, dir)
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), date_format(col("l_shipdate"), "yyyy-MM").as("month"))
      .agg(sum(Num.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("y"))
    val w = Window.partitionBy(col("n_name")).orderBy(col("month"))
    monthly
      .withColumn("yhat", lag(col("y"), 1).over(w))
      .filter(col("yhat").isNotNull)
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_evals"),
        sum(abs(col("y") - col("yhat"))).as("total_abs_err_cents"),
        (sum(abs(col("y") - col("yhat"))).cast("double") /
          count(lit(1)).cast("double")).as("mae_cents"))
  }

  /** EXACT k-th smallest (lower median) by DISTRIBUTED SEARCH on the value
    * domain — the selection algorithm that replaces a global sort at scale:
    * log4096(domain) rounds (2 for a cents-scale domain), each ONE
    * map-side-combined histogram over the surviving bracket; the driver
    * holds ≤4096 bucket counts. A sort-based median shuffles the whole
    * column; this shuffles nothing, ever, and each scan is
    * predicate-pushdown-friendly. Also reports n and the bracket-proof
    * counts (how many values < and <= the answer), which certify
    * correctness in the output itself: cnt_lt < k <= cnt_le.
    */
  val medianBinarySearch: QueryDef = QueryDef(
    "median_binary_search",
    s"""WITH v AS (
       |  SELECT ${Num.sqlCents("l_extendedprice")} AS x FROM lineitem),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
       |k AS (SELECT CAST((n + 1) // 2 AS BIGINT) AS k FROM n),
       |med AS (
       |  SELECT x AS median_cents FROM v
       |  ORDER BY x LIMIT 1 OFFSET (SELECT k - 1 FROM k))
       |SELECT (SELECT n FROM n) AS n, (SELECT k FROM k) AS k,
       |  (SELECT median_cents FROM med) AS median_cents,
       |  (SELECT CAST(count(*) AS BIGINT) FROM v
       |   WHERE x < (SELECT median_cents FROM med)) AS cnt_lt,
       |  (SELECT CAST(count(*) AS BIGINT) FROM v
       |   WHERE x <= (SELECT median_cents FROM med)) AS cnt_le""".stripMargin) {
    (spark, dir) =>
      val v = Tables.lineitem(spark, dir)
        .select(Num.cents(col("l_extendedprice")).as("x"))
        .localCheckpoint() // one narrow column pinned for the counting rounds
      val stats = v.agg(count(lit(1)).as("n"), min(col("x")).as("mn"), max(col("x")).as("mx"))
        .collect().head
      val (n, mn, mx) = (stats.getAs[Long]("n"), stats.getAs[Long]("mn"), stats.getAs[Long]("mx"))
      val k = (n + 1) / 2 // lower median = k-th smallest
      // 4096-ary search (histogram refine): each round ONE map-side-combined
      // bucket count over the surviving range, then the bracket narrows by
      // 4096× — a cents-scale domain resolves in 2 rounds instead of the
      // ~35 a binary search of single conditional counts would take (each
      // round is a full scan; scans, not comparisons, are the scale cost).
      var lo = mn // invariant: the k'-th smallest of x in [lo, hi] is the answer
      var hi = mx
      var kRemaining = k
      while (lo < hi) {
        val width = math.max(1L, (hi - lo) / 4096L + 1L)
        val buckets = v.filter(col("x") >= lo && col("x") <= hi)
          .groupBy(expr(s"(x - $lo) div $width").as("b"))
          .agg(count(lit(1)).as("c"))
          .collect().map(r => r.getAs[Long]("b") -> r.getAs[Long]("c"))
          .sortBy(_._1)
        var acc = 0L
        val (bkt, inBucket) = buckets.collectFirst {
          case (b, c) if { acc += c; acc >= kRemaining } => (b, kRemaining - (acc - c))
        }.get
        kRemaining = inBucket
        lo = lo + bkt * width
        hi = math.min(hi, lo + width - 1)
      }
      val median = lo
      val proof = v.agg(
        sum(when(col("x") < median, 1L).otherwise(0L)).as("cnt_lt"),
        sum(when(col("x") <= median, 1L).otherwise(0L)).as("cnt_le"))
        .collect().head
      import spark.implicits._
      Seq((n, k, median, proof.getAs[Long]("cnt_lt"), proof.getAs[Long]("cnt_le")))
        .toDF("n", "k", "median_cents", "cnt_lt", "cnt_le")
  }

  /** Market concentration per nation: the Herfindahl–Hirschman index over
    * supplier revenue shares, HHI = Σ rᵢ² / (Σ rᵢ)² — 1/n for a perfectly
    * even market, 1.0 for a monopoly. The squares accumulate in exact
    * DECIMAL(38) (the [[aggSkewKurtExact]] pattern — int64 would overflow
    * rᵢ² past ~sf1), and both final squarings/divisions run on
    * identically-derived doubles, so the index is bit-stable. Two
    * rollups: fact → (nation × supplier) revenue, then the
    * supplier-bounded concentration fold.
    */
  val marketConcentrationHhi: QueryDef = QueryDef(
    "market_concentration_hhi",
    s"""WITH r AS (
       |  SELECT n.n_name, l.l_suppkey,
       |         CAST(SUM(${Num.sqlCents("l.l_extendedprice * (1.0 - l.l_discount)")})
       |              AS BIGINT) AS rev
       |  FROM lineitem l
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  JOIN nation n ON s.s_nationkey = n.n_nationkey
       |  GROUP BY 1, 2)
       |SELECT n_name,
       |  CAST(count(*) AS BIGINT) AS n_suppliers,
       |  CAST(SUM(CAST(rev AS HUGEINT) * rev) AS DOUBLE) /
       |    (CAST(SUM(rev) AS DOUBLE) * CAST(SUM(rev) AS DOUBLE)) AS hhi
       |FROM r GROUP BY 1""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("l_suppkey"))
      .agg(sum(Num.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("rev"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_suppliers"),
        (sum(expr("CAST(rev AS DECIMAL(38, 0)) * rev")).cast("double") /
          (sum(col("rev")).cast("double") * sum(col("rev")).cast("double"))).as("hhi"))
  }

  val all: Seq[QueryDef] = Seq(
    windowNtileCume, aggSkewKurtExact, pivotReturnflagRevenue, joinNullSafe, tsLocfFill,
    rollingEwma, madOutliers, incrementalAggMerge, quantileBinning, rollingMedian,
    aggMultiDistinct, joinKeySkewProfile, basketRules, skylinePareto, pipelineObserve,
    trendByNation, sourceGiniDiversity, backtestNaiveMae, medianBinarySearch,
    marketConcentrationHhi)
}
