package graft.ops

import graft.core.{Num, QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream batch analytics: JSON property extraction, tumbling-window
  * aggregation (the batch dual of the Structured Streaming job in
  * [[graft.streaming.Streams]]), and gap-based sessionization.
  *
  * Sessionization gap math uses exact integer microseconds (`unix_micros` /
  * DuckDB `epoch_us`) — the event timestamps carry sub-second precision, and
  * float-seconds arithmetic would not be oracle-stable.
  */
object Events {

  /** JSON extraction (`get_json_object`) + aggregation over `events.props`. */
  val jsonExtractAgg: QueryDef = QueryDef(
    "json_extract_agg",
    """SELECT event_type,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM events
      |GROUP BY event_type""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
  }

  /** Tumbling 1-hour window aggregation via the `window()` time-bucketing
    * function (epoch-aligned, so it equals `date_trunc('hour', ts)`).
    */
  val eventsHourly: QueryDef = QueryDef(
    "events_hourly",
    """SELECT date_trunc('hour', ts) AS hour_start, event_type,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
      |FROM events
      |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        Num.centsToDouble(sum(Num.cents(col("value")))).as("total_value"))
      .select(
        col("window.start").as("hour_start"),
        col("event_type"), col("n_events"), col("total_value"))
  }

  /** Gap-based sessionization (30-min inactivity boundary): lag to flag
    * session starts, running sum to number sessions, then per-session rollup.
    * One shuffle on `user_id`; both windows and the final group-by reuse that
    * partitioning (Catalyst plans a single exchange) — the shape that scales.
    */
  /** The gap-sessionization CTE chain, shared by the sessionize oracle and
    * the sweep-line concurrency oracle so both state the SAME sessions.
    */
  private val sessionsSqlCtes =
    """flagged AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR (epoch_us(ts) - epoch_us(lag(ts) OVER w)) > 1800000000
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |numbered AS (
      |  SELECT user_id, ts,
      |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      |  FROM flagged),
      |sessions AS (
      |  SELECT user_id, session_seq,
      |    min(ts) AS session_start, max(ts) AS session_end,
      |    CAST(count(*) AS BIGINT) AS n_events
      |  FROM numbered
      |  GROUP BY user_id, session_seq)""".stripMargin

  val sessionizeEvents: QueryDef = QueryDef(
    "sessionize_events",
    s"""WITH $sessionsSqlCtes
       |SELECT user_id, session_seq, session_start, session_end, n_events
       |FROM sessions""".stripMargin) { (spark, dir) =>
    sessionsOf(spark, dir)
  }

  /** Peak concurrency via a distributed sweep line: how many gap-sessions
    * are simultaneously open at the busiest instant (sessions closed-
    * interval [start, end]; at equal timestamps starts are processed before
    * ends, and the remaining tie order is pinned by (user_id, session_seq),
    * so the running sum is a total-order fold — engine-independent). The
    * boundary stream (+1 at start, −1 at end) goes through
    * [[Ranking.globalRunningSumBy]]: range-partitioned on the sweep order,
    * per-partition local prefix sums, broadcast offsets over ≤#partitions
    * totals — NO single-partition window anywhere, the sweep scales with
    * the session count. The cum table is pinned (one derivation) and the
    * peak/earliest-instant/total rollups read the pinned table.
    */
  val peakConcurrency: QueryDef = QueryDef(
    "peak_concurrency",
    s"""WITH $sessionsSqlCtes,
       |b AS (
       |  SELECT session_start AS ts, 0 AS bound, 1 AS delta, user_id, session_seq
       |  FROM sessions
       |  UNION ALL
       |  SELECT session_end, 1, -1, user_id, session_seq FROM sessions),
       |c AS (
       |  SELECT ts, CAST(SUM(delta) OVER (ORDER BY ts, bound, user_id, session_seq
       |                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |  FROM b),
       |p AS (SELECT max(cum) AS peak_concurrency FROM c)
       |SELECT p.peak_concurrency,
       |  (SELECT min(ts) FROM c WHERE cum = p.peak_concurrency) AS peak_ts,
       |  (SELECT CAST(count(*) AS BIGINT) FROM sessions) AS n_sessions
       |FROM p""".stripMargin) { (spark, dir) =>
    val sessions = sessionsOf(spark, dir)
    // ONE sessionize pass: each session emits its two sweep boundaries via
    // explode — the previous self-union re-ran the sessionize window once
    // per leg. The boundary frame is pinned before the range exchange so
    // the range-partitioner's SAMPLING job reads materialized rows instead
    // of re-running the sessionize upstream a further time; its blocks are
    // evicted as soon as the cum table materializes.
    val (b, trackedB) = graft.core.Pinned.withTrackedRdds(spark) {
      sessions.select(
          explode(array(
            struct(col("session_start").as("ts"), lit(0).as("bound"),
              lit(1L).as("delta")),
            struct(col("session_end").as("ts"), lit(1).as("bound"),
              lit(-1L).as("delta")))).as("e"),
          col("user_id"), col("session_seq"))
        .select(col("e.ts").as("ts"), col("e.bound").as("bound"),
          col("e.delta").as("delta"), col("user_id"), col("session_seq"))
        .localCheckpoint()
    }
    val cum = Ranking
      .globalRunningSumBy(b, Seq("ts", "bound", "user_id", "session_seq"), "delta", "cum")
      .select(col("ts"), col("cum"))
      .localCheckpoint()
    graft.core.Pinned.unpersistRdds(spark, trackedB)
    val stats = cum.agg(
      max(col("cum")).as("peak_concurrency"),
      (count(lit(1)) / 2).cast("long").as("n_sessions"))
    cum.crossJoin(broadcast(stats))
      .filter(col("cum") === col("peak_concurrency"))
      .groupBy(col("peak_concurrency"), col("n_sessions"))
      .agg(min(col("ts")).as("peak_ts"))
      .select(col("peak_concurrency"), col("peak_ts"), col("n_sessions"))
  }

  /** The gap-sessionized (user_id, session_seq, session_start, session_end,
    * n_events) frame — shared by [[sessionizeEvents]] and the sweep-line
    * [[peakConcurrency]].
    */
  private def sessionsOf(
      spark: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val prevTs = lag(col("ts"), 1).over(w)
    val isNew = when(
      prevTs.isNull || (unix_micros(col("ts")) - unix_micros(prevTs)) > 1800000000L,
      lit(1)).otherwise(lit(0))
    Tables.events(spark, dir)
      .withColumn("is_new", isNew)
      .withColumn(
        "session_seq",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** Built-in `session_window` (gap-merge sessionization as a native grouping
    * construct; same 30-min gap as `sessionize_events`). The oracle derives
    * identical sessions with the lag/cumsum formulation — a cross-check that
    * Spark's session merge and the manual window algebra agree exactly.
    * session end = max(ts) + gap by definition.
    */
  val sessionWindowAgg: QueryDef = QueryDef(
    "session_window_agg",
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR (epoch_us(ts) - epoch_us(lag(ts) OVER w)) > 1800000000
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |numbered AS (
      |  SELECT user_id, ts,
      |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                      ROWS UNBOUNDED PRECEDING) AS session_seq
      |  FROM flagged)
      |SELECT user_id,
      |  min(ts) AS session_start,
      |  max(ts) + INTERVAL 30 MINUTE AS session_end,
      |  CAST(count(*) AS BIGINT) AS n_events
      |FROM numbered
      |GROUP BY user_id, session_seq""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
  }

  /** As-of (backward) join — an operator Spark lacks natively, composed per
    * the preference order (a): tag both streams, union, and carry the last
    * right-side value forward with `last(..., ignoreNulls) over (rows
    * unbounded preceding..current)`; one shuffle on the key, no range
    * explosion. Each 'click' gets the value of the user's most recent
    * 'purchase' at-or-before it. The oracle uses DuckDB's *native* ASOF JOIN
    * — two independent mechanisms, same semantics.
    *
    * The right side is pre-deduped to one row per (user_id, ts) (max
    * event_id) so at-or-before is unambiguous in both engines.
    */
  val asofJoin: QueryDef = QueryDef(
    "asof_join_purchase",
    """WITH purchases AS (
      |  SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS purchase_cents
      |  FROM events e
      |  WHERE event_type = 'purchase'
      |    AND event_id = (SELECT max(e2.event_id) FROM events e2
      |                    WHERE e2.event_type = 'purchase'
      |                      AND e2.user_id = e.user_id AND e2.ts = e.ts)),
      |clicks AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
      |SELECT c.event_id, c.user_id, c.ts, p.purchase_cents AS last_purchase_cents
      |FROM clicks c
      |ASOF LEFT JOIN purchases p
      |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    val wDedup = Window.partitionBy(col("user_id"), col("ts")).orderBy(col("event_id").desc)
    val purchases = ev.filter(col("event_type") === "purchase")
      .withColumn("rn", row_number().over(wDedup)).filter(col("rn") === 1)
      .select(
        col("user_id"), col("ts"),
        Num.cents(col("value")).as("purchase_cents"),
        lit(1).as("is_right"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), lit(0).as("is_right"))
    val unioned = purchases
      .select(col("user_id"), col("ts"), col("is_right"),
        lit(null).cast("bigint").as("event_id"), col("purchase_cents"))
      .unionByName(clicks.select(col("user_id"), col("ts"), col("is_right"),
        col("event_id"), lit(null).cast("bigint").as("purchase_cents")))
    // at equal ts the purchase (is_right=1) sorts first => "at or before"
    val wCarry = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("last_purchase_cents", last(col("purchase_cents"), ignoreNulls = true).over(wCarry))
      .filter(col("is_right") === 0)
      .select(col("event_id"), col("user_id"), col("ts"), col("last_purchase_cents"))
  }

  /** MapType surface: parse the JSON props into `map<string,bigint>`,
    * explode to (key, value) rows, aggregate per key. (The corpus's props
    * happen to carry a single key; the operator is key-generic.)
    */
  val jsonMapExplode: QueryDef = QueryDef(
    "json_map_explode",
    """SELECT k.key AS prop_key,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(json_extract_string(e.props, '$.' || k.key) AS BIGINT)) AS BIGINT) AS total
      |FROM events e,
      |     (SELECT DISTINCT key FROM
      |        (SELECT UNNEST(json_keys(props)) AS key FROM events)) k
      |WHERE json_extract_string(e.props, '$.' || k.key) IS NOT NULL
      |GROUP BY 1""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .select(explode(from_json(
        col("props"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.LongType))).as(Seq("prop_key", "v")))
      .filter(col("v").isNotNull)
      .groupBy(col("prop_key"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
  }

  /** Cohort retention: users grouped by first-activity month, counted per
    * months-since-cohort offset. Offsets are integer date-part arithmetic —
    * identical in any engine.
    */
  val cohortRetention: QueryDef = QueryDef(
    "cohort_retention",
    """WITH activity AS (
      |  SELECT user_id, CAST(date_trunc('month', ts) AS DATE) AS m
      |  FROM events GROUP BY 1, 2),
      |cohorts AS (
      |  SELECT user_id, min(m) AS cohort_month FROM activity GROUP BY 1)
      |SELECT c.cohort_month,
      |  CAST((EXTRACT(year FROM a.m) - EXTRACT(year FROM c.cohort_month)) * 12
      |       + (EXTRACT(month FROM a.m) - EXTRACT(month FROM c.cohort_month)) AS INTEGER) AS offset_months,
      |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
      |FROM activity a JOIN cohorts c ON a.user_id = c.user_id
      |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
    val activity = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("month", col("ts")).cast("date").as("m"))
      .distinct()
    val cohorts = activity.groupBy(col("user_id")).agg(min(col("m")).as("cohort_month"))
    activity.join(cohorts, Seq("user_id"))
      .groupBy(
        col("cohort_month"),
        ((year(col("m")) - year(col("cohort_month"))) * 12 +
          (month(col("m")) - month(col("cohort_month")))).cast("int").as("offset_months"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Ordered funnel: signup -> first later click -> first later purchase,
    * per user; output is the per-stage user count (strictly ordered by
    * timestamp, not mere event presence).
    */
  val funnelStages: QueryDef = QueryDef(
    "funnel_stages",
    """WITH s1 AS (
      |  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (
      |  SELECT e.user_id, min(e.ts) AS t2
      |  FROM events e JOIN s1 ON s1.user_id = e.user_id
      |  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
      |s3 AS (
      |  SELECT e.user_id, min(e.ts) AS t3
      |  FROM events e JOIN s2 ON s2.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
      |SELECT CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_signup,
      |       CAST((SELECT count(*) FROM s2) AS BIGINT) AS n_click_after,
      |       CAST((SELECT count(*) FROM s3) AS BIGINT) AS n_purchase_after""".stripMargin) {
    (spark, dir) =>
      // One shuffle on user_id: each stage's first-reach time is a windowed
      // conditional min over the previous stage's column (same partitioning,
      // so the three window projections share a single exchange). The
      // staged-join formulation re-shuffles events three times.
      val w = Window.partitionBy(col("user_id"))
      val staged = Tables.events(spark, dir)
        .withColumn("t1", min(when(col("event_type") === "signup", col("ts"))).over(w))
        .withColumn("t2",
          min(when(col("event_type") === "click" && col("ts") > col("t1"), col("ts"))).over(w))
        .withColumn("t3",
          min(when(col("event_type") === "purchase" && col("ts") > col("t2"), col("ts"))).over(w))
      staged.agg(
        countDistinct(when(col("t1").isNotNull, col("user_id"))).as("n_signup"),
        countDistinct(when(col("t2").isNotNull, col("user_id"))).as("n_click_after"),
        countDistinct(when(col("t3").isNotNull, col("user_id"))).as("n_purchase_after"))
  }

  /** SCD2-style history: each (user, event) becomes a validity interval
    * `[ts, next ts)` via `lead`, the open current row marked null — the
    * slowly-changing-dimension shape a changelog compacts into.
    */
  val scd2History: QueryDef = QueryDef(
    "scd2_history",
    """SELECT user_id, event_type, ts AS valid_from,
      |       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
      |       CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS BOOLEAN) AS is_current
      |FROM events""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(
        col("user_id"), col("event_type"), col("ts").as("valid_from"),
        lead(col("ts"), 1).over(w).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Shared SQL CTEs of the native as-of gate family — the same-(user, ts)
    * purchase dedup (max event_id survives) and the click probe side. ONE
    * definition so the three oracles (backward / forward / tolerance) ask
    * the identical question of identical inputs.
    */
  private val asofOracleCtes: String =
    """purchases AS (
      |  SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS purchase_cents
      |  FROM events e
      |  WHERE event_type = 'purchase'
      |    AND event_id = (SELECT max(e2.event_id) FROM events e2
      |                    WHERE e2.event_type = 'purchase'
      |                      AND e2.user_id = e.user_id AND e2.ts = e.ts)),
      |clicks AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')""".stripMargin

  /** Engine side of the same derivation pair, shared by the three native
    * as-of queries: (clicks, purchases-deduped). Same-(user, ts) dedup via
    * lead over a user_id-only window: the row is the survivor (max
    * event_id) iff the next row in (ts, event_id) order has a different
    * ts. Partitioning by user_id alone lets this window, its sort, and the
    * as-of join itself share ONE exchange — the (user_id, ts)-partitioned
    * row_number form would force a second.
    */
  private def asofSides(ev: DataFrame): (DataFrame, DataFrame) = {
    val wLead = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .withColumn("next_ts", lead(col("ts"), 1).over(wLead))
      .filter(col("next_ts").isNull || col("next_ts") =!= col("ts"))
      .select(
        col("user_id").as("p_user_id"), col("ts").as("p_ts"),
        Num.cents(col("value")).as("purchase_cents"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    (clicks, purchases)
  }

  /** The same as-of semantics through the engine's *native* operator
    * ([[graft.plans.AsofJoinNative]]: custom logical plan + strategy +
    * streaming sorted-merge exec) — three independent mechanisms now answer
    * this query identically: the composed window form above, this physical
    * operator, and DuckDB's built-in ASOF JOIN as the oracle.
    */
  val asofJoinNative: QueryDef = QueryDef(
    "asof_join_native",
    s"""WITH $asofOracleCtes
      |SELECT c.event_id, c.user_id, c.ts, p.purchase_cents AS last_purchase_cents
      |FROM clicks c
      |ASOF LEFT JOIN purchases p
      |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin) { (spark, dir) =>
    val (clicks, purchases) = asofSides(Tables.events(spark, dir))
    graft.plans.AsofJoinNative.asof(
      clicks, purchases, Seq("user_id" -> "p_user_id"), "ts", "p_ts")
      .select(col("event_id"), col("user_id"), col("ts"), col("purchase_cents").as("last_purchase_cents"))
  }

  /** Forward as-of through the native operator: each click paired with the
    * user's EARLIEST purchase at-or-after it (the "time to next conversion"
    * join). Same physical shape as the backward form — one exchange per
    * side, streaming merge with one retained right row — with the scan
    * direction flipped; DuckDB's native forward ASOF (`l.ts <= r.ts`) is
    * the oracle.
    */
  val asofJoinForward: QueryDef = QueryDef(
    "asof_join_forward",
    s"""WITH $asofOracleCtes
      |SELECT c.event_id, c.user_id, c.ts, p.purchase_cents AS next_purchase_cents
      |FROM clicks c
      |ASOF LEFT JOIN purchases p
      |  ON c.user_id = p.user_id AND c.ts <= p.ts""".stripMargin) { (spark, dir) =>
    val (clicks, purchases) = asofSides(Tables.events(spark, dir))
    graft.plans.AsofJoinNative.asof(
      clicks, purchases, Seq("user_id" -> "p_user_id"), "ts", "p_ts",
      direction = "forward")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("purchase_cents").as("next_purchase_cents"))
  }

  /** Backward as-of with a 1-hour tolerance: the purchase must be at-or-
    * before the click AND within the last hour, else nulls (pandas
    * `merge_asof(tolerance=...)`). The oracle composes plain ASOF with a
    * window gate — sound because the latest-at-or-before row is the ONLY
    * possible within-window match (any other candidate is even earlier).
    */
  val asofJoinTolerance: QueryDef = QueryDef(
    "asof_join_tolerance",
    s"""WITH $asofOracleCtes
      |SELECT c.event_id, c.user_id, c.ts,
      |  CASE WHEN p.ts >= c.ts - INTERVAL 1 HOUR
      |       THEN p.purchase_cents END AS recent_purchase_cents
      |FROM clicks c
      |ASOF LEFT JOIN purchases p
      |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin) { (spark, dir) =>
    val (clicks, purchases) = asofSides(Tables.events(spark, dir))
    graft.plans.AsofJoinNative.asof(
      clicks, purchases, Seq("user_id" -> "p_user_id"), "ts", "p_ts",
      tolerance = Some(3600L * 1000000L)) // 1 hour in timestamp micros
      .select(col("event_id"), col("user_id"), col("ts"),
        col("purchase_cents").as("recent_purchase_cents"))
  }

  /** Incremental upsert (latest-wins merge): a stored snapshot (events
    * before the cutoff) merged with an incoming batch (events at/after it),
    * keeping each user's latest state — the weekly-refresh production
    * pattern. The engine takes the two-source union+window merge path; the
    * oracle computes the same snapshot directly from the full table, so the
    * match proves the incremental path converges to the from-scratch
    * answer.
    */
  val upsertLatestSnapshot: QueryDef = QueryDef(
    "upsert_latest_snapshot",
    """SELECT user_id, event_id AS last_event_id, ts AS last_ts,
      |       event_type AS last_type
      |FROM (
      |  SELECT user_id, event_id, ts, event_type,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |WHERE rn = 1""".stripMargin) { (spark, dir) =>
    val cutoff = lit("2024-01-16 00:00:00").cast("timestamp")
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
    val snapshot = ev.filter(col("ts") < cutoff) // the stored state
    val batch = ev.filter(col("ts") >= cutoff) // the incoming increment
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    snapshot.unionByName(batch)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("user_id"), col("event_id").as("last_event_id"),
        col("ts").as("last_ts"), col("event_type").as("last_type"))
  }

  /** Hopping (sliding) windows: 1-hour windows every 30 minutes — each
    * event lands in exactly duration/slide = 2 windows. Spark's `window()`
    * with a slide plans this as a generate(2 rows)+aggregate, no shuffle
    * beyond the group-by; the oracle derives the same two epoch-aligned
    * window starts per event (`time_bucket` and one slide back) and unions
    * them — two independent constructions of the same window algebra.
    */
  val eventsHopping: QueryDef = QueryDef(
    "events_hopping",
    """WITH b AS (
      |  SELECT time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP)) AS b30, event_type
      |  FROM events),
      |w AS (
      |  SELECT b30 AS win_start, event_type FROM b
      |  UNION ALL
      |  SELECT b30 - INTERVAL 30 MINUTE AS win_start, event_type FROM b)
      |SELECT win_start, event_type, CAST(count(*) AS BIGINT) AS n_events
      |FROM w GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n_events"))
  }

  /** Per-user event-type transition counts (the first-order Markov view of
    * user journeys): each consecutive (event, next-event) pair within a
    * user's timeline, counted corpus-wide. One exchange: the `lead` window
    * partitions on `user_id` and the final pair count is a partial-first
    * aggregate; the deterministic (ts, event_id) order makes ties
    * oracle-stable.
    */
  val eventTransitions: QueryDef = QueryDef(
    "event_transitions",
    """SELECT event_type AS from_type, next_type AS to_type,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM (
      |  SELECT event_type,
      |         lead(event_type) OVER (PARTITION BY user_id
      |                                ORDER BY ts, event_id) AS next_type
      |  FROM events)
      |WHERE next_type IS NOT NULL
      |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** First-order Markov transition PROBABILITIES — `event_transitions`
    * normalized into the row-stochastic matrix P(to | from) that journey
    * models and next-action predictors consume. The row totals come from a
    * second aggregate over the (|types|², here ≤ 25-row) transition table
    * itself — never a rescan of the fact table — broadcast back for a
    * row-local exact-integer ratio. The matrix side is constant-size at any
    * event volume; only the windowed pair extraction scales with data, and
    * it shuffles once on user_id.
    */
  val markovTransitions: QueryDef = QueryDef(
    "markov_transitions",
    """WITH t AS (
      |  SELECT event_type AS from_type, next_type AS to_type,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM (
      |    SELECT event_type,
      |           lead(event_type) OVER (PARTITION BY user_id
      |                                  ORDER BY ts, event_id) AS next_type
      |    FROM events)
      |  WHERE next_type IS NOT NULL
      |  GROUP BY 1, 2),
      |tot AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS row_total FROM t GROUP BY 1)
      |SELECT t.from_type, t.to_type, t.n, tot.row_total,
      |  CAST(t.n AS DOUBLE) / CAST(tot.row_total AS DOUBLE) AS p
      |FROM t JOIN tot ON tot.from_type = t.from_type""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // t feeds both the totals and the output join; pin the ≤|types|²-row
    // matrix so the windowed pair extraction over the fact table runs once
    val t = Tables.events(spark, dir)
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val tot = t.groupBy(col("from_type")).agg(sum(col("n")).as("row_total"))
    t.join(broadcast(tot), "from_type")
      .select(
        col("from_type"), col("to_type"), col("n"), col("row_total"),
        Num.ratio(col("n"), col("row_total")).as("p"))
  }

  /** Hourly active users — the DISTINCT aggregate inside time buckets
    * (`events_hourly` counts events per type; this deduplicates the actor).
    * Catalyst plans count(DISTINCT) with the two-phase Expand/partial form,
    * so the per-hour user sets never concentrate on one node: the shuffle
    * key is (hour, user) in the partial phase, then (hour) — the standard
    * scalable DAU/HAU shape (an exact distinct; the approximate dual at
    * extreme cardinality is `agg_approx_distinct`'s HLL).
    */
  val eventsHourlyUsers: QueryDef = QueryDef(
    "events_hourly_users",
    """SELECT date_trunc('hour', ts) AS hour_start,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM events
      |GROUP BY 1""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
  }

  /** Chi-square contingency cells: observed vs expected counts for
    * event_type × user-cohort, with each cell's χ² contribution — the
    * independence test behind cohort-behavior analysis, emitted PER CELL
    * because the total χ² is a sum of doubles whose order an engine is free
    * to choose (per-cell values are fixed-order arithmetic on exact integer
    * counts, hence bit-stable; a consumer folds them in any order it
    * documents). Three aggregates over the |types|×|cohorts| contingency
    * table itself — the fact table is scanned once for the cell counts and
    * the margins derive from those (broadcast back, constant-size at any
    * event volume).
    */
  val contingencyCells: QueryDef = QueryDef(
    "contingency_cells",
    """WITH cells AS (
      |  SELECT event_type, user_id % 4 AS cohort, CAST(count(*) AS BIGINT) AS o
      |  FROM events GROUP BY 1, 2),
      |rt AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS row_n FROM cells GROUP BY 1),
      |ct AS (SELECT cohort, CAST(SUM(o) AS BIGINT) AS col_n FROM cells GROUP BY 1),
      |tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells)
      |SELECT c.event_type, c.cohort, c.o,
      |  CAST(rt.row_n * ct.col_n AS DOUBLE) / CAST(tot.n AS DOUBLE) AS expected,
      |  (CAST(c.o AS DOUBLE) - CAST(rt.row_n * ct.col_n AS DOUBLE) / CAST(tot.n AS DOUBLE))
      |    * (CAST(c.o AS DOUBLE) - CAST(rt.row_n * ct.col_n AS DOUBLE) / CAST(tot.n AS DOUBLE))
      |    / (CAST(rt.row_n * ct.col_n AS DOUBLE) / CAST(tot.n AS DOUBLE)) AS chi2_cell
      |FROM cells c
      |JOIN rt ON rt.event_type = c.event_type
      |JOIN ct ON ct.cohort = c.cohort
      |CROSS JOIN tot""".stripMargin) { (spark, dir) =>
    // The cell table is referenced four times (margins, total, output);
    // Spark re-executes each DataFrame reference, so without pinning it the
    // fact table would be scanned four times. localCheckpoint materializes
    // the constant-size (|types|·|cohorts|-row) table once — one fact scan.
    val cells = Tables.events(spark, dir)
      .groupBy(col("event_type"), (col("user_id") % 4).as("cohort"))
      .agg(count(lit(1)).as("o"))
      .localCheckpoint()
    val rowTotals = cells.groupBy(col("event_type")).agg(sum(col("o")).as("row_n"))
    val colTotals = cells.groupBy(col("cohort")).agg(sum(col("o")).as("col_n"))
    val total = cells.agg(sum(col("o")).as("n"))
    val expected = (col("row_n") * col("col_n")).cast("double") / col("n").cast("double")
    cells
      .join(broadcast(rowTotals), "event_type")
      .join(broadcast(colTotals), "cohort")
      .crossJoin(broadcast(total))
      .select(
        col("event_type"), col("cohort"), col("o"),
        expected.as("expected"),
        ((col("o").cast("double") - expected) * (col("o").cast("double") - expected) / expected)
          .as("chi2_cell"))
  }

  /** Per-group z-score outlier counting — the data-cleaning gate every
    * ingest needs ("how many events sit 3σ from their type's mean?").
    * Group moments come from exact integer-cents sums (DECIMAL(38,0)
    * accumulators, the `agg_variance_exact` pattern) so mean/std are the
    * same IEEE doubles in any engine (sqrt is correctly-rounded per
    * IEEE-754, hence bit-stable); the tiny per-type stats broadcast back
    * and the 3σ test is a row-local comparison — no window over the fact
    * table, two scans of it (stats + test) sharing one exchange shape.
    */
  val outlierZscore: QueryDef = QueryDef(
    "outlier_zscore",
    """WITH c AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE value IS NOT NULL),
      |st AS (
      |  SELECT event_type,
      |    CAST(count(*) AS BIGINT) AS n_events,
      |    CAST(SUM(CAST(cents AS DECIMAL(38, 0))) AS DOUBLE)
      |      / CAST(count(*) AS DOUBLE) AS mean_cents,
      |    sqrt((CAST(SUM(CAST(cents * cents AS DECIMAL(38, 0))) AS DOUBLE)
      |        - (CAST(SUM(CAST(cents AS DECIMAL(38, 0))) AS DOUBLE)
      |           * CAST(SUM(CAST(cents AS DECIMAL(38, 0))) AS DOUBLE))
      |          / CAST(count(*) AS DOUBLE))
      |       / (CAST(count(*) AS DOUBLE) - 1.0)) AS std_cents
      |  FROM c GROUP BY event_type)
      |SELECT c.event_type, st.n_events, st.mean_cents, st.std_cents,
      |  CAST(count(*) FILTER (
      |    WHERE abs(CAST(c.cents AS DOUBLE) - st.mean_cents)
      |          > 3.0 * st.std_cents) AS BIGINT) AS n_outliers
      |FROM c JOIN st ON st.event_type = c.event_type
      |GROUP BY 1, 2, 3, 4""".stripMargin) { (spark, dir) =>
    val c = Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), Num.cents(col("value")).as("cents"))
    val st = c.groupBy(col("event_type"))
      .agg(
        sum(expr("CAST(cents * cents AS DECIMAL(38, 0))")).as("ssq"),
        sum(expr("CAST(cents AS DECIMAL(38, 0))")).as("s"),
        count(lit(1)).as("n_events"))
      .select(
        col("event_type"), col("n_events"),
        (col("s").cast("double") / col("n_events").cast("double")).as("mean_cents"),
        sqrt(
          (col("ssq").cast("double") -
            (col("s").cast("double") * col("s").cast("double"))
              / col("n_events").cast("double"))
            / (col("n_events").cast("double") - lit(1.0))).as("std_cents"))
    c.join(broadcast(st), "event_type")
      .groupBy(col("event_type"), col("n_events"), col("mean_cents"), col("std_cents"))
      .agg(
        sum(
          when(abs(col("cents").cast("double") - col("mean_cents"))
            > lit(3.0) * col("std_cents"), 1L).otherwise(0L)).as("n_outliers"))
  }

  /** Session-scoped PATH MINING: every 3-step event-type journey that
    * occurs inside one 30-minute-gap session, with its frequency — the
    * sequence-pattern step past [[eventTransitions]]' first-order pairs
    * (PrefixSpan's length-3 specialization, enumerable exactly because
    * consecutive-step journeys per session are linear in events, not
    * combinatorial). ONE user-keyed exchange carries everything: the gap
    * flags, the running session number, and the two leads all run on
    * windows whose partition keys start with user_id (HashPartitioning
    * (user) satisfies the (user, session) clustering — the second window
    * adds only a local sort), and the trigram rollup is map-side combined
    * over a type³-bounded key space.
    */
  val journeyTrigrams: QueryDef = QueryDef(
    "journey_trigrams",
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR (epoch_us(ts) - epoch_us(lag(ts) OVER w)) > 1800000000
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |numbered AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                      ROWS UNBOUNDED PRECEDING) AS session_seq
      |  FROM flagged),
      |steps AS (
      |  SELECT event_type AS t1,
      |    lead(event_type, 1) OVER s AS t2,
      |    lead(event_type, 2) OVER s AS t3
      |  FROM numbered
      |  WINDOW s AS (PARTITION BY user_id, session_seq ORDER BY ts, event_id))
      |SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
      |FROM steps WHERE t3 IS NOT NULL
      |GROUP BY 1, 2, 3""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val prevTs = lag(col("ts"), 1).over(w)
    val isNew = when(
      prevTs.isNull || (unix_micros(col("ts")) - unix_micros(prevTs)) > 1800000000L,
      lit(1)).otherwise(lit(0))
    val s = Window.partitionBy(col("user_id"), col("session_seq"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("is_new", isNew)
      .withColumn(
        "session_seq",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(
        col("event_type").as("t1"),
        lead(col("event_type"), 1).over(s).as("t2"),
        lead(col("event_type"), 2).over(s).as("t3"))
      .filter(col("t3").isNotNull)
      .groupBy(col("t1"), col("t2"), col("t3"))
      .agg(count(lit(1)).as("n"))
  }

  val all: Seq[QueryDef] = Seq(
    jsonExtractAgg, eventsHourly, sessionizeEvents, sessionWindowAgg, asofJoin,
    asofJoinNative, asofJoinForward, asofJoinTolerance, jsonMapExplode,
    cohortRetention, funnelStages, scd2History,
    upsertLatestSnapshot, eventTransitions, markovTransitions, eventsHopping, outlierZscore,
    contingencyCells, eventsHourlyUsers, peakConcurrency, journeyTrigrams)
}
