package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, Trigger, ValueState}
import org.apache.spark.sql.types._

/** Structured Streaming surface: file-source stream over the events table,
  * watermarked tumbling-window aggregation, and custom per-key state via
  * `mapGroupsWithState` (running per-user counters).
  *
  * The reference is batch-only (SURVEY.md §2.10) — this is the category's
  * streaming extension. The batch dual of `hourlyCounts` is
  * `graft.ops.Events.eventsHourly`, which the driver oracle-checks; the
  * streaming jobs are asserted by ScalaTest with `Trigger.AvailableNow` /
  * memory sinks.
  */
object Streams {

  /** Isolated session for the gate's streaming runs. Streaming state is
    * partitioned by `spark.sql.shuffle.partitions` *at query start*, and
    * every trigger commits every state store — so the right partition count
    * follows the STATE size (thousands of window keys here), not the batch
    * shuffle default. A child session scopes that setting (and the memory
    * sink's temp view) to the one query without touching the caller's conf.
    * The count is derived, not pinned: [[statePartitions]] over the input
    * footprint, floored at 4 (measured ~10% faster than 8 at gate scale —
    * every trigger commits every store, so fewer stores = less per-batch
    * commit IO) and capped at the parent's configured parallelism. At
    * 100 TB the byte term dominates and the family runs cluster-wide.
    */
  private def gateSession(spark: SparkSession, dir: String,
      tables: String*): SparkSession = {
    val s = spark.newSession()
    val srcs = if (tables.isEmpty) Seq("events") else tables.toSeq
    s.conf.set("spark.sql.shuffle.partitions",
      statePartitions(spark, dir, srcs, floor = 4).toString)
    s
  }

  /** Scale-adaptive streaming state parallelism: one state store per
    * shuffle partition is created at query start and committed EVERY
    * trigger, so the count must follow the state volume — estimated here
    * from the source tables' on-disk footprint at one partition per
    * [[stateBytesPerPartition]] — floored at the measured gate-scale
    * optimum and capped at the parent session's configured parallelism
    * (`SPARK_GRAFT_CPUS` in the bench contract, cluster-sized in
    * production). A fixed constant here capped the whole streaming family
    * at that constant's parallelism regardless of core count or data size.
    */
  private[graft] def statePartitions(spark: SparkSession, dir: String,
      tables: Seq[String], floor: Int): Int = {
    val parent = spark.sessionState.conf.numShufflePartitions
    def sizeOf(f: java.io.File): Long =
      if (f.isDirectory)
        Option(f.listFiles()).map(_.map(sizeOf).sum).getOrElse(0L)
      else if (f.isFile) f.length()
      else 0L
    val bytes = tables.map { t =>
      val d = new java.io.File(dir)
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith(t + ".parquet")).map(sizeOf).sum
    }.sum
    val byData = (bytes / stateBytesPerPartition).toInt
    math.min(parent, math.max(floor, byData))
  }

  /** Input bytes per streaming state partition (64 MB): state keys are a
    * bounded projection of the input, so its footprint is the available
    * upper-bound proxy; one store per ~64 MB of source keeps per-trigger
    * commit counts proportional to data, not to a constant.
    */
  private val stateBytesPerPartition: Long = 64L * 1024 * 1024

  /** Streaming read of the events parquet (file source; at scale this would
    * be a Kafka/queue source — the transform graph below is source-agnostic).
    *
    * File streams need an explicit schema (no inference mid-stream), and that
    * schema must match whatever physical timestamp encoding the upstream
    * writer chose THIS generation — so it is probed from the batch footers
    * (`Tables.rawSchema`, a footer-only read) rather than hardcoded, and the
    * `ts` column goes through the same observed-type-guarded conversion as
    * the batch loader (`Tables.normalizeTs`). One ingest choke point: an
    * upstream encoding change is absorbed in [[graft.core.Tables]] and the
    * stream follows automatically.
    */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame =
    readTableStream(spark, dir, "events")

  /** Streaming read of ANY driver table's parquet through the same ingest
    * choke point as the batch loader.
    */
  def readTableStream(spark: SparkSession, dir: String, name: String): DataFrame = {
    // deliberately session-wide, matching Tables.load/rawSchema (the batch
    // ingest choke point sets the same flag): the engine's ingest policy is
    // that TIMESTAMP(NANOS) parquet always surfaces as LongType and is
    // normalized in normalizeTs — not an error. Callers who must not
    // inherit the policy pass a child session (gateSession does).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.readStream
      .schema(graft.core.Tables.rawSchema(spark, dir, name))
      // single-batch contract: the append-mode oracles state the emitted set
      // relationally as "windows closed by the final watermark", which holds
      // only if AvailableNow delivers the whole directory in ONE batch — an
      // intermediate watermark after a partial batch could drop late rows.
      // The default maxFilesPerTrigger (1000) would split larger corpora, so
      // pin it far above any testdata file count.
      .option("maxFilesPerTrigger", 1000000)
      // a glob (not a bare file path) so the stream source resolves its
      // basePath to the directory — FileStreamSource rejects file basePaths
      .parquet(s"$dir/$name.parquet*")
    graft.core.Tables.normalizeTs(raw, graft.core.Tables.tsColsOf(name))
  }

  /** Watermarked tumbling 1-hour aggregation — the streaming form of the
    * oracle-checked batch query `events_hourly`. Late events beyond 2 hours
    * are dropped; state is bounded by the watermark.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("hour_start"), col("event_type"), col("n_events"))

  final case class UserRunningState(nEvents: Long, totalValueCents: Long)
  final case class UserSnapshot(user_id: Long, n_events: Long, total_value_cents: Long)

  /** Custom streaming state: per-user running event count + exact cents total
    * via `mapGroupsWithState` (processing-time timeout-free accumulation).
    */
  def userRunningTotals(spark: SparkSession, events: DataFrame): Dataset[UserSnapshot] = {
    import spark.implicits._
    events
      .select(
        col("user_id"),
        coalesce(graft.core.Num.cents(col("value")), lit(0L)).as("cents"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserRunningState, UserSnapshot](GroupStateTimeout.NoTimeout) {
        case (userId, rows, state: GroupState[UserRunningState]) =>
          val prev = state.getOption.getOrElse(UserRunningState(0L, 0L))
          val (n, cents) = rows.foldLeft((prev.nEvents, prev.totalValueCents)) {
            case ((cn, cc), (_, rowCents)) => (cn + 1L, cc + rowCents)
          }
          state.update(UserRunningState(n, cents))
          UserSnapshot(userId, n, cents)
      }
  }

  final case class TypeCounts(counts: Map[String, Long])
  final case class TypeCountRow(user_id: Long, event_type: String, n: Long)

  /** Multi-row stateful emission via `flatMapGroupsWithState`: per-user
    * per-event-type running counts — each trigger emits one row per event
    * type seen so far (the API's distinguishing feature vs mapGroups: 0..n
    * output rows per group per batch).
    */
  def userTypeCounts(spark: SparkSession, events: DataFrame): Dataset[TypeCountRow] = {
    import spark.implicits._
    events
      .select(col("user_id"), col("event_type"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[TypeCounts, TypeCountRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (userId, rows, state: GroupState[TypeCounts]) =>
          val prev = state.getOption.getOrElse(TypeCounts(Map.empty))
          val next = rows.foldLeft(prev.counts) { case (m, (_, t)) =>
            m.updated(t, m.getOrElse(t, 0L) + 1L)
          }
          state.update(TypeCounts(next))
          next.iterator.map { case (t, n) => TypeCountRow(userId, t, n) }
      }
  }

  /** Structured Streaming inside the driver correctness gate: the hourly
    * aggregation in Complete output mode over an AvailableNow run of the
    * whole events file — the memory sink then holds exactly the batch
    * result, which the DuckDB oracle recomputes relationally. (The
    * watermarked Append variant lives in `hourlyCounts` and is asserted by
    * ScalaTest; Complete mode is the form whose final table is
    * batch-equivalent by construction.)
    */
  val streamingHourly: graft.core.QueryDef = graft.core.QueryDef(
    "streaming_hourly_complete",
    """SELECT date_trunc('hour', ts) AS hour_start, event_type,
      |  CAST(count(*) AS BIGINT) AS n_events
      |FROM events
      |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
    val sess = gateSession(spark, dir)
    val streamed = readEventsStream(sess, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("hour_start"), col("event_type"), col("n_events"))
    val table = s"graft_streaming_hourly_${System.nanoTime()}"
    runAvailableNowToMemory(sess, streamed, table, OutputMode.Complete())
  }

  /** The production-shaped streaming path inside the correctness gate:
    * [[hourlyCounts]] — Append output mode with a 2-hour watermark — run
    * AvailableNow over the events file. Append emits a window exactly once,
    * when the watermark passes its end, so state AND sink stay bounded by
    * the watermark (unlike Complete mode, which re-emits and retains the
    * full result every trigger — fine as a batch-equivalence device, wrong
    * as a production shape). The final no-data micro-batch advances the
    * watermark to max(ts) - 2h and flushes every closed window.
    *
    * Closed windows are a deterministic function of the data (watermark =
    * max event time - delay), so the DuckDB oracle reproduces the emitted
    * set relationally with a cutoff predicate: windows whose end is
    * at-or-before the final watermark.
    */
  val streamingHourlyAppend: graft.core.QueryDef = graft.core.QueryDef(
    "streaming_hourly_append",
    """WITH cutoff AS (SELECT max(ts) - INTERVAL 2 HOUR AS wm FROM events)
      |SELECT date_trunc('hour', ts) AS hour_start, event_type,
      |  CAST(count(*) AS BIGINT) AS n_events
      |FROM events, cutoff
      |WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= wm
      |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
    val sess = gateSession(spark, dir)
    val streamed = hourlyCounts(readEventsStream(sess, dir))
    val table = s"graft_streaming_append_${System.nanoTime()}"
    runAvailableNowToMemory(sess, streamed, table, OutputMode.Append())
  }

  /** Streaming exact dedup via `dropDuplicatesWithinWatermark` — the
    * at-least-once delivery repair every streaming ingest needs: duplicate
    * event_ids arriving within the watermark window are dropped, and the
    * dedup state (one entry per key) expires with the watermark, so state
    * is bounded by delivery skew, not stream length. The gate runs it over
    * a deliberately DOUBLED stream (the same file source unioned with
    * itself — a deterministic at-least-once simulation): every event
    * arrives at least twice, the output must be the original row set, which
    * is exactly what the DuckDB oracle states relationally. Copies are
    * byte-identical, so the surviving row is deterministic regardless of
    * arrival order.
    */
  val streamingDedupExact: graft.core.QueryDef = graft.core.QueryDef(
    "streaming_dedup_exact",
    "SELECT event_id, ts, user_id, event_type FROM events") { (spark, dir) =>
    val sess = gateSession(spark, dir)
    // survivors emit ON ARRIVAL (first copy seen); the trailing no-data
    // micro-batch only advances the watermark to EVICT expired dedup state,
    // never to emit — skipping it drops one full state-commit round with
    // byte-identical output (same reasoning as stream_stream_join; the
    // window-append gates keep theirs, their rows emit at watermark close)
    sess.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val doubled = readEventsStream(sess, dir)
      .unionByName(readEventsStream(sess, dir))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    val deduped = doubled
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
    val table = s"graft_streaming_dedup_${System.nanoTime()}"
    runAvailableNowToMemory(sess, deduped, table, OutputMode.Append())
  }

  /** Custom streaming state inside the gate: [[userRunningTotals]]
    * (`mapGroupsWithState` running per-user counters) run AvailableNow,
    * Update mode. The memory sink accumulates one snapshot per (user,
    * batch-with-that-user's-rows); the latest snapshot per user — picked by
    * the strictly-increasing event count, the standard "upsert view of an
    * update stream" read — is the per-user total the DuckDB oracle states
    * relationally. Single-batch here, but the latest-snapshot read keeps
    * the contract correct under any micro-batch split.
    */
  val streamingUserTotals: graft.core.QueryDef = graft.core.QueryDef(
    "streaming_user_totals",
    """SELECT user_id,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(SUM(COALESCE(CAST(round(value * 100) AS BIGINT), 0)) AS BIGINT)
      |    AS total_value_cents
      |FROM events GROUP BY user_id""".stripMargin) { (spark, dir) =>
    val sess = gateSession(spark, dir)
    val snapshots = userRunningTotals(sess, readEventsStream(sess, dir)).toDF()
    val table = s"graft_streaming_user_totals_${System.nanoTime()}"
    val emitted = runAvailableNowToMemory(sess, snapshots, table, OutputMode.Update())
    val w = Window.partitionBy(col("user_id")).orderBy(col("n_events").desc)
    emitted
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("user_id"), col("n_events"), col("total_value_cents"))
  }

  /** Watermarked click/purchase stream sides + the 30-minute interval-join
    * condition — ONE definition for the three stream-stream join gates
    * (inner / left / full): the watermark delay, the cents rule, and the
    * join window must never fork between them or the three oracles stop
    * asking the same question.
    */
  private def clickPurchaseSides(sess: SparkSession, dir: String)
      : (DataFrame, DataFrame, org.apache.spark.sql.Column) = {
    val clicks = readEventsStream(sess, dir)
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = readEventsStream(sess, dir)
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id").as("p_user_id"),
        col("ts").as("purchase_ts"),
        graft.core.Num.cents(col("value")).as("purchase_cents"))
      .withWatermark("purchase_ts", "1 hour")
    val cond = col("p_user_id") === col("user_id") &&
      col("purchase_ts") >= col("click_ts") &&
      col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES")
    (clicks, purchases, cond)
  }

  /** Stream-stream interval join inside the gate: clicks joined to the same
    * user's purchases within the following 30 minutes — both sides
    * watermarked AND the join condition time-bounded in both directions,
    * which is exactly what lets Spark expire buffered state (a click older
    * than watermark + 30 min can never match a future purchase, and is
    * dropped). That bounded-state shape is the 100 TB story; an un-bounded
    * stream-stream join would buffer both streams forever.
    *
    * An INNER join's emitted set is complete once all data is processed
    * (the watermark only bounds state, it gates no output), so over an
    * AvailableNow run the result is the batch interval join — which is
    * precisely what the oracle states.
    */
  val streamStreamJoin: graft.core.QueryDef = graft.core.QueryDef(
    "stream_stream_join",
    """SELECT c.user_id, c.ts AS click_ts, p.ts AS purchase_ts,
      |  CAST(round(p.value * 100) AS BIGINT) AS purchase_cents
      |FROM events c
      |JOIN events p
      |  ON p.user_id = c.user_id
      | AND c.event_type = 'click' AND p.event_type = 'purchase'
      | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE""".stripMargin) {
    (spark, dir) =>
      val sess = gateSession(spark, dir)
      // INNER stream-stream join: every output row emits in the data batch
      // where its match lands; the trailing NO-DATA micro-batch exists only
      // to advance the watermark for state EVICTION (and, in outer joins,
      // null-extended emission) — work a finite AvailableNow inner run never
      // observes. Skipping it removes one full state-commit round (~16
      // store commits here), measured 3.1-4.0 → 1.4-1.9 s at sf0.1 with
      // byte-identical output (183 rows). The outer-join gates MUST keep
      // their no-data batch: their unmatched rows emit at eviction.
      sess.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      val (clicks, purchases, cond) = clickPurchaseSides(sess, dir)
      val joined = clicks.join(purchases, cond)
        .select(col("user_id"), col("click_ts"), col("purchase_ts"), col("purchase_cents"))
      val table = s"graft_stream_stream_join_${System.nanoTime()}"
      runAvailableNowToMemory(sess, joined, table, OutputMode.Append())
  }

  /** Stream-static enrichment join inside the gate: the streamed purchase
    * events join a STATIC per-user profile (historical click counts,
    * batch-aggregated from the same store) on user_id. This is the standard
    * "enrich the stream with a dimension/feature table" shape: the static
    * side is planned per micro-batch (broadcast while it is small, shuffled
    * hash join at scale — the stream never blocks on it), and the join is
    * STATELESS — no watermark, no state store, each arriving row emits at
    * most once, so Append mode is exact under any micro-batch split and the
    * oracle is the plain relational join.
    */
  val streamStaticJoin: graft.core.QueryDef = graft.core.QueryDef(
    "streaming_static_join",
    """SELECT p.event_id, p.user_id,
      |  CAST(round(p.value * 100) AS BIGINT) AS purchase_cents,
      |  c.n_clicks
      |FROM events p
      |JOIN (SELECT user_id, CAST(count(*) AS BIGINT) AS n_clicks
      |      FROM events WHERE event_type = 'click' GROUP BY 1) c
      |  ON c.user_id = p.user_id
      |WHERE p.event_type = 'purchase'""".stripMargin) { (spark, dir) =>
    val sess = gateSession(spark, dir)
    val clickProfile = graft.core.Tables.events(sess, dir)
      .filter(col("event_type") === "click")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_clicks"))
    val purchases = readEventsStream(sess, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        graft.core.Num.cents(col("value")).as("purchase_cents"))
    val enriched = purchases.join(clickProfile, Seq("user_id"))
      .select(col("event_id"), col("user_id"), col("purchase_cents"), col("n_clicks"))
    val table = s"graft_stream_static_join_${System.nanoTime()}"
    runAvailableNowToMemory(sess, enriched, table, OutputMode.Append())
  }

  /** Streaming session windows inside the gate: per-user 30-minute-gap
    * sessions via `session_window`, Append mode with a 2-hour watermark, run
    * AvailableNow. Session state merges adjacent events server-side and a
    * session is emitted exactly once — when the watermark passes its end
    * (last event + gap) — so state is bounded by the watermark horizon, not
    * the stream length: the production sessionization shape. AvailableNow
    * processes every row before the final no-data batch advances the
    * watermark to max(ts) − 2 h, so sessions are complete and the emitted
    * set is exactly the closed ones, which the oracle states relationally:
    * the batch lag/cumsum sessionization (same SQL as `session_window_agg`)
    * filtered to sessions ending at-or-before the final watermark.
    */
  val streamingSessionWindows: graft.core.QueryDef = graft.core.QueryDef(
    "streaming_session_windows",
    """WITH cutoff AS (SELECT max(ts) - INTERVAL 2 HOUR AS wm FROM events),
      |flagged AS (
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
      |  FROM flagged),
      |sessions AS (
      |  SELECT user_id,
      |    min(ts) AS session_start,
      |    max(ts) + INTERVAL 30 MINUTE AS session_end,
      |    CAST(count(*) AS BIGINT) AS n_events
      |  FROM numbered
      |  GROUP BY user_id, session_seq)
      |SELECT s.user_id, s.session_start, s.session_end, s.n_events
      |FROM sessions s, cutoff c
      |WHERE s.session_end <= c.wm""".stripMargin) { (spark, dir) =>
    val sess = gateSession(spark, dir)
    val streamed = readEventsStream(sess, dir)
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
    val table = s"graft_streaming_sessions_${System.nanoTime()}"
    runAvailableNowToMemory(sess, streamed, table, OutputMode.Append())
  }

  /** `flatMapGroupsWithState` inside the gate: [[userTypeCounts]] — the
    * multi-row-emission state API (0..n output rows per group per batch; a
    * per-user map of per-type counters here) run AvailableNow in Update
    * mode. Every batch that touches a user re-emits that user's full
    * per-type count map with strictly-increasing counts, so the latest
    * snapshot per (user, type) — max n — is the per-pair total the DuckDB
    * oracle states relationally. The upsert-read logic is the same as
    * `streaming_user_totals`; what this adds to the gate is the multi-row
    * state-emission API itself.
    */
  val streamingTypeCounts: graft.core.QueryDef = graft.core.QueryDef(
    "streaming_type_counts",
    """SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
      |FROM events GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
    val sess = gateSession(spark, dir)
    val snapshots = userTypeCounts(sess, readEventsStream(sess, dir)).toDF()
    val table = s"graft_streaming_type_counts_${System.nanoTime()}"
    val emitted = runAvailableNowToMemory(sess, snapshots, table, OutputMode.Update())
    val w = Window.partitionBy(col("user_id"), col("event_type")).orderBy(col("n").desc)
    emitted
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("user_id"), col("event_type"), col("n"))
  }

  /** Streaming hopping (sliding) windows inside the gate: 1-hour windows
    * every 30 minutes per event type, Append mode with a 2-hour watermark —
    * the streaming dual of the batch `events_hopping`. Each event lives in
    * exactly two overlapping windows, and Append emits a window once, when
    * the watermark passes its end, so the emitted set is the batch hopping
    * aggregation restricted to closed windows — which the oracle states with
    * the same bucket-union algebra as the batch query plus the cutoff
    * predicate. State is bounded by (watermark span / slide) × |types| keys
    * regardless of stream length.
    */
  val streamingHoppingAppend: graft.core.QueryDef = graft.core.QueryDef(
    "streaming_hopping_append",
    """WITH cutoff AS (SELECT max(ts) - INTERVAL 2 HOUR AS wm FROM events),
      |b AS (
      |  SELECT time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP)) AS b30, event_type
      |  FROM events),
      |w AS (
      |  SELECT b30 AS win_start, event_type FROM b
      |  UNION ALL
      |  SELECT b30 - INTERVAL 30 MINUTE AS win_start, event_type FROM b)
      |SELECT win_start, event_type, CAST(count(*) AS BIGINT) AS n_events
      |FROM w, cutoff
      |WHERE win_start + INTERVAL 1 HOUR <= wm
      |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
    val sess = gateSession(spark, dir)
    val streamed = readEventsStream(sess, dir)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n_events"))
    val table = s"graft_streaming_hopping_${System.nanoTime()}"
    runAvailableNowToMemory(sess, streamed, table, OutputMode.Append())
  }

  /** Production-sink idiom: `foreachBatch` gives each micro-batch to a
    * normal batch writer (idempotent by batchId) — the pattern for sinks
    * without a native streaming writer (JDBC, upserts, partitioned parquet
    * with custom layout).
    */
  def runForeachBatchParquet(
      spark: SparkSession,
      streamed: DataFrame,
      outDir: String): Unit = {
    val q = streamed.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Bucket history with per-element arrival stamps: (doc_id, arrival
    * processing-time ms). The stamps are what makes the retention horizon
    * enforceable per element, not just per bucket.
    */
  final case class BucketState(docs: List[(Long, Long)])
  final case class CandidatePair(doc_a: Long, doc_b: Long, band: Int)

  /** Default near-dup retention horizon for [[streamingLshCandidates]]: a
    * continuous-ingest corpus typically only needs to pair a new document
    * against recent history (dedup-at-ingest), and an UNBOUNDED bucket
    * history grows linearly in corpus size — the state store itself becomes
    * O(corpus) and OOMs at 100 TB. 24 h comfortably covers any single gate
    * or spec run (nothing expires mid-run, so run over a static corpus the
    * output still equals the batch candidate set) while bounding steady-
    * state memory to one day of ingest.
    */
  val lshDefaultRetention: java.time.Duration = java.time.Duration.ofHours(24)

  /** Streaming MinHash-LSH near-dup candidate generation: documents arrive
    * as a stream, signatures and band keys are computed row-locally (the
    * codegen'd `minhash_sigs` expression), and per-bucket state holds only
    * the doc_ids seen in that (band, key) bucket WITHIN the retention
    * horizon. Each arriving doc pairs against its bucket's surviving
    * history and is appended — candidates stream out incrementally, and
    * state is bounded by one horizon of ingest, never O(corpus) and never
    * O(n²). Every doc is stamped with its INGEST time (`current_timestamp`
    * — the micro-batch timestamp, replay-deterministic) and the query
    * watermarks on that stamp; eviction is then two-layer:
    *
    *  - PER ELEMENT: every stored doc_id carries its ingest stamp; on each
    *    bucket invocation, entries older than the horizon (relative to the
    *    batch's own stamp) are dropped before pairing, so a hot bucket's
    *    state is bounded by one horizon of its own ingest;
    *  - PER BUCKET: `EventTimeTimeout` + `setTimeoutTimestamp(newest +
    *    horizon)` removes a bucket's entire state blob once the watermark
    *    passes its newest element's expiry (cold buckets don't linger as
    *    expired blobs — without this the KEYSPACE itself would grow with
    *    the corpus).
    *
    * Implementation notes on the two rejected alternatives:
    * `transformWithState` ListState+TTL has these semantics built in but
    * mandates the RocksDB provider, whose per-partition snapshot lifecycle
    * costs seconds per micro-batch (measured here to dominate gate
    * wall-clock); `ProcessingTimeTimeout` cannot be used with
    * `Trigger.AvailableNow` at all — `shouldRunAnotherBatch` is
    * unconditionally true under it, so the trigger never terminates
    * (observed as a live-locked spec). Event-time timeout reschedules only
    * while the watermark advances, so the run terminates.
    *
    * This is the incremental form of [[graft.text.Dedup.minhashLsh]]: run
    * over the same corpus inside one horizon it emits exactly the batch
    * candidate set (spec-asserted), and docs past the horizon stop pairing
    * (spec-asserted via a 1 s TTL across a checkpoint restart).
    * Verification (exact Jaccard on the candidate pairs) stays a batch
    * join downstream, as in the batch query.
    */
  def streamingLshCandidates(
      spark: SparkSession,
      docs: DataFrame,
      retention: java.time.Duration = lshDefaultRetention): Dataset[CandidatePair] = {
    import spark.implicits._
    val retentionMs = retention.toMillis
    val stamped = docs
      .withColumn("__ingest_ts", current_timestamp())
      .withWatermark("__ingest_ts", "0 seconds")
    val buckets = graft.text.Dedup.bandBuckets(
      graft.text.Dedup.signaturesOf(stamped, carry = Seq("__ingest_ts")),
      carry = Seq("__ingest_ts"))
    buckets
      // keep the watermarked column itself (not a derivation of it) so the
      // event-time attribute reaches the stateful operator
      .select(col("doc_id"), col("band"), col("key"), col("__ingest_ts"))
      .as[(Long, Int, Long, java.sql.Timestamp)]
      .groupByKey { case (_, band, key, _) => (band, key) }
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (bucket: (Int, Long), rows: Iterator[(Long, Int, Long, java.sql.Timestamp)],
         state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            // watermark passed newest-element expiry: the whole blob is dead
            state.remove()
            Iterator.empty
          } else {
            val arrivedRows = rows.map(r => (r._1, r._4.getTime)).toList
            val nowMs = arrivedRows.map(_._2).max
            val live = state.getOption.map(_.docs).getOrElse(Nil)
              .filter { case (_, seenAt) => nowMs - seenAt < retentionMs }
            val pairs = scala.collection.mutable.ListBuffer.empty[CandidatePair]
            var history = live
            arrivedRows.sortBy(_._1).foreach { case (d, ts) =>
              history.foreach { case (h, _) =>
                if (h != d) pairs += CandidatePair(math.min(h, d), math.max(h, d), bucket._1)
              }
              history = (d, ts) :: history
            }
            state.update(BucketState(history))
            state.setTimeoutTimestamp(nowMs + retentionMs)
            pairs.iterator
          }
      }
  }

  /** Exactly-once incremental processing into a DURABLE (parquet) sink
    * across source generations — the property that makes a streaming
    * pipeline restartable at 100 TB: the file source's checkpointed offset
    * log decides what is new, so a restarted job processes ONLY files that
    * arrived since the last commit and a restart with nothing new appends
    * nothing. The gate runs three checkpointed AvailableNow executions over
    * a growing input directory (generation 1: even event_ids; generation 2:
    * the odd rest; generation 3: nothing new) and returns the sink's final
    * contents, which must equal every event EXACTLY once — any reprocessing
    * would surface as duplicate rows and break the oracle's hash. The
    * transform is stateless (projection), so emission equals input and the
    * proof isolates offset tracking itself. Memory-sink queries elsewhere
    * cover the stateful/watermark semantics; this one covers the sink +
    * checkpoint contract.
    */
  val streamingIncrementalSink: graft.core.QueryDef = graft.core.QueryDef(
    "streaming_incremental_sink",
    "SELECT event_id, ts, user_id, event_type FROM events") { (spark, dir) =>
    val sess = gateSession(spark, dir)
    val base = graft.rentals.Scratch.dir(s"graft_incr_sink_${System.nanoTime()}")
    val events = graft.core.Tables.events(sess, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    events.filter(col("event_id") % 2 === 0).write.mode("overwrite").parquet(s"$base/in")
    runIncrementalSinkPhase(sess, base)
    // generation 2 lands as NEW files in the same directory; the
    // checkpointed offset log limits the restarted run to exactly them
    events.filter(col("event_id") % 2 =!= 0).write.mode("append").parquet(s"$base/in")
    runIncrementalSinkPhase(sess, base)
    // restart with nothing new: a committed-offset no-op
    runIncrementalSinkPhase(sess, base)
    sess.read.parquet(s"$base/out")
  }

  /** STATE-STORE recovery across restarts — the stateful complement of
    * [[streamingIncrementalSink]] (which proves offset recovery over a
    * stateless transform): an hourly aggregation runs
    * checkpointed over generation 1 (even event_ids), the directory then
    * grows by generation 2 (the odd rest), and a RESTARTED run with the
    * SAME checkpoint must produce the full-month aggregate — which it can
    * only do if the first run's aggregation state was durably checkpointed
    * and reloaded, because the restarted run's offset log excludes
    * generation 1's files. Complete mode re-emits the entire recovered
    * state, so the final memory table equals the batch aggregate over ALL
    * events — exactly what the oracle states. A state-recovery failure
    * yields generation-2-only counts and breaks the hash. At 100 TB this
    * property is what makes a stateful pipeline restartable: state lives
    * in the checkpoint (HDFS/S3-backed there), not in the executors.
    */
  val streamingStatefulRestart: graft.core.QueryDef = graft.core.QueryDef(
    "streaming_stateful_restart",
    """SELECT date_trunc('hour', ts) AS hour_start, event_type,
      |  CAST(count(*) AS BIGINT) AS n_events
      |FROM events
      |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
    statefulRestartPhases(gateSession(spark, dir), dir)._2
  }

  /** Runs the two checkpointed generations of the stateful-restart scenario;
    * returns (generation-1 result, post-restart result). Shared by the gate
    * query (which returns the final table) and the spec (which additionally
    * asserts generation 1 held ONLY the even half — distinguishing true
    * state recovery from an offset-log failure that silently re-reads
    * everything, which would also produce full counts).
    */
  def statefulRestartPhases(
      sess: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val base = graft.rentals.Scratch.dir(s"graft_stateful_restart_${System.nanoTime()}")
    val events = graft.core.Tables.events(sess, dir)
      .select(col("event_id"), col("ts"), col("event_type"))
    def runPhase(table: String): DataFrame = {
      val streamed = sess.readStream
        .schema("event_id BIGINT, ts TIMESTAMP, event_type STRING")
        .option("maxFilesPerTrigger", 1000000)
        .parquet(s"$base/in")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(
          col("window.start").as("hour_start"), col("event_type"), col("n_events"))
      val q = streamed.writeStream
        .format("memory")
        .queryName(table)
        .outputMode(OutputMode.Complete())
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      sess.table(table)
    }
    events.filter(col("event_id") % 2 === 0).write.mode("overwrite").parquet(s"$base/in")
    val g1 = runPhase(s"graft_stateful_restart_g1_${System.nanoTime()}")
    // generation 2 lands as NEW files; the restarted query reads ONLY them,
    // so full-month counts require the recovered aggregation state
    events.filter(col("event_id") % 2 =!= 0).write.mode("append").parquet(s"$base/in")
    (g1, runPhase(s"graft_stateful_restart_g2_${System.nanoTime()}"))
  }

  /** One checkpointed AvailableNow run of the stateless projection stream
    * `base/in` → parquet `base/out` (checkpoint at `base/ckpt`); returns the
    * sink row count after the run (consumed by the restart spec).
    */
  def runIncrementalSinkPhase(sess: SparkSession, base: String): Long = {
    val q = sess.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING")
      .parquet(s"$base/in")
      .writeStream
      .format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    sess.read.parquet(s"$base/out").count()
  }

  /** Run a streaming DataFrame to completion over the currently-available
    * data (AvailableNow) into an in-memory table; returns the result. Used by
    * tests and demos — production would use a durable sink + real trigger.
    */
  /** State-store telemetry from the most recent [[runAvailableNowToMemory]]
    * run ON THIS THREAD: total `numRowsTotal` across state operators in
    * the final progress, -1 when none ran. Read by the scale ramp to
    * measure how streaming state grows with data volume (stateless queries
    * like `streaming_pq_encode` must report 0; stateful ones must grow
    * with the horizon's ingest). Thread-local because the driver runs the
    * query synchronously on the harvesting thread — a process-global would
    * let two concurrent streaming queries in one JVM cross-harvest each
    * other's counts.
    */
  private val lastStateRowsLocal: ThreadLocal[Long] =
    ThreadLocal.withInitial(() => -1L)
  def resetLastStateRows(): Unit = lastStateRowsLocal.set(-1L)
  def lastStateRowsTotal: Long = lastStateRowsLocal.get()

  def runAvailableNowToMemory(
      spark: SparkSession,
      streamed: DataFrame,
      queryName: String,
      outputMode: OutputMode = OutputMode.Update()): DataFrame = {
    val q = streamed.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    lastStateRowsLocal.set(
      Option(q.lastProgress)
        .map(p => p.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L))
    spark.table(queryName)
  }

  /** Stream-stream LEFT OUTER interval join — the subtle half of streaming
    * joins: matched rows emit like the inner join, but a NULL-extended row
    * for an unmatched click may only emit once the watermark PROVES no
    * future purchase can match (click_ts + 30 min below the global
    * watermark = min of both streams' max event time minus the delay) —
    * emission happens at state eviction. Over an AvailableNow run the
    * emitted set is therefore the batch left join RESTRICTED to clicks
    * whose match window the final watermark closed — which is exactly what
    * the oracle states relationally (matched ∪ watermark-closed unmatched).
    * The bounded-state story is the inner join's: both sides watermarked,
    * the condition time-bounds both directions, state expires.
    */
  val streamStreamLeftJoin: graft.core.QueryDef = graft.core.QueryDef(
    "stream_stream_left_join",
    """WITH c AS (
      |  SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'),
      |p AS (
      |  SELECT user_id AS p_user_id, ts AS purchase_ts,
      |         CAST(round(value * 100) AS BIGINT) AS purchase_cents
      |  FROM events WHERE event_type = 'purchase'),
      |wm AS (
      |  SELECT least((SELECT max(click_ts) FROM c),
      |               (SELECT max(purchase_ts) FROM p)) - INTERVAL 1 HOUR AS w),
      |m AS (
      |  SELECT c.user_id, c.click_ts, p.purchase_ts, p.purchase_cents
      |  FROM c JOIN p ON p.p_user_id = c.user_id
      |   AND p.purchase_ts >= c.click_ts
      |   AND p.purchase_ts <= c.click_ts + INTERVAL 30 MINUTE),
      |un AS (
      |  SELECT c.user_id, c.click_ts FROM c
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM p WHERE p.p_user_id = c.user_id
      |      AND p.purchase_ts >= c.click_ts
      |      AND p.purchase_ts <= c.click_ts + INTERVAL 30 MINUTE)
      |    AND c.click_ts + INTERVAL 30 MINUTE < (SELECT w FROM wm))
      |SELECT user_id, click_ts, purchase_ts, purchase_cents FROM m
      |UNION ALL
      |SELECT user_id, click_ts, CAST(NULL AS TIMESTAMP), CAST(NULL AS BIGINT)
      |FROM un""".stripMargin) { (spark, dir) =>
    val sess = gateSession(spark, dir)
    val (clicks, purchases, cond) = clickPurchaseSides(sess, dir)
    val joined = clicks.join(purchases, cond, "left_outer")
      .select(col("user_id"), col("click_ts"), col("purchase_ts"), col("purchase_cents"))
    val table = s"graft_stream_stream_left_${System.nanoTime()}"
    runAvailableNowToMemory(sess, joined, table, OutputMode.Append())
  }

  /** Stream-stream FULL OUTER interval join: both directions of
    * [[streamStreamLeftJoin]]'s eviction logic at once. A click's null row
    * emits when the watermark strictly passes click_ts + 30 min (its last
    * possible match); a purchase's null row emits when the watermark
    * strictly passes purchase_ts itself (every matching click precedes the
    * purchase, so nothing can match it once the click-side watermark is
    * beyond its timestamp). The oracle states all three legs relationally.
    */
  val streamStreamFullJoin: graft.core.QueryDef = graft.core.QueryDef(
    "stream_stream_full_join",
    """WITH c AS (
      |  SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'),
      |p AS (
      |  SELECT user_id AS p_user_id, ts AS purchase_ts,
      |         CAST(round(value * 100) AS BIGINT) AS purchase_cents
      |  FROM events WHERE event_type = 'purchase'),
      |wm AS (
      |  SELECT least((SELECT max(click_ts) FROM c),
      |               (SELECT max(purchase_ts) FROM p)) - INTERVAL 1 HOUR AS w),
      |m AS (
      |  SELECT c.user_id, c.click_ts, p.purchase_ts, p.purchase_cents
      |  FROM c JOIN p ON p.p_user_id = c.user_id
      |   AND p.purchase_ts >= c.click_ts
      |   AND p.purchase_ts <= c.click_ts + INTERVAL 30 MINUTE),
      |uc AS (
      |  SELECT c.user_id, c.click_ts FROM c
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM p WHERE p.p_user_id = c.user_id
      |      AND p.purchase_ts >= c.click_ts
      |      AND p.purchase_ts <= c.click_ts + INTERVAL 30 MINUTE)
      |    AND c.click_ts + INTERVAL 30 MINUTE < (SELECT w FROM wm)),
      |up AS (
      |  SELECT p.p_user_id, p.purchase_ts, p.purchase_cents FROM p
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM c WHERE p.p_user_id = c.user_id
      |      AND p.purchase_ts >= c.click_ts
      |      AND p.purchase_ts <= c.click_ts + INTERVAL 30 MINUTE)
      |    AND p.purchase_ts < (SELECT w FROM wm))
      |SELECT user_id, click_ts, purchase_ts, purchase_cents FROM m
      |UNION ALL
      |SELECT user_id, click_ts, CAST(NULL AS TIMESTAMP), CAST(NULL AS BIGINT) FROM uc
      |UNION ALL
      |SELECT p_user_id, CAST(NULL AS TIMESTAMP), purchase_ts, purchase_cents
      |FROM up""".stripMargin) { (spark, dir) =>
    val sess = gateSession(spark, dir)
    val (clicks, purchases, cond) = clickPurchaseSides(sess, dir)
    val joined = clicks.join(purchases, cond, "full_outer")
      .select(
        coalesce(col("user_id"), col("p_user_id")).as("user_id"),
        col("click_ts"), col("purchase_ts"), col("purchase_cents"))
    val table = s"graft_stream_stream_full_${System.nanoTime()}"
    runAvailableNowToMemory(sess, joined, table, OutputMode.Append())
  }

  /** Stream-static AS-OF enrichment — the one join shape the stream-stream /
    * stream-static matrix above does not cover: every streamed purchase is
    * attributed to the SAME USER'S LATEST click at-or-before it (classic
    * last-touch attribution against a versioned dimension). An as-of match
    * is an argmax, not a join predicate, so it cannot be a stateless
    * stream-static join condition; the production pattern is `foreachBatch`
    * — each micro-batch is a plain DataFrame, enriched with the NATIVE
    * batch as-of operator ([[graft.plans.AsofJoinNative]], sorted-merge
    * physical plan) and written to a durable sink idempotently by batchId.
    * Stateless transform ⇒ exactly-once per batch under any micro-batch
    * split; unmatched purchases null-extend (as-of LEFT semantics), which
    * is exactly the oracle's correlated-max statement.
    */
  val streamingAsofEnrich: graft.core.QueryDef = graft.core.QueryDef(
    "streaming_asof_enrich",
    """WITH p AS (
      |  SELECT event_id, user_id, ts AS purchase_ts,
      |         CAST(round(value * 100) AS BIGINT) AS purchase_cents
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click')
      |SELECT p.event_id, p.user_id, p.purchase_ts, p.purchase_cents,
      |  (SELECT max(c.click_ts) FROM c
      |   WHERE c.user_id = p.user_id AND c.click_ts <= p.purchase_ts) AS last_click_ts
      |FROM p""".stripMargin) { (spark, dir) =>
    val sess = gateSession(spark, dir)
    val clicks = graft.core.Tables.events(sess, dir)
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("click_ts"))
    val purchases = readEventsStream(sess, dir)
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id"), col("user_id"), col("ts").as("purchase_ts"),
        graft.core.Num.cents(col("value")).as("purchase_cents"))
    val out = graft.rentals.Scratch.dir(s"graft_stream_asof_${System.nanoTime()}")
    val q = purchases.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.plans.AsofJoinNative.asof(
          batch.toDF(), clicks,
          Seq("user_id" -> "c_user_id"), "purchase_ts", "click_ts")
          .select(
            col("event_id"), col("user_id"), col("purchase_ts"),
            col("purchase_cents"), col("click_ts").as("last_click_ts"))
          .write.mode("overwrite").parquet(s"$out/batch_$batchId")
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    sess.read.parquet(s"$out/batch_*")
  }

  final case class TwsTypeRow(
      user_id: Long, event_type: String, n: Long, cents: Long, user_n: Long)

  /** Per-user per-event-type running stats on the Spark 4 arbitrary-state
    * API v2 (`transformWithState`): a `MapState` keyed by event type holds
    * (count, exact cents), a `ValueState` holds the user's running event
    * total — two independently-evolvable typed state variables per key,
    * which is precisely what the v2 API adds over the single-blob
    * `GroupState` of `mapGroupsWithState`. Each batch emits the FULL
    * per-type snapshot (MapState iterator), so the "latest snapshot" read
    * below stays correct under any micro-batch split. RocksDB-backed state
    * (the provider the API requires — and the one that spills; at 100 TB
    * per-key state lives off-heap and checkpoint deltas ship to the
    * checkpoint location incrementally).
    */
  class TypeStatsProcessor
      extends StatefulProcessor[Long, (Long, String, Long), TwsTypeRow] {
    import org.apache.spark.sql.Encoders
    @transient private var perType: MapState[String, (Long, Long)] = _
    @transient private var userN: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      perType = getHandle.getMapState[String, (Long, Long)](
        "perType", Encoders.STRING, Encoders.product[(Long, Long)], TTLConfig.NONE)
      userN = getHandle.getValueState[Long]("userN", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long,
        rows: Iterator[(Long, String, Long)],
        timerValues: TimerValues): Iterator[TwsTypeRow] = {
      var n = if (userN.exists()) userN.get() else 0L
      rows.foreach { case (_, t, c) =>
        val (pn, pc) = if (perType.containsKey(t)) perType.getValue(t) else (0L, 0L)
        perType.updateValue(t, (pn + 1L, pc + c))
        n += 1L
      }
      userN.update(n)
      perType.iterator().map { case (t, (tn, tc)) => TwsTypeRow(key, t, tn, tc, n) }
    }
  }

  /** [[TypeStatsProcessor]] inside the driver gate: AvailableNow over the
    * events file, Update mode to a memory sink, then the latest snapshot
    * per (user, type) — the row carrying the highest user_n, which strictly
    * increases on every batch containing the user's rows. The oracle states
    * the same per-(user, type) counts/cents with the per-user total as a
    * window sum over the grouped result.
    */
  val streamingTwsTypeStats: graft.core.QueryDef = graft.core.QueryDef(
    "streaming_tws_type_stats",
    """WITH e AS (
      |  SELECT user_id, event_type,
      |         COALESCE(CAST(round(value * 100) AS BIGINT), 0) AS cents
      |  FROM events)
      |SELECT user_id, event_type,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(cents) AS BIGINT) AS cents,
      |  CAST(sum(count(*)) OVER (PARTITION BY user_id) AS BIGINT) AS user_n
      |FROM e GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
    val sess = gateSession(spark, dir)
    sess.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // r17 evaluated RocksDB CHANGELOG checkpointing here (commit writes the
    // batch changelog; snapshots move to async maintenance): measured FLAT
    // to slightly WORSE at gate scale (warm 1.7-2.3 s -> 2.1-2.5 s A/B) —
    // on a local filesystem the per-commit snapshot "upload" is a file
    // copy, so the changelog write is pure extra IO. On remote checkpoint
    // storage the trade reverses; revisit when the checkpoint leaves the
    // local disk.
    import sess.implicits._
    val snapshots = readEventsStream(sess, dir)
      .select(
        col("user_id"), col("event_type"),
        coalesce(graft.core.Num.cents(col("value")), lit(0L)).as("cents"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .transformWithState(new TypeStatsProcessor, TimeMode.None(), OutputMode.Update())
    val table = s"graft_streaming_tws_${System.nanoTime()}"
    val emitted = runAvailableNowToMemory(sess, snapshots.toDF(), table, OutputMode.Update())
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("user_n").desc)
    emitted
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("user_id"), col("event_type"), col("n"), col("cents"), col("user_n"))
  }
}
