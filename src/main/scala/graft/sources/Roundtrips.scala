package graft.sources

import graft.core.{Num, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink round trips beyond the reference's CSV+parquet surface: ORC
  * and JSON-lines. The oracle recomputes the final aggregate straight from
  * the base tables, so the round trip must be lossless (values travel as
  * exact integer cents — no float-text ambiguity in any format).
  */
object Roundtrips {

  private def monthlySupplierRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey"), date_format(col("l_shipdate"), "yyyy-MM").as("month"))
      .agg(sum(Num.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("rev_cents"))

  private val roundtripOracle =
    """SELECT l_suppkey,
      |  CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) AS BIGINT) AS rev_cents,
      |  CAST(count(DISTINCT strftime(l_shipdate, '%Y-%m')) AS BIGINT) AS n_months
      |FROM lineitem
      |GROUP BY l_suppkey""".stripMargin

  private def readback(df: DataFrame): DataFrame =
    df.groupBy(col("l_suppkey"))
      .agg(
        sum(col("rev_cents")).as("rev_cents"),
        countDistinct(col("month")).as("n_months"))

  /** The dsv2 gate preamble — catalog registration + a fresh scratch
    * table, ONE definition for the rows that each begin by dropping and
    * re-creating their mem table. `ddlTail` is everything after
    * `CREATE TABLE <tbl> ` (columns, PARTITIONED BY, TBLPROPERTIES).
    * Returns the qualified table name.
    */
  private def freshGraftTable(
      spark: SparkSession, name: String, ddlTail: String): String = {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")
    val tbl = s"graft.$name"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl $ddlTail")
    tbl
  }

  val orcRoundtrip: QueryDef = QueryDef("orc_roundtrip", roundtripOracle) { (spark, dir) =>
    val path = graft.rentals.Scratch.dir("graft_orc_roundtrip")
    monthlySupplierRevenue(spark, dir).write.mode("overwrite").orc(path)
    readback(spark.read.orc(path))
  }

  val jsonlRoundtrip: QueryDef = QueryDef("jsonl_roundtrip", roundtripOracle) { (spark, dir) =>
    val path = graft.rentals.Scratch.dir("graft_jsonl_roundtrip")
    monthlySupplierRevenue(spark, dir).write.mode("overwrite").json(path)
    // JSON streams/files always get an explicit schema — no inference pass
    val schema = "l_suppkey BIGINT, month STRING, rev_cents BIGINT"
    readback(spark.read.schema(schema).json(path))
  }

  /** Schema evolution across dataset generations: a v1 parquet written with
    * the old schema `(l_suppkey, month, rev_cents)` and a v2 written after a
    * column was added (`n_items`) are read back as ONE dataset via parquet
    * schema merging (`mergeSchema` — Spark's footer-union read), with v1
    * rows surfacing NULL for the new column. The aggregate proves both
    * generations' values survive and the null-fill lands only on v1 rows.
    * The oracle recomputes from the base table with the same parity split,
    * so the round trip (write two generations, merged read) must be
    * lossless. At scale, mergeSchema costs one footer read per file —
    * the data pages are untouched; eligible filters still push down because
    * the merged schema is a superset of every file's.
    */
  val schemaDriftMerge: QueryDef = QueryDef(
    "schema_drift_merge",
    """WITH base AS (
      |  SELECT l_suppkey, strftime(l_shipdate, '%Y-%m') AS month,
      |    CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_cents,
      |    CAST(count(*) AS BIGINT) AS n_items
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT l_suppkey,
      |  CAST(SUM(rev_cents) AS BIGINT) AS rev_cents,
      |  CAST(SUM(CASE WHEN l_suppkey % 2 = 1 THEN n_items END) AS BIGINT) AS n_items_v2,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(count(*) FILTER (WHERE l_suppkey % 2 = 0) AS BIGINT) AS n_rows_v1
      |FROM base GROUP BY 1""".stripMargin) { (spark, dir) =>
    // pinned: the two generation writes each consumed this frame, paying
    // the full lineitem scan + 550k-group aggregate TWICE; one
    // materialization feeds both filtered writes (blocks evicted after)
    val (base, trackedBase) = graft.core.Pinned.withTrackedRdds(spark) {
      Tables.lineitem(spark, dir)
        .groupBy(col("l_suppkey"), date_format(col("l_shipdate"), "yyyy-MM").as("month"))
        .agg(
          sum(Num.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("rev_cents"),
          count(lit(1)).as("n_items"))
        .localCheckpoint()
    }
    val v1Path = graft.rentals.Scratch.dir("graft_schema_drift_v1")
    val v2Path = graft.rentals.Scratch.dir("graft_schema_drift_v2")
    base.filter(col("l_suppkey") % 2 === 0)
      .select(col("l_suppkey"), col("month"), col("rev_cents"))
      .write.mode("overwrite").parquet(v1Path)
    base.filter(col("l_suppkey") % 2 === 1)
      .write.mode("overwrite").parquet(v2Path)
    graft.core.Pinned.unpersistRdds(spark, trackedBase)
    spark.read.option("mergeSchema", "true").parquet(v1Path, v2Path)
      .groupBy(col("l_suppkey"))
      .agg(
        sum(col("rev_cents")).as("rev_cents"),
        sum(col("n_items")).as("n_items_v2"),
        count(lit(1)).as("n_rows"),
        count(when(col("n_items").isNull, 1)).as("n_rows_v1"))
  }

  /** CSV sink/scan round trip — the reference's own interchange format
    * exercised as an OUTPUT too (its ingest side is the two-pass
    * header-then-typed-schema scan, `rentals.Io.readRawCsv`). Values
    * travel as integer cents and the read back is explicit-schema (no
    * inference pass over the data — at 100 TB an inference scan would
    * double the read), so the trip is lossless by construction and the
    * oracle recomputes from the base table.
    */
  val csvRoundtrip: QueryDef = QueryDef("csv_roundtrip", roundtripOracle) { (spark, dir) =>
    val path = graft.rentals.Scratch.dir("graft_csv_roundtrip")
    monthlySupplierRevenue(spark, dir)
      .write.mode("overwrite").option("header", "true").csv(path)
    val schema = "l_suppkey BIGINT, month STRING, rev_cents BIGINT"
    readback(spark.read.schema(schema).option("header", "true").csv(path))
  }

  /** XML sink/scan round trip (Spark 4's built-in `xml` source — the
    * enterprise-interchange format the ORC/JSONL/CSV trio doesn't cover).
    * Explicit read schema as everywhere (no inference pass), `rowTag`
    * chosen per record; values travel as integer cents so the trip is
    * lossless and the oracle recomputes from the base table.
    */
  val xmlRoundtrip: QueryDef = QueryDef("xml_roundtrip", roundtripOracle) { (spark, dir) =>
    val path = graft.rentals.Scratch.dir("graft_xml_roundtrip")
    // fanned write leg: XML is serialization-heavy on write and
    // NON-SPLITTABLE on read — a single output file forces both legs
    // through one task; one file per write task parallelizes both.
    // (The same fan-out was tried on the orc/jsonl/csv trips and REVERTED:
    // their per-file serialize cost is small enough that 32-file listing +
    // open overhead measurably outweighed the parallelism — bench medians
    // +32%; XML's heavy serializer is the one that pays off.)
    graft.core.Par.fanOut(monthlySupplierRevenue(spark, dir))
      .write.mode("overwrite")
      .option("rootTag", "rows").option("rowTag", "row")
      .format("xml").save(path)
    val schema = "l_suppkey BIGINT, month STRING, rev_cents BIGINT"
    readback(spark.read.schema(schema).option("rowTag", "row").format("xml").load(path))
  }

  /** The custom DataSource V2 connector ([[SeqSource]]) through the oracle
    * gate: a 1M-row deterministic sequence table read with an id-range
    * predicate the source absorbs at PLANNING time (the scan generates
    * 500k rows, not 1M — RoundtripsSpec asserts the narrowed range in the
    * plan) plus a residual `bucket` predicate Spark evaluates, then a
    * 10-group rollup. The oracle replays the row derivation from
    * `range()` — the source's arithmetic is pure integer hashing, so the
    * gate proves the connector's generation, pushdown, pruning, and
    * partitioning produce exactly the declared relation.
    */
  val dsv2SeqPushdown: QueryDef = QueryDef(
    "dsv2_seq_pushdown",
    s"""WITH t AS (
       |  SELECT id, CAST(id % 32 AS INTEGER) AS bucket,
       |         ${graft.sources.SeqSource.valueSql("id")} AS value
       |  FROM range(0, 1000000) r(id))
       |SELECT CAST(value // 100 AS INTEGER) AS value_band,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(id) AS BIGINT) AS sum_id,
       |  CAST(sum(value) AS BIGINT) AS sum_value
       |FROM t
       |WHERE id >= 250000 AND id < 750000 AND bucket = 7
       |GROUP BY 1""".stripMargin) { (spark, dir) =>
    spark.read
      .format("graft.sources.SeqSource")
      .option("rows", "1000000")
      .option("slices", "8")
      .load()
      .filter(col("id") >= 250000L && col("id") < 750000L && col("bucket") === 7)
      .groupBy(expr("CAST(value div 100 AS INT)").as("value_band"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("id")).as("sum_id"),
        sum(col("value")).as("sum_value"))
  }

  /** Complete AGGREGATE pushdown through the V2 connector: count/min/max
    * over a filter-narrowed id range are answered by the scan itself in
    * closed form — the executed plan contains NO aggregate exec
    * (RoundtripsSpec asserts both that and the residual-filter case that
    * correctly blocks the pushdown). The oracle computes the same
    * aggregates from `range()` the honest way.
    */
  val dsv2SeqAggPushdown: QueryDef = QueryDef(
    "dsv2_seq_agg_pushdown",
    """SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(min(id) AS BIGINT) AS min_id,
      |  CAST(max(id) AS BIGINT) AS max_id
      |FROM range(0, 1000000) r(id)
      |WHERE id >= 123456 AND id < 654321""".stripMargin) { (spark, dir) =>
    spark.read
      .format("graft.sources.SeqSource")
      .option("rows", "1000000")
      .load()
      .filter(col("id") >= 123456L && col("id") < 654321L)
      .agg(
        count(lit(1)).as("n"),
        min(col("id")).as("min_id"),
        max(col("id")).as("max_id"))
  }

  /** The STREAMING read path of the custom V2 connector through the gate:
    * `readStream` over [[SeqSource]] (MicroBatchStream — row-position
    * offsets, the same partition planning and row derivation as the batch
    * scan), AvailableNow into a Complete-mode memory sink. The streamed
    * aggregate must equal the batch relation bit-for-bit, which the
    * `range()` oracle asserts — one table, both engines' read paths.
    */
  val dsv2SeqStream: QueryDef = QueryDef(
    "dsv2_seq_stream",
    """SELECT CAST(id % 32 AS INTEGER) AS bucket,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(id) AS BIGINT) AS sum_id
      |FROM range(0, 100000) r(id)
      |GROUP BY 1""".stripMargin) { (spark, dir) =>
    val sess = spark.newSession()
    sess.conf.set("spark.sql.shuffle.partitions", "8")
    val streamed = sess.readStream
      .format("graft.sources.SeqSource")
      .option("rows", "100000")
      .option("slices", "8")
      .load()
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("id")).as("sum_id"))
    val table = s"graft_dsv2_stream_${System.nanoTime()}"
    graft.streaming.Streams.runAvailableNowToMemory(
      sess, streamed, table, org.apache.spark.sql.streaming.OutputMode.Complete())
  }

  /** The connector as a SQL-addressable CATALOG table: with
    * `spark.sql.catalog.graft = SeqCatalog`, plain SQL over
    * `graft.seq_<rows>` plans through the same V2 scan (pushdown intact —
    * RoundtripsSpec asserts the narrowed range in the SQL path's plan).
    */
  val dsv2SeqCatalogSql: QueryDef = QueryDef(
    "dsv2_seq_catalog_sql",
    s"""SELECT CAST(id % 32 AS INTEGER) AS bucket,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(${graft.sources.SeqSource.valueSql("id")}) AS BIGINT) AS sum_value
       |FROM range(0, 500000) r(id)
       |WHERE id >= 100000
       |GROUP BY 1""".stripMargin) { (spark, dir) =>
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")
    spark.sql(
      """SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(value) AS BIGINT) AS sum_value
        |FROM graft.seq_500000 WHERE id >= 100000 GROUP BY bucket""".stripMargin)
  }

  /** The V2 WRITE path through the gate: a [[MemTable]] created in the
    * `graft` catalog receives TWO `writeTo(...).append()` batches (the
    * per-type aggregates of the even- and odd-user halves of the events
    * table — each append runs the full task-commit/driver-commit protocol)
    * and the read back must merge to exactly the full-table aggregate,
    * which the oracle recomputes from the base table. Proves create →
    * append → append → scan is lossless and append accumulates rather than
    * replaces (the truncate leg is spec-asserted alongside the commit
    * protocol in RoundtripsSpec).
    */
  val dsv2MemWriteRoundtrip: QueryDef = QueryDef(
    "dsv2_mem_write_roundtrip",
    """SELECT event_type,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(SUM(COALESCE(CAST(round(value * 100) AS BIGINT), 0)) AS BIGINT) AS cents
      |FROM events GROUP BY 1""".stripMargin) { (spark, dir) =>
    val tbl = freshGraftTable(spark, "mem_events_agg", "(event_type STRING, n BIGINT, cents BIGINT)")
    val events = Tables.events(spark, dir)
      .select(
        col("event_type"), col("user_id"),
        coalesce(Num.cents(col("value")), lit(0L)).as("cents"))
    def half(parity: Int) = events
      .filter(col("user_id") % 2 === parity)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
    half(0).writeTo(tbl).append()
    half(1).writeTo(tbl).append()
    spark.table(tbl)
      .groupBy(col("event_type"))
      .agg(sum(col("n")).as("n"), sum(col("cents")).as("cents"))
  }

  /** SQL DDL schema EVOLUTION through the `graft` catalog — the
    * `schema_drift_merge` semantics behind `ALTER TABLE`: create a
    * two-column per-nation aggregate, append generation 1, `ADD COLUMNS
    * (cents BIGINT)`, append generation 2 WITH the new column, `DROP
    * COLUMN n_rows`, and read back. Generation-1 rows must surface
    * `cents` as NULL (written before the column existed) and the dropped
    * column must vanish from both generations — all metadata-only (no
    * batch is rewritten; scans project by name, see [[MemTables]]). The
    * oracle restates the surviving columns per generation from the base
    * table, with gen-1 cents literally NULL.
    */
  val dsv2AlterEvolution: QueryDef = QueryDef(
    "dsv2_alter_evolution",
    """WITH c AS (
      |  SELECT n.n_name AS nation, count(*) AS n_cust
      |  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
      |  GROUP BY 1)
      |SELECT 1 AS gen, nation, CAST(n_cust AS BIGINT) AS n_cust,
      |       CAST(NULL AS BIGINT) AS cents
      |FROM c
      |UNION ALL
      |SELECT 2 AS gen, n.n_name AS nation,
      |       CAST(count(*) AS BIGINT) AS n_cust,
      |       CAST(SUM(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS cents
      |FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
      |GROUP BY 2""".stripMargin) { (spark, dir) =>
    val tbl = freshGraftTable(spark, "mem_nation_evolution", "(gen INT, nation STRING, n_cust BIGINT, n_rows BIGINT)")
    // IF NOT EXISTS against the existing table must be a no-op, not a crash
    // (TableAlreadyExistsException contract) — exercised inline in the gate
    spark.sql(s"CREATE TABLE IF NOT EXISTS $tbl (gen INT, nation STRING)")
    val perNation = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir),
        col("n_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(
        count(lit(1)).as("n_cust"),
        sum(Num.cents(col("c_acctbal"))).as("cents"))
    perNation
      .select(lit(1).as("gen"), col("nation"), col("n_cust"), col("n_cust").as("n_rows"))
      .writeTo(tbl).append()
    spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (cents BIGINT)")
    perNation
      .select(lit(2).as("gen"), col("nation"), col("n_cust"),
        col("n_cust").as("n_rows"), col("cents"))
      .writeTo(tbl).append()
    spark.sql(s"ALTER TABLE $tbl DROP COLUMN n_rows")
    spark.table(tbl).select(col("gen"), col("nation"), col("n_cust"), col("cents"))
  }

  /** DROP COLUMN followed by re-ADD of the SAME name — the tombstone case:
    * the re-added column is a NEW field that reuses the name, so rows
    * written before the drop must read NULL for it (never their stale
    * pre-drop values), while rows appended after the re-add carry the new
    * values. [[MemTables]] implements this with per-batch alter-version
    * tags plus a dropped-name tombstone map — the name-based equivalent of
    * Iceberg field ids; metadata-only, no batch rewrite. Gen 1 writes
    * `score = n_cust * 7`, the drop+re-add discards that field, gen 2
    * writes `score = cents`; the oracle asserts gen-1 score IS NULL.
    */
  val dsv2DropReadd: QueryDef = QueryDef(
    "dsv2_drop_readd",
    """WITH c AS (
      |  SELECT n.n_name AS nation, CAST(count(*) AS BIGINT) AS n_cust,
      |         CAST(SUM(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
      |  GROUP BY 1)
      |SELECT 1 AS gen, nation, n_cust, CAST(NULL AS BIGINT) AS score FROM c
      |UNION ALL
      |SELECT 2 AS gen, nation, n_cust, cents AS score FROM c""".stripMargin) { (spark, dir) =>
    val tbl = freshGraftTable(spark, "mem_nation_drop_readd", "(gen INT, nation STRING, n_cust BIGINT, score BIGINT)")
    val perNation = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir),
        col("n_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(
        count(lit(1)).as("n_cust"),
        sum(Num.cents(col("c_acctbal"))).as("cents"))
    perNation
      .select(lit(1).as("gen"), col("nation"), col("n_cust"),
        (col("n_cust") * 7).as("score"))
      .writeTo(tbl).append()
    spark.sql(s"ALTER TABLE $tbl DROP COLUMN score")
    spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (score BIGINT)")
    perNation
      .select(lit(2).as("gen"), col("nation"), col("n_cust"),
        col("cents").as("score"))
      .writeTo(tbl).append()
    spark.table(tbl)
  }

  /** TIME TRAVEL (`VERSION AS OF`) through the DSv2 catalog — the
    * lakehouse snapshot-read surface: every commit and alter bumps the
    * table's version; truncate (INSERT OVERWRITE) soft-deletes, so old
    * snapshots stay exact replays. The sequence here is create (v0) →
    * append gen 1 (v1) → ALTER ADD COLUMNS cents (v2) → append gen 2 (v3)
    * → INSERT OVERWRITE gen 3 (v4); the query reads AS OF 1 (pre-alter
    * SCHEMA — no cents column exists to select), AS OF 3 (both
    * generations, gen-1 cents NULL), and current (the overwrite only).
    * The oracle restates all three snapshots from the base tables — a
    * wrong visibility rule (overwrite leaking into AS OF 3, gen 2 leaking
    * into AS OF 1, stale rows in current) breaks the hash.
    */
  val dsv2TimeTravel: QueryDef = QueryDef(
    "dsv2_time_travel",
    """WITH c AS (
      |  SELECT n.n_name AS nation, CAST(count(*) AS BIGINT) AS n_cust,
      |         CAST(SUM(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
      |  GROUP BY 1)
      |SELECT 1 AS snap, 1 AS gen, nation, n_cust, CAST(NULL AS BIGINT) AS cents FROM c
      |UNION ALL
      |SELECT 3 AS snap, 1 AS gen, nation, n_cust, CAST(NULL AS BIGINT) AS cents FROM c
      |UNION ALL
      |SELECT 3 AS snap, 2 AS gen, nation, n_cust, cents FROM c
      |UNION ALL
      |SELECT 4 AS snap, 3 AS gen, nation, n_cust, cents * 2 AS cents FROM c""".stripMargin) { (spark, dir) =>
    val tbl = freshGraftTable(spark, "mem_nation_time_travel", "(gen INT, nation STRING, n_cust BIGINT)") // v0
    val perNation = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir),
        col("n_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(
        count(lit(1)).as("n_cust"),
        sum(Num.cents(col("c_acctbal"))).as("cents"))
    perNation
      .select(lit(1).as("gen"), col("nation"), col("n_cust"))
      .writeTo(tbl).append() // v1
    spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (cents BIGINT)") // v2
    perNation
      .select(lit(2).as("gen"), col("nation"), col("n_cust"), col("cents"))
      .writeTo(tbl).append() // v3
    perNation
      .select(lit(3).as("gen"), col("nation"), col("n_cust"),
        (col("cents") * 2).as("cents"))
      .createOrReplaceTempView("tt_overwrite_src")
    spark.sql(s"INSERT OVERWRITE $tbl SELECT * FROM tt_overwrite_src") // v4
    spark.sql(
      s"""SELECT 1 AS snap, gen, nation, n_cust, CAST(NULL AS BIGINT) AS cents
         |FROM $tbl VERSION AS OF 1
         |UNION ALL
         |SELECT 3 AS snap, gen, nation, n_cust, cents FROM $tbl VERSION AS OF 3
         |UNION ALL
         |SELECT 4 AS snap, gen, nation, n_cust, cents FROM $tbl""".stripMargin)
  }

  /** The CATALOG-NATIVE form of `snapshot_diff`: instead of two derived
    * frames standing in for table generations, the generations ARE table
    * versions — snapshot A is appended (v1), snapshot B replaces it via
    * INSERT OVERWRITE (v2), and the diff full-outer-joins `VERSION AS OF
    * 1` against the current table. Same added/removed/changed/unchanged
    * classification and exact-cents net delta as `snapshot_diff`, same
    * oracle restated from `orders` — so the hash match proves the time-
    * travel read returns exactly the pre-overwrite generation. This is the
    * shape a lakehouse incremental audit takes: diff two snapshot ids of
    * ONE table, no side copies. At scale both snapshot scans shuffle once
    * on the key (the snapshots share no physical layout guarantee after an
    * overwrite).
    */
  val snapshotDiffCatalog: QueryDef = QueryDef(
    "snapshot_diff_catalog",
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
    val tbl = freshGraftTable(spark, "mem_orders_snapshots", "(k BIGINT, v BIGINT)") // v0
    val cents = Num.cents(col("o_totalprice"))
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey").as("k"), cents.as("v"))
      .writeTo(tbl).append() // v1: snapshot A
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 5 =!= 0)
      .select(
        col("o_orderkey").as("k"),
        (cents + when(col("o_orderkey") % 3 === 0, lit(100L)).otherwise(lit(0L))).as("v"))
      .createOrReplaceTempView("snapshot_b_src")
    spark.sql(s"INSERT OVERWRITE $tbl SELECT * FROM snapshot_b_src") // v2: snapshot B
    spark.sql(
      s"""SELECT
         |  CASE WHEN a.k IS NULL THEN 'added'
         |       WHEN b.k IS NULL THEN 'removed'
         |       WHEN a.v <> b.v THEN 'changed'
         |       ELSE 'unchanged' END AS class,
         |  count(*) AS n,
         |  SUM(COALESCE(b.v, 0L) - COALESCE(a.v, 0L)) AS net_delta_cents
         |FROM (SELECT * FROM $tbl VERSION AS OF 1) a
         |FULL OUTER JOIN $tbl b ON b.k = a.k
         |GROUP BY 1""".stripMargin)
  }

  /** CHANGE-FEED (CDC) read — the INCREMENTAL complement of
    * `snapshot_diff_catalog`: rather than diffing two snapshots (cost =
    * table size), a downstream consumer reads the row-level change log of
    * a version window (cost = change rate) — `insert` events from commits,
    * `delete` events from the truncating overwrite, `_change_type` /
    * `_commit_version` appended (see [[MemChangesSource]]). Sequence:
    * append snapshot A (v1), INSERT OVERWRITE snapshot B (v2); the feed
    * over (0, 2] must contain A as inserts@1, A as deletes@2, and B as
    * inserts@2 — the oracle restates all three event sets from `orders`,
    * so a wrong event rule (missed deletes, overwrite leaking as update,
    * events outside the window) breaks the hash.
    */
  val dsv2CdcRead: QueryDef = QueryDef(
    "dsv2_cdc_read",
    """WITH base AS (
      |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders WHERE o_orderkey % 11 = 0),
      |a AS (SELECT k, v FROM base WHERE k % 7 <> 0),
      |b AS (SELECT k, v + CASE WHEN k % 3 = 0 THEN 100 ELSE 0 END AS v
      |      FROM base WHERE k % 5 <> 0)
      |SELECT k, v, 'insert' AS _change_type, CAST(1 AS BIGINT) AS _commit_version FROM a
      |UNION ALL
      |SELECT k, v, 'insert' AS _change_type, CAST(2 AS BIGINT) AS _commit_version FROM b
      |UNION ALL
      |SELECT k, v, 'delete' AS _change_type, CAST(2 AS BIGINT) AS _commit_version FROM a""".stripMargin) { (spark, dir) =>
    val tbl = freshGraftTable(spark, "mem_orders_cdc", "(k BIGINT, v BIGINT)") // v0
    val base = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 11 === 0)
      .select(col("o_orderkey").as("k"), Num.cents(col("o_totalprice")).as("v"))
    base.filter(col("k") % 7 =!= 0).writeTo(tbl).append() // v1: snapshot A
    base.filter(col("k") % 5 =!= 0)
      .select(col("k"),
        (col("v") + when(col("k") % 3 === 0, lit(100L)).otherwise(lit(0L))).as("v"))
      .createOrReplaceTempView("cdc_overwrite_src")
    spark.sql(s"INSERT OVERWRITE $tbl SELECT * FROM cdc_overwrite_src") // v2: snapshot B
    spark.read.format("graft.sources.MemChangesSource")
      .option("table", "mem_orders_cdc")
      .option("from", "0").option("to", "2")
      .load()
  }

  /** STREAMING consumption of the change feed: the table's version clock
    * is the streaming OFFSET, so `readStream` over [[MemChangesSource]]
    * delivers each commit/truncate event exactly once (offsets land in the
    * checkpoint log like any source) and each micro-batch costs its window's
    * change volume. Run AvailableNow over the same append+overwrite
    * sequence as `dsv2_cdc_read`, the emitted stream must equal the batch
    * feed over (0, current] — graded by the SAME oracle, so the hash match
    * proves offset-windowed planning loses and duplicates nothing.
    */
  val dsv2CdcStream: QueryDef = QueryDef(
    "dsv2_cdc_stream",
    """WITH base AS (
      |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders WHERE o_orderkey % 11 = 0),
      |a AS (SELECT k, v FROM base WHERE k % 7 <> 0),
      |b AS (SELECT k, v + CASE WHEN k % 3 = 0 THEN 100 ELSE 0 END AS v
      |      FROM base WHERE k % 5 <> 0)
      |SELECT k, v, 'insert' AS _change_type, CAST(1 AS BIGINT) AS _commit_version FROM a
      |UNION ALL
      |SELECT k, v, 'insert' AS _change_type, CAST(2 AS BIGINT) AS _commit_version FROM b
      |UNION ALL
      |SELECT k, v, 'delete' AS _change_type, CAST(2 AS BIGINT) AS _commit_version FROM a""".stripMargin) { (spark, dir) =>
    val tbl = freshGraftTable(spark, "mem_orders_cdc_stream", "(k BIGINT, v BIGINT)") // v0
    val base = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 11 === 0)
      .select(col("o_orderkey").as("k"), Num.cents(col("o_totalprice")).as("v"))
    base.filter(col("k") % 7 =!= 0).writeTo(tbl).append() // v1
    base.filter(col("k") % 5 =!= 0)
      .select(col("k"),
        (col("v") + when(col("k") % 3 === 0, lit(100L)).otherwise(lit(0L))).as("v"))
      .createOrReplaceTempView("cdc_stream_overwrite_src")
    spark.sql(s"INSERT OVERWRITE $tbl SELECT * FROM cdc_stream_overwrite_src") // v2
    val feed = spark.readStream.format("graft.sources.MemChangesSource")
      .option("table", "mem_orders_cdc_stream")
      .option("from", "0")
      .load()
    graft.streaming.Streams.runAvailableNowToMemory(
      spark, feed, s"graft_cdc_stream_${System.nanoTime()}",
      org.apache.spark.sql.streaming.OutputMode.Append())
  }

  /** Row-level `DELETE FROM ... WHERE` through the connector
    * (`SupportsDelete`), implemented as a VERSIONED GROUP REWRITE — the
    * copy-on-write shape of every table format without deletion vectors:
    * batches containing matches are soft-removed at the delete's version
    * and their survivors re-committed (see [[MemTables.deleteWhere]]), so
    * time travel before the delete still sees every row. The query
    * aggregates the pre-delete snapshot (`VERSION AS OF 1`) and the
    * current table; a wrong rewrite (survivors lost, matches surviving,
    * history mutated) breaks either row's hash against the oracle's
    * restatement from `orders`.
    */
  val dsv2DeleteWhere: QueryDef = QueryDef(
    "dsv2_delete_where",
    """WITH base AS (
      |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders WHERE o_orderkey % 11 = 0)
      |SELECT 1 AS snap, CAST(count(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS total
      |FROM base
      |UNION ALL
      |SELECT 2 AS snap, CAST(count(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS total
      |FROM base WHERE NOT (v < 10000000 OR k IN (11, 22, 33))""".stripMargin) { (spark, dir) =>
    val tbl = freshGraftTable(spark, "mem_orders_delete", "(k BIGINT, v BIGINT)") // v0
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 11 === 0)
      .select(col("o_orderkey").as("k"), Num.cents(col("o_totalprice")).as("v"))
      .writeTo(tbl).append() // v1
    // v2: the rewrite — matches leave, survivors stay, history untouched
    // (condition limited to source-translatable filters: range OR IN-list;
    // an untranslatable condition fails the DELETE loudly at planning)
    spark.sql(s"DELETE FROM $tbl WHERE v < 10000000 OR k IN (11, 22, 33)")
    spark.sql(
      s"""SELECT 1 AS snap, count(*) AS n, SUM(v) AS total FROM $tbl VERSION AS OF 1
         |UNION ALL
         |SELECT 2 AS snap, count(*) AS n, SUM(v) AS total FROM $tbl""".stripMargin)
  }

  /** STREAMING WRITE into the connector (`writeStream.toTable` →
    * `StreamingWrite`): each micro-batch's task buffers ride the same
    * commit-message protocol as batch writes and the driver publish is
    * idempotent per (queryId, epochId) — the transactional-sink contract
    * that turns Spark's post-restart epoch re-delivery into exactly-once
    * table contents ([[MemTables.commitEpoch]]; the spec drives the replay
    * directly). The gate streams the events table through a stateless
    * projection into a mem table and aggregates the readback; any row
    * duplicated or lost by the sink protocol breaks the oracle's hash.
    */
  val dsv2StreamingSink: QueryDef = QueryDef(
    "dsv2_streaming_sink",
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |       CAST(SUM(COALESCE(CAST(round(value * 100) AS BIGINT), 0)) AS BIGINT) AS cents
      |FROM events GROUP BY 1""".stripMargin) { (spark, dir) =>
    val tbl = freshGraftTable(spark, "mem_events_stream_sink", "(event_type STRING, cents BIGINT)")
    val sess = spark.newSession()
    sess.conf.set("spark.sql.shuffle.partitions", "8")
    sess.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")
    val cp = graft.rentals.Scratch.dir(s"sink_cp_${System.nanoTime()}")
    val q = graft.streaming.Streams.readTableStream(sess, dir, "events")
      .select(
        col("event_type"),
        coalesce(Num.cents(col("value")), lit(0L)).as("cents"))
      .writeStream
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable(tbl)
    q.awaitTermination()
    spark.table(tbl)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
  }

  /** SQL `UPDATE` through the connector — Spark's group-based row-level
    * rewrite (`SupportsRowLevelOperations`) at COMMITTED-BATCH group
    * granularity: the scan advertises `_batch_version` as
    * runtime-filterable, Spark's group-filter rule finds the batches
    * containing matches via a dynamic-pruning subquery, and the publish
    * replaces exactly those batches in one atomic version (copy-on-write
    * proportional to the matched groups, never the table; see
    * [[MemTable.newRowLevelOperationBuilder]] — RoundtripsSpec asserts
    * untouched batches survive by reference). The condition here (modulo)
    * is deliberately NOT a translatable source filter, proving arbitrary
    * predicates plan through the rewrite. Both the pre-update snapshot and
    * the updated rows are hash-checked.
    */
  val dsv2UpdateWhere: QueryDef = QueryDef(
    "dsv2_update_where",
    """WITH base AS (
      |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders WHERE o_orderkey % 11 = 0)
      |SELECT 1 AS snap, k, v FROM base
      |UNION ALL
      |SELECT 2 AS snap, k, CASE WHEN k % 3 = 0 THEN v + 7 ELSE v END AS v
      |FROM base""".stripMargin) { (spark, dir) =>
    val tbl = freshGraftTable(spark, "mem_orders_update", "(k BIGINT, v BIGINT)") // v0
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 11 === 0)
      .select(col("o_orderkey").as("k"), Num.cents(col("o_totalprice")).as("v"))
      .writeTo(tbl).append() // v1
    spark.sql(s"UPDATE $tbl SET v = v + 7 WHERE k % 3 = 0") // v2 (group rewrite)
    spark.sql(
      s"""SELECT 1 AS snap, k, v FROM $tbl VERSION AS OF 1
         |UNION ALL
         |SELECT 2 AS snap, k, v FROM $tbl""".stripMargin)
  }

  /** SQL `MERGE INTO` (upsert) through the connector — matched target rows
    * take the source's value, unmatched source rows insert, unmatched
    * target rows carry over; one atomic copy-on-write version, rewriting
    * only the batches holding matched targets (runtime group filter on
    * `_batch_version`, as in [[dsv2UpdateWhere]]). The oracle restates the
    * upsert relationally (full outer join of the two snapshots), so a
    * wrong carry/update/insert split breaks the hash.
    */
  val dsv2MergeUpsert: QueryDef = QueryDef(
    "dsv2_merge_upsert",
    """WITH base AS (
      |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders WHERE o_orderkey % 11 = 0),
      |t AS (SELECT k, v FROM base WHERE k % 7 <> 0),
      |s AS (SELECT k, v + 100 AS v FROM base WHERE k % 5 <> 0)
      |SELECT COALESCE(s.k, t.k) AS k, COALESCE(s.v, t.v) AS v
      |FROM t FULL OUTER JOIN s ON s.k = t.k""".stripMargin) { (spark, dir) =>
    val tbl = freshGraftTable(spark, "mem_orders_merge", "(k BIGINT, v BIGINT)") // v0
    val base = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 11 === 0)
      .select(col("o_orderkey").as("k"), Num.cents(col("o_totalprice")).as("v"))
    base.filter(col("k") % 7 =!= 0).writeTo(tbl).append() // v1: target
    base.filter(col("k") % 5 =!= 0)
      .select(col("k"), (col("v") + 100L).as("v"))
      .createOrReplaceTempView("merge_upsert_src")
    spark.sql(
      s"""MERGE INTO $tbl t USING merge_upsert_src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin) // v2
    spark.table(tbl)
  }

  /** CDC over a DML window — the change-event shape of row-level
    * operations, hash-pinned: append evens (v1), append odds (v2), then an
    * UPDATE whose condition only matches ODD keys (v3) and a DELETE whose
    * matches span both batches (v4). The rewrites log batch-level
    * remove + reinsert-survivor events, so the feed over (0,4] must show
    * v3 touching ONLY the odd batch — the even batch contributes no v3
    * events, which is the runtime group filter's proportionality made
    * oracle-checkable: a silently degraded whole-table rewrite would emit
    * extra even-batch events and break the hash. The DELETE (fast path,
    * batch-granular) then emits both batches' removals plus per-batch
    * survivors. The oracle restates all six event sets from `orders`.
    */
  val dsv2CdcDml: QueryDef = QueryDef(
    "dsv2_cdc_dml",
    """WITH base AS (
      |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders WHERE o_orderkey % 11 = 0),
      |evens AS (SELECT k, v FROM base WHERE k % 2 = 0),
      |odds AS (SELECT k, v FROM base WHERE k % 2 = 1),
      |odds2 AS (SELECT k, CASE WHEN k % 3 = 0 THEN v + 7 ELSE v END AS v FROM odds),
      |cur AS (SELECT k, v FROM evens UNION ALL SELECT k, v FROM odds2)
      |SELECT k, v, 'insert' AS _change_type, CAST(1 AS BIGINT) AS _commit_version FROM evens
      |UNION ALL SELECT k, v, 'insert', CAST(2 AS BIGINT) FROM odds
      |UNION ALL SELECT k, v, 'delete', CAST(3 AS BIGINT) FROM odds
      |UNION ALL SELECT k, v, 'insert', CAST(3 AS BIGINT) FROM odds2
      |UNION ALL SELECT k, v, 'delete', CAST(4 AS BIGINT) FROM cur
      |UNION ALL SELECT k, v, 'insert', CAST(4 AS BIGINT) FROM cur WHERE v >= 10000000""".stripMargin) { (spark, dir) =>
    val tbl = freshGraftTable(spark, "mem_orders_cdc_dml", "(k BIGINT, v BIGINT)") // v0
    val base = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 11 === 0)
      .select(col("o_orderkey").as("k"), Num.cents(col("o_totalprice")).as("v"))
    // one task batch per append: the DML events below are batch-granular,
    // so the batch layout must be deterministic for the oracle to restate
    // ASSERTED preconditions (not assumed): the oracle restates the v3
    // UPDATE as rewriting the odd batch and the v4 DELETE as rewriting
    // BOTH batches — true only when each batch contains a match. A corpus
    // where one didn't would make the connector (correctly) skip that
    // batch's rewrite while the oracle still restated it. One small agg
    // over the request-sized base proves the data holds the contract.
    val pre = base.agg(
      sum(when(col("k") % 2 === 1 && col("k") % 3 === 0, 1L).otherwise(0L)).as("odd3"),
      sum(when(col("k") % 2 === 0 && col("v") < 10000000L, 1L).otherwise(0L)).as("evdel"),
      sum(when(col("k") % 2 === 1 &&
        when(col("k") % 3 === 0, col("v") + 7L).otherwise(col("v")) < 10000000L,
        1L).otherwise(0L)).as("odddel")).head()
    require(pre.getLong(0) > 0 && pre.getLong(1) > 0 && pre.getLong(2) > 0,
      s"dsv2_cdc_dml oracle precondition violated: odd-batch k%3 matches=" +
        s"${pre.getLong(0)}, even-batch deletables=${pre.getLong(1)}, " +
        s"odd-batch deletables=${pre.getLong(2)} — each must be > 0")
    base.filter(col("k") % 2 === 0).coalesce(1).writeTo(tbl).append() // v1
    base.filter(col("k") % 2 === 1).coalesce(1).writeTo(tbl).append() // v2
    spark.sql(s"UPDATE $tbl SET v = v + 7 WHERE k % 3 = 0 AND k % 2 = 1") // v3
    spark.sql(s"DELETE FROM $tbl WHERE v < 10000000") // v4
    spark.read.format("graft.sources.MemChangesSource")
      .option("table", "mem_orders_cdc_dml")
      .option("from", "0").option("to", "4")
      .load()
  }

  /** The COMPLETE `MERGE INTO` clause surface in one statement —
    * conditioned matched-DELETE, matched-UPDATE, not-matched-INSERT, and
    * both NOT MATCHED BY SOURCE actions (conditioned UPDATE and DELETE):
    * with a by-source clause present every target row is potentially
    * affected, so Spark correctly plans the whole-table group rewrite (no
    * group filter) and the published table must equal the five-way clause
    * split, which the oracle restates as a single full-outer-join CASE.
    */
  val dsv2MergeFull: QueryDef = QueryDef(
    "dsv2_merge_full",
    """WITH base AS (
      |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders WHERE o_orderkey % 11 = 0),
      |t AS (SELECT k, v FROM base WHERE k % 7 <> 0),
      |s AS (SELECT k, v + 100 AS v FROM base WHERE k % 5 <> 0),
      |j AS (SELECT t.k AS tk, t.v AS tv, s.k AS sk, s.v AS sv
      |      FROM t FULL OUTER JOIN s ON s.k = t.k)
      |SELECT COALESCE(tk, sk) AS k,
      |  CASE WHEN tk IS NULL THEN sv
      |       WHEN sk IS NULL THEN CASE WHEN tk % 4 = 0 THEN tv + 1 ELSE tv END
      |       ELSE sv END AS v
      |FROM j
      |WHERE NOT (tk IS NOT NULL AND sk IS NOT NULL AND sk % 9 = 0)
      |  AND NOT (sk IS NULL AND tk IS NOT NULL AND tk % 4 = 2)""".stripMargin) { (spark, dir) =>
    val tbl = freshGraftTable(spark, "mem_orders_merge_full", "(k BIGINT, v BIGINT)") // v0
    val base = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 11 === 0)
      .select(col("o_orderkey").as("k"), Num.cents(col("o_totalprice")).as("v"))
    base.filter(col("k") % 7 =!= 0).writeTo(tbl).append() // v1: target
    base.filter(col("k") % 5 =!= 0)
      .select(col("k"), (col("v") + 100L).as("v"))
      .createOrReplaceTempView("merge_full_src")
    spark.sql(
      s"""MERGE INTO $tbl t USING merge_full_src s ON t.k = s.k
         |WHEN MATCHED AND s.k % 9 = 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
         |WHEN NOT MATCHED BY SOURCE AND t.k % 4 = 0 THEN UPDATE SET v = v + 1
         |WHEN NOT MATCHED BY SOURCE AND t.k % 4 = 2 THEN DELETE""".stripMargin) // v2
    spark.table(tbl)
  }

  /** MERGE-ON-READ deletes (positional DELETE VECTORS) — the other half of
    * the industry DML design space, selected per table via `TBLPROPERTIES
    * ('graft.delete-mode'='merge-on-read')`: a DELETE records matched row
    * positions in the batch's DV at the delete's version instead of
    * rewriting the batch, scans apply the overlay against the bound
    * snapshot, and the change feed emits ROW-level delete events (finer
    * than copy-on-write's batch remove+reinsert — no survivor churn).
    * Write cost O(matches), read pays the filter — the Iceberg
    * `write.delete.mode` fork. The query unions a mid-history snapshot,
    * the current read, and the whole change feed (part-tagged), so one
    * hash pins the overlay read path, time travel over DVs, and the
    * row-level event log together; RoundtripsSpec additionally asserts
    * DV-read ≡ CoW-read on the same DML sequence with zero rows copied.
    */
  val dsv2DeleteMor: QueryDef = QueryDef(
    "dsv2_delete_mor",
    """WITH base AS (
      |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders WHERE o_orderkey % 13 = 0),
      |d2 AS (SELECT k, v FROM base WHERE v >= 10000000),
      |d3 AS (SELECT k, v FROM d2 WHERE v < 30000000)
      |SELECT 'snap2' AS part, k, v FROM d2
      |UNION ALL SELECT 'cur', k, v FROM d3
      |UNION ALL SELECT 'cdc_insert_1', k, v FROM base
      |UNION ALL SELECT 'cdc_delete_2', k, v FROM base WHERE v < 10000000
      |UNION ALL SELECT 'cdc_delete_3', k, v FROM d2 WHERE v >= 30000000""".stripMargin) { (spark, dir) =>
    val tbl = freshGraftTable(spark, "mem_orders_delete_mor",
      "(k BIGINT, v BIGINT) TBLPROPERTIES ('graft.delete-mode'='merge-on-read')") // v0
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 13 === 0)
      .select(col("o_orderkey").as("k"), Num.cents(col("o_totalprice")).as("v"))
      .coalesce(1).writeTo(tbl).append() // v1
    spark.sql(s"DELETE FROM $tbl WHERE v < 10000000") // v2: DV, no rewrite
    spark.sql(s"DELETE FROM $tbl WHERE v >= 30000000") // v3: DV again
    val feed = spark.read.format("graft.sources.MemChangesSource")
      .option("table", "mem_orders_delete_mor")
      .option("from", "0").option("to", "3")
      .load()
      .select(
        concat_ws("_", lit("cdc"), col(MemChangesSource.ChangeType),
          col(MemChangesSource.CommitVersion)).as("part"),
        col("k"), col("v"))
    spark.sql(
      s"""SELECT 'snap2' AS part, k, v FROM $tbl VERSION AS OF 2
         |UNION ALL
         |SELECT 'cur' AS part, k, v FROM $tbl""".stripMargin)
      .unionAll(feed)
  }

  /** DELTA-BASED (merge-on-read) UPDATE — `SupportsDelta`, the true
    * row-level DML path a merge-on-read table serves: the rewrite emits
    * per-row operations keyed by `(_batch_id, _batch_pos)` and the publish
    * writes DV entries + delta batches; cost is O(changed rows), no batch
    * is rewritten. Two chained UPDATEs, the second hitting rows that live
    * in the FIRST update's delta batch (row ids must resolve into delta
    * batches, not just originals). The query unions three snapshots with
    * the change feed; the oracle restates row-level delete+insert pairs
    * for exactly the MATCHED rows per version — a degraded copy-on-write
    * rewrite would emit whole-batch events and break the hash, so delta
    * proportionality is oracle-pinned the same way `dsv2_cdc_dml` pins
    * the group filter.
    */
  val dsv2UpdateMor: QueryDef = QueryDef(
    "dsv2_update_mor",
    """WITH base AS (
      |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders WHERE o_orderkey % 17 = 0),
      |u2 AS (SELECT k, CASE WHEN k % 3 = 0 THEN v + 7 ELSE v END AS v FROM base),
      |u3 AS (SELECT k, CASE WHEN k % 6 = 0 THEN v + 1000 ELSE v END AS v FROM u2)
      |SELECT 'snap1' AS part, k, v FROM base
      |UNION ALL SELECT 'snap2', k, v FROM u2
      |UNION ALL SELECT 'cur', k, v FROM u3
      |UNION ALL SELECT 'cdc_insert_1', k, v FROM base
      |UNION ALL SELECT 'cdc_delete_2', k, v FROM base WHERE k % 3 = 0
      |UNION ALL SELECT 'cdc_insert_2', k, v FROM u2 WHERE k % 3 = 0
      |UNION ALL SELECT 'cdc_delete_3', k, v FROM u2 WHERE k % 6 = 0
      |UNION ALL SELECT 'cdc_insert_3', k, v FROM u3 WHERE k % 6 = 0""".stripMargin) { (spark, dir) =>
    val tbl = freshGraftTable(spark, "mem_orders_update_mor",
      "(k BIGINT, v BIGINT) TBLPROPERTIES ('graft.delete-mode'='merge-on-read')") // v0
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 17 === 0)
      .select(col("o_orderkey").as("k"), Num.cents(col("o_totalprice")).as("v"))
      .coalesce(1).writeTo(tbl).append() // v1
    spark.sql(s"UPDATE $tbl SET v = v + 7 WHERE k % 3 = 0") // v2: delta
    spark.sql(s"UPDATE $tbl SET v = v + 1000 WHERE k % 6 = 0") // v3: delta over delta
    val feed = spark.read.format("graft.sources.MemChangesSource")
      .option("table", "mem_orders_update_mor")
      .option("from", "0").option("to", "3")
      .load()
      .select(
        concat_ws("_", lit("cdc"), col(MemChangesSource.ChangeType),
          col(MemChangesSource.CommitVersion)).as("part"),
        col("k"), col("v"))
    spark.sql(
      s"""SELECT 'snap1' AS part, k, v FROM $tbl VERSION AS OF 1
         |UNION ALL SELECT 'snap2' AS part, k, v FROM $tbl VERSION AS OF 2
         |UNION ALL SELECT 'cur' AS part, k, v FROM $tbl""".stripMargin)
      .unionAll(feed)
  }

  /** TABLE COMPACTION (`CALL graft.compact_table`) through the gate — the
    * maintenance op that makes merge-on-read sustainable: after two
    * appends and a DV delete, compaction folds the live rows into one
    * fresh batch at a version the change feed SKIPS (physical
    * reorganization, zero logical change — Iceberg's replace-snapshot
    * rule). The query unions the post-compaction read with the feed over
    * the WHOLE window including the compaction version: the oracle
    * restates only the real events (two inserts, the DV deletes), so a
    * compaction that leaked remove/re-insert events into the feed — or
    * changed any row — breaks the hash.
    */
  val dsv2Compact: QueryDef = QueryDef(
    "dsv2_compact",
    """WITH base AS (
      |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders WHERE o_orderkey % 19 = 0),
      |evens AS (SELECT k, v FROM base WHERE k % 2 = 0),
      |odds AS (SELECT k, v FROM base WHERE k % 2 = 1)
      |SELECT 'cur' AS part, k, v FROM base WHERE v >= 10000000
      |UNION ALL SELECT 'cdc_insert_1', k, v FROM evens
      |UNION ALL SELECT 'cdc_insert_2', k, v FROM odds
      |UNION ALL SELECT 'cdc_delete_3', k, v FROM base WHERE v < 10000000""".stripMargin) { (spark, dir) =>
    val tbl = freshGraftTable(spark, "mem_orders_compact",
      "(k BIGINT, v BIGINT) TBLPROPERTIES ('graft.delete-mode'='merge-on-read')") // v0
    val base = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 19 === 0)
      .select(col("o_orderkey").as("k"), Num.cents(col("o_totalprice")).as("v"))
    base.filter(col("k") % 2 === 0).coalesce(1).writeTo(tbl).append() // v1
    base.filter(col("k") % 2 === 1).coalesce(1).writeTo(tbl).append() // v2
    spark.sql(s"DELETE FROM $tbl WHERE v < 10000000") // v3: DV entries
    spark.sql(s"CALL graft.compact_table('mem_orders_compact')") // v4: replace snapshot
    val feed = spark.read.format("graft.sources.MemChangesSource")
      .option("table", "mem_orders_compact")
      .option("from", "0").option("to", "4")
      .load()
      .select(
        concat_ws("_", lit("cdc"), col(MemChangesSource.ChangeType),
          col(MemChangesSource.CommitVersion)).as("part"),
        col("k"), col("v"))
    spark.table(tbl)
      .select(lit("cur").as("part"), col("k"), col("v"))
      .unionAll(feed)
  }

  /** `CALL graft.table_history` through the gate — the DESCRIBE HISTORY
    * surface with operation provenance: a seven-step lifecycle (create,
    * two appends, a delta UPDATE, a DV DELETE, a compaction, an ALTER)
    * must surface exactly its (version, kind) ledger, and joining each
    * retained version against a `VERSION AS OF` count proves the ledger's
    * versions are real snapshot handles, not labels — the compaction row
    * must show the same count as the version before it (zero logical
    * change) and the alter must change nothing. The oracle restates kinds
    * as a VALUES table and every count from `orders`.
    */
  val dsv2TableHistory: QueryDef = QueryDef(
    "dsv2_table_history",
    """WITH base AS (
      |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders WHERE o_orderkey % 23 = 0),
      |u AS (SELECT k, CASE WHEN k % 3 = 0 THEN v + 7 ELSE v END AS v FROM base),
      |s AS (SELECT k, v FROM u WHERE v >= 10000000),
      |c AS (SELECT * FROM (VALUES
      |  (CAST(0 AS BIGINT), 'create'),
      |  (CAST(1 AS BIGINT), 'append'),
      |  (CAST(2 AS BIGINT), 'append'),
      |  (CAST(3 AS BIGINT), 'delta'),
      |  (CAST(4 AS BIGINT), 'delete'),
      |  (CAST(5 AS BIGINT), 'compact'),
      |  (CAST(6 AS BIGINT), 'alter')) AS t(version, kind))
      |SELECT version, kind,
      |  CAST(CASE version
      |    WHEN 0 THEN 0
      |    WHEN 1 THEN (SELECT count(*) FROM base WHERE k % 2 = 0)
      |    WHEN 2 THEN (SELECT count(*) FROM base)
      |    WHEN 3 THEN (SELECT count(*) FROM base)
      |    ELSE (SELECT count(*) FROM s) END AS BIGINT) AS n
      |FROM c""".stripMargin) { (spark, dir) =>
    val tbl = freshGraftTable(spark, "mem_orders_history",
      "(k BIGINT, v BIGINT) TBLPROPERTIES ('graft.delete-mode'='merge-on-read')") // v0
    val base = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 23 === 0)
      .select(col("o_orderkey").as("k"), Num.cents(col("o_totalprice")).as("v"))
    base.filter(col("k") % 2 === 0).coalesce(1).writeTo(tbl).append() // v1
    base.filter(col("k") % 2 === 1).coalesce(1).writeTo(tbl).append() // v2
    spark.sql(s"UPDATE $tbl SET v = v + 7 WHERE k % 3 = 0") // v3: delta
    spark.sql(s"DELETE FROM $tbl WHERE v < 10000000") // v4: DV delete
    spark.sql(s"CALL graft.compact_table('mem_orders_history')") // v5
    spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (note STRING)") // v6
    val hist = spark.sql(s"CALL graft.table_history('mem_orders_history')")
      .select(col("version"), col("kind"))
    val counts = (0L to 6L).map { v =>
      spark.sql(s"SELECT CAST($v AS BIGINT) AS version, count(*) AS n " +
        s"FROM $tbl VERSION AS OF $v")
    }.reduce(_ unionAll _)
    hist.join(counts, Seq("version")).select(col("version"), col("kind"), col("n"))
  }

  /** Named snapshot refs (TAGS) through the gate: tag the pre-overwrite
    * version (`CALL graft.create_tag`), replace the table's contents, and
    * read both `VERSION AS OF 'prefreeze'` and current — the oracle
    * restates both generations from `orders`, so a tag that drifted,
    * resolved to the wrong version, or leaked the overwrite breaks the
    * hash. The pinning contract (expiry refuses to age out a tagged
    * snapshot) is spec-asserted in RoundtripsSpec.
    */
  val dsv2TagTravel: QueryDef = QueryDef(
    "dsv2_tag_travel",
    """WITH base AS (
      |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders WHERE o_orderkey % 29 = 0)
      |SELECT 'tagged' AS part, k, v FROM base
      |UNION ALL
      |SELECT 'cur', k, v + CASE WHEN k % 4 = 0 THEN 13 ELSE 0 END
      |FROM base WHERE k % 3 <> 0""".stripMargin) { (spark, dir) =>
    val tbl = freshGraftTable(spark, "mem_orders_tag", "(k BIGINT, v BIGINT)") // v0
    val base = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 29 === 0)
      .select(col("o_orderkey").as("k"), Num.cents(col("o_totalprice")).as("v"))
    base.writeTo(tbl).append() // v1
    spark.sql(s"CALL graft.create_tag('mem_orders_tag', 'prefreeze', 1)")
    base.filter(col("k") % 3 =!= 0)
      .select(col("k"),
        (col("v") + when(col("k") % 4 === 0, lit(13L)).otherwise(lit(0L))).as("v"))
      .createOrReplaceTempView("tag_travel_src")
    spark.sql(s"INSERT OVERWRITE $tbl SELECT * FROM tag_travel_src") // v2
    spark.sql(
      s"""SELECT 'tagged' AS part, k, v FROM $tbl VERSION AS OF 'prefreeze'
         |UNION ALL
         |SELECT 'cur' AS part, k, v FROM $tbl""".stripMargin)
  }

  /** DATA SKIPPING through the gate — per-batch column bounds + filter
    * pushdown on the mem-table scan ([[MemScanBuilder.pushFilters]] /
    * [[MemTables.statsOf]]): four range-disjoint batches are appended
    * (band edges derived from the key maximum, so the layout is
    * deterministic per scale factor), then a selective read of ONE band
    * plans only the batches whose bounds admit it (RoundtripsSpec asserts
    * the planned-partition count; pruning here is parquet row-group /
    * Iceberg manifest-bounds semantics: every filter stays a residual, so
    * skipping can only elide work). The query unions the selective slice
    * with a full-table aggregate, so one hash pins both "the skip lost
    * nothing inside the band" and "the other bands still exist".
    */
  val dsv2SelectiveRead: QueryDef = QueryDef(
    "dsv2_selective_read",
    """WITH base AS (
      |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders WHERE o_orderkey % 3 = 0),
      |m AS (SELECT max(k) AS mx FROM base)
      |SELECT 'slice' AS part, k, v FROM base, m WHERE k > mx // 4 AND k <= mx // 2
      |UNION ALL
      |SELECT 'total', CAST(count(*) AS BIGINT), CAST(sum(v) AS BIGINT) FROM base""".stripMargin) { (spark, dir) =>
    val tbl = freshGraftTable(spark, "mem_orders_selective", "(k BIGINT, v BIGINT)") // v0
    val base = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey").as("k"), Num.cents(col("o_totalprice")).as("v"))
    val mx = base.agg(max(col("k"))).head().getLong(0)
    val edges = Seq(mx / 4, mx / 2, mx / 4 * 3)
    // four range-disjoint batches, one committed task batch each
    base.filter(col("k") <= edges(0)).coalesce(1).writeTo(tbl).append() // v1
    base.filter(col("k") > edges(0) && col("k") <= edges(1))
      .coalesce(1).writeTo(tbl).append() // v2
    base.filter(col("k") > edges(1) && col("k") <= edges(2))
      .coalesce(1).writeTo(tbl).append() // v3
    base.filter(col("k") > edges(2)).coalesce(1).writeTo(tbl).append() // v4
    spark.sql(
      s"""SELECT 'slice' AS part, k, v FROM $tbl
         |WHERE k > ${edges(0)} AND k <= ${edges(1)}
         |UNION ALL
         |SELECT 'total', count(*), sum(v) FROM $tbl""".stripMargin)
  }

  /** RENAME + type-WIDENING schema evolution through the gate — the
    * metadata-only promotions every long-lived table eventually needs:
    * gen 1 is written under `(ck INT, bal_cents INT)`; the table then
    * widens both columns to BIGINT and renames `bal_cents` → `cents`
    * (era-timeline rename, [[MemTables.alterSchema]]); gen 2 appends
    * under the new schema. The current read must serve gen-1 bytes
    * through the rename AND the int→bigint promotion (values exact), and
    * `VERSION AS OF 1` must still read the pre-evolution schema under the
    * ORIGINAL name and type. No batch is rewritten at any step. The
    * oracle restates both generations and the pinned snapshot from
    * `customer`.
    */
  val dsv2SchemaEvolve: QueryDef = QueryDef(
    "dsv2_schema_evolve",
    """WITH base AS (
      |  SELECT c_custkey AS ck, CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      |  FROM customer)
      |SELECT 'cur' AS part, ck, cents FROM base
      |UNION ALL
      |SELECT 'pre', ck, cents FROM base WHERE ck % 2 = 0""".stripMargin) { (spark, dir) =>
    val tbl = freshGraftTable(spark, "mem_cust_evolve", "(ck INT, bal_cents INT)") // v0
    val base = Tables.customer(spark, dir).select(
      col("c_custkey").cast("int").as("ck"),
      Num.cents(col("c_acctbal")).cast("int").as("bal_cents"))
    base.filter(col("ck") % 2 === 0).coalesce(1).writeTo(tbl).append() // v1: gen 1
    spark.sql(s"ALTER TABLE $tbl ALTER COLUMN ck TYPE BIGINT") // v2: widen
    spark.sql(s"ALTER TABLE $tbl ALTER COLUMN bal_cents TYPE BIGINT") // v3: widen
    spark.sql(s"ALTER TABLE $tbl RENAME COLUMN bal_cents TO cents") // v4: rename
    base.filter(col("ck") % 2 === 1)
      .select(col("ck").cast("bigint"), col("bal_cents").cast("bigint").as("cents"))
      .coalesce(1).writeTo(tbl).append() // v5: gen 2, new schema
    spark.sql(
      s"""SELECT 'cur' AS part, ck, cents FROM $tbl
         |UNION ALL
         |SELECT 'pre' AS part, ck, bal_cents AS cents FROM $tbl VERSION AS OF 1""".stripMargin)
  }

  /** WRITE-AUDIT-PUBLISH through the gate — branches composed with the
    * reference's own DQ-gate contract (C4): a candidate batch is staged on
    * a branch (`INSERT INTO <table>.branch_audit`), the DQ framework runs
    * against the BRANCH read, and only a passing candidate fast-forwards
    * onto main. Round 1 stages a candidate with NULL keys → the DQ check
    * throws → `drop_branch`; round 2 stages a clean candidate → publish.
    * Rounds 3–4 (round 12) extend WAP to MUTATIONS
    * ([[MemTables.stageDeltaToBranch]]): a branch UPDATE that nulls the
    * key column fails the audit and drops with main BYTE-IDENTICAL, then
    * a passing branch UPDATE fast-forwards — post-images as an append,
    * row kills as one DV-delete commit. The result unions the final table
    * with its history ledger: a failed audit that leaked ANY version
    * (staged write or staged kill becoming a commit) would add a ledger
    * row and break the hash.
    */
  val dsv2BranchWap: QueryDef = QueryDef(
    "dsv2_branch_wap",
    """WITH base AS (
      |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders WHERE o_orderkey % 11 = 0),
      |cand AS (
      |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) + 13 AS v
      |  FROM orders WHERE o_orderkey % 7 = 0),
      |merged AS (SELECT * FROM base UNION ALL SELECT * FROM cand),
      |final AS (
      |  SELECT k, CASE WHEN k % 2 = 0 THEN v + 1000 ELSE v END AS v FROM merged)
      |SELECT 'cur' AS part, CAST(k AS VARCHAR) AS a, CAST(v AS VARCHAR) AS b FROM final
      |UNION ALL SELECT 'hist', '0', 'create'
      |UNION ALL SELECT 'hist', '1', 'append'
      |UNION ALL SELECT 'hist', '2', 'append'
      |UNION ALL SELECT 'hist', '3', 'append'
      |UNION ALL SELECT 'hist', '4', 'delete'""".stripMargin) { (spark, dir) =>
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")
    val key = "mem_orders_wap"
    val tbl = s"graft.$key"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.delete-mode'='merge-on-read')") // v0
    val orders = Tables.orders(spark, dir)
    orders.filter(col("o_orderkey") % 11 === 0)
      .select(col("o_orderkey").as("k"), Num.cents(col("o_totalprice")).as("v"))
      .writeTo(tbl).append() // v1
    val branchTbl = s"graft.$key.branch_audit"
    val audit = Seq(
      graft.rentals.DataQuality.nullPercentageCheck("k", 0.0),
      graft.rentals.DataQuality.rowCountCheck(1L))
    // round 1: a candidate with NULL keys fails the audit; main untouched
    spark.sql(s"CALL graft.create_branch('$key', 'audit', 1)")
    orders.filter(col("o_orderkey") % 7 === 0)
      .select(
        when(col("o_orderkey") % 5 === 0, lit(null)).otherwise(col("o_orderkey")).as("k"),
        Num.cents(col("o_totalprice")).as("v"))
      .writeTo(branchTbl).append() // staged only
    val failed =
      try { graft.rentals.DataQuality.runQualityChecks(spark.table(branchTbl), audit); false }
      catch { case _: graft.rentals.DataQualityError => true }
    require(failed, "the bad candidate must fail the audit")
    spark.sql(s"CALL graft.drop_branch('$key', 'audit')")
    // round 2: a clean candidate passes and publishes
    spark.sql(s"CALL graft.create_branch('$key', 'audit', 1)")
    orders.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey").as("k"), (Num.cents(col("o_totalprice")) + 13L).as("v"))
      .writeTo(branchTbl).append() // staged
    graft.rentals.DataQuality.runQualityChecks(spark.table(branchTbl), audit)
    spark.sql(s"CALL graft.fast_forward('$key', 'audit')") // v2
    // round 3 (branch-scoped DML): an UPDATE that nulls the key column
    // fails the audit; dropping the branch leaves main byte-identical —
    // no append version, no delete version, no ledger row
    spark.sql(s"CALL graft.create_branch('$key', 'audit', 2)")
    spark.sql(s"UPDATE $branchTbl SET k = NULL WHERE k % 2 = 0")
    val badUpdate =
      try { graft.rentals.DataQuality.runQualityChecks(spark.table(branchTbl), audit); false }
      catch { case _: graft.rentals.DataQualityError => true }
    require(badUpdate, "the null-key branch UPDATE must fail the audit")
    spark.sql(s"CALL graft.drop_branch('$key', 'audit')")
    // round 4: a passing branch UPDATE fast-forwards — post-images append
    // (v3), row kills publish as one DV-delete commit (v4)
    spark.sql(s"CALL graft.create_branch('$key', 'audit', 2)")
    spark.sql(s"UPDATE $branchTbl SET v = v + 1000 WHERE k % 2 = 0")
    graft.rentals.DataQuality.runQualityChecks(spark.table(branchTbl), audit)
    spark.sql(s"CALL graft.fast_forward('$key', 'audit')") // v3 + v4
    spark.sql(s"CALL graft.table_history('$key')")
      .createOrReplaceTempView("graft_wap_history")
    spark.sql(
      s"""SELECT 'cur' AS part, CAST(k AS STRING) AS a, CAST(v AS STRING) AS b FROM $tbl
         |UNION ALL
         |SELECT 'hist', CAST(version AS STRING), kind FROM graft_wap_history""".stripMargin)
  }

  /** EQUALITY DELETES via streaming UPSERT ingest — the remaining industry
    * DML variant (Iceberg equality-delete files, the Flink upsert shape):
    * a table created with `graft.upsert-keys` turns each streaming epoch
    * into one atomic version carrying delete-by-key over the epoch's keys
    * plus the inserts ([[MemTables.commitEpochUpsert]]); the delete
    * applies at read to strictly-older batches only, so an epoch never
    * deletes its own rows and write cost is O(epoch). Epoch 1 ingests the
    * base corpus; epoch 2 re-ingests every `k % 3 = 0` key with a bumped
    * value. The query unions the pinned first snapshot, the current
    * (last-write-per-key) read, and the change feed — whose v2 events
    * must be ROW-level deletes of exactly the replaced keys (a positional
    * or batch-granular fallback would break the hash).
    */
  val dsv2DeleteEquality: QueryDef = QueryDef(
    "dsv2_delete_equality",
    """WITH base AS (
      |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders WHERE o_orderkey % 11 = 0),
      |upd AS (SELECT k, v + 7 AS v FROM base WHERE k % 3 = 0),
      |cur AS (SELECT k, CASE WHEN k % 3 = 0 THEN v + 7 ELSE v END AS v FROM base)
      |SELECT 'snap1' AS part, k, v FROM base
      |UNION ALL SELECT 'cur', k, v FROM cur
      |UNION ALL SELECT 'cdc_insert_1', k, v FROM base
      |UNION ALL SELECT 'cdc_delete_2', k, v FROM base WHERE k % 3 = 0
      |UNION ALL SELECT 'cdc_insert_2', k, v FROM upd""".stripMargin) { (spark, dir) =>
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")
    val key = "mem_orders_upsert"
    val tbl = s"graft.$key"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v BIGINT) TBLPROPERTIES (" +
      "'graft.delete-mode'='merge-on-read', 'graft.upsert-keys'='k')") // v0
    val base = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 11 === 0)
      .select(col("o_orderkey").as("k"), Num.cents(col("o_totalprice")).as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val sess = spark.newSession()
    sess.conf.set("spark.sql.shuffle.partitions", "8")
    sess.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import sess.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sess.sqlContext
    val ms = MemoryStream[(Long, Long)]
    val cp = graft.rentals.Scratch.dir(s"upsert_cp_${System.nanoTime()}")
    val q = ms.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation", cp)
      .toTable(tbl)
    ms.addData(base) // epoch 0 -> v1
    q.processAllAvailable()
    ms.addData(base.filter(_._1 % 3 == 0).map { case (k, v) => (k, v + 7) }) // -> v2
    q.processAllAvailable()
    q.stop()
    val feed = spark.read.format("graft.sources.MemChangesSource")
      .option("table", key).option("from", "0").option("to", "2")
      .load()
      .select(
        concat_ws("_", lit("cdc"), col(MemChangesSource.ChangeType),
          col(MemChangesSource.CommitVersion)).as("part"),
        col("k"), col("v"))
    spark.sql(
      s"""SELECT 'snap1' AS part, k, v FROM $tbl VERSION AS OF 1
         |UNION ALL
         |SELECT 'cur' AS part, k, v FROM $tbl""".stripMargin)
      .unionAll(feed)
  }

  /** DISTRIBUTED SORTED compaction through the gate (`CALL
    * graft.rewrite_data_files`): four interleaved appends (every batch
    * spans the whole key range, so bounds can prune nothing) plus a DV
    * delete are rewritten by a Spark job into range-clustered, sorted
    * batches at one CDC-invisible version — the cluster-then-prune story
    * (RoundtripsSpec asserts the selective read plans fewer partitions
    * after the rewrite). The rewrite is a logical no-op, so the oracle
    * restates the slice and total straight from `orders` minus the
    * delete; any row lost, duplicated, or mutated by the job breaks the
    * hash.
    */
  val dsv2RewriteSorted: QueryDef = QueryDef(
    "dsv2_rewrite_sorted",
    """WITH base0 AS (
      |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders WHERE o_orderkey % 3 = 0),
      |base AS (SELECT k, v FROM base0 WHERE v >= 10000000),
      |m AS (SELECT max(k) AS mx FROM base0)
      |SELECT 'slice' AS part, k, v FROM base, m WHERE k > mx // 4 AND k <= mx // 2
      |UNION ALL
      |SELECT 'total', CAST(count(*) AS BIGINT), CAST(sum(v) AS BIGINT) FROM base""".stripMargin) { (spark, dir) =>
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")
    val key = "mem_orders_rewrite"
    val tbl = s"graft.$key"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v BIGINT)" +
      " TBLPROPERTIES ('graft.delete-mode'='merge-on-read')") // v0
    val base = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey").as("k"), Num.cents(col("o_totalprice")).as("v"))
    val mx = base.agg(max(col("k"))).head().getLong(0)
    // four INTERLEAVED appends: every batch spans the full key range
    (0 until 4).foreach { i =>
      base.filter(col("k") % 4 === i).coalesce(1).writeTo(tbl).append() // v1..v4
    }
    spark.sql(s"DELETE FROM $tbl WHERE v < 10000000") // v5: DV entries
    spark.sql(s"CALL graft.rewrite_data_files('$key', 'k')") // v6: clustered
    spark.sql(
      s"""SELECT 'slice' AS part, k, v FROM $tbl
         |WHERE k > ${mx / 4} AND k <= ${mx / 2}
         |UNION ALL
         |SELECT 'total', count(*), sum(v) FROM $tbl""".stripMargin)
  }

  /** PARTITIONED table layout through the gate — identity + bucket
    * transforms composed on one table (`PARTITIONED BY (nk, bucket(8,
    * ck))`): the write distributes by the partition expressions and every
    * committed batch is partition-pure, so the two selective reads prune
    * at PLANNING — `nk = 7` keeps one nation's batches via the identity
    * value, `ck = 42` keeps one bucket via the hash (the case min/max
    * bounds cannot serve: each bucket's raw key range spans the domain).
    * The oracle restates both slices and the full-table total from
    * `customer`, so a layout bug that misplaces or double-places any row
    * breaks the hash. PartitionedTableSpec pins the planned-partition
    * counts; at 100 TB this layout is what turns point reads from
    * table-sized scans into partition-sized ones.
    */
  val dsv2PartitionedPrune: QueryDef = QueryDef(
    "dsv2_partitioned_prune",
    """WITH base AS (
      |  SELECT c_custkey AS ck, CAST(c_nationkey AS INTEGER) AS nk,
      |         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      |  FROM customer)
      |SELECT 'nation' AS part, ck, nk, cents FROM base WHERE nk = 7
      |UNION ALL
      |SELECT 'key', ck, nk, cents FROM base WHERE ck = 42
      |UNION ALL
      |SELECT 'total', CAST(count(*) AS BIGINT), CAST(sum(nk) AS INTEGER),
      |       CAST(sum(cents) AS BIGINT)
      |FROM base""".stripMargin) { (spark, dir) =>
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")
    val tbl = "graft.mem_cust_part"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(
      s"CREATE TABLE $tbl (ck BIGINT, nk INT, cents BIGINT) " +
        "PARTITIONED BY (nk, bucket(8, ck))") // v0
    Tables.customer(spark, dir).select(
      col("c_custkey").as("ck"),
      col("c_nationkey").cast("int").as("nk"),
      Num.cents(col("c_acctbal")).as("cents"))
      .writeTo(tbl).append() // v1
    spark.sql(
      s"""SELECT 'nation' AS part, ck, nk, cents FROM $tbl WHERE nk = 7
         |UNION ALL
         |SELECT 'key', ck, nk, cents FROM $tbl WHERE ck = 42
         |UNION ALL
         |SELECT 'total', count(*), CAST(sum(nk) AS INT), sum(cents) FROM $tbl""".stripMargin)
  }

  /** STORAGE-PARTITIONED JOIN through the gate — the zero-shuffle
    * co-partitioned join (Spark's `v2.bucketing` + the scan's
    * `KeyGroupedPartitioning`): customers and suppliers land in two mem
    * tables identity-partitioned on nation, and the per-nation join +
    * aggregate runs WITHOUT A SINGLE EXCHANGE — the scans' reported
    * clustering satisfies both the join and the group-by
    * (PartitionedTableSpec pins the plan). The MERGE hint keeps the join
    * sort-merge so the assertion exercises the partitioning rather than a
    * broadcast. The oracle replays the join from the base tables. At
    * 100 TB this is the largest single cost a table layout can delete
    * from a fact-fact join: both shuffles.
    */
  val dsv2SpjJoin: QueryDef = QueryDef(
    "dsv2_spj_join",
    """WITH a AS (
      |  SELECT CAST(c_nationkey AS INTEGER) AS nk,
      |         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      |  FROM customer),
      |b AS (
      |  SELECT CAST(s_nationkey AS INTEGER) AS nk,
      |         CAST(round(s_acctbal * 100) AS BIGINT) AS scents
      |  FROM supplier)
      |SELECT a.nk, CAST(count(*) AS BIGINT) AS cnt,
      |       CAST(sum(a.cents + b.scents) AS BIGINT) AS tot
      |FROM a JOIN b ON a.nk = b.nk
      |GROUP BY a.nk""".stripMargin) { (spark, dir) =>
    // CHILD session: v2 bucketing must be on when the (lazy) join PLANS —
    // a save/restore here would flip it back before execution, and setting
    // it on the shared session would leak SPJ planning into every later
    // query (plan shapes becoming order-dependent)
    val sess = spark.newSession()
    sess.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")
    sess.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    val spark2 = sess
    val (ta, tb) = ("graft.mem_cust_bynation", "graft.mem_supp_bynation")
    spark2.sql(s"DROP TABLE IF EXISTS $ta")
    spark2.sql(s"DROP TABLE IF EXISTS $tb")
    spark2.sql(s"CREATE TABLE $ta (nk INT, cents BIGINT) PARTITIONED BY (nk)")
    spark2.sql(s"CREATE TABLE $tb (nk INT, scents BIGINT) PARTITIONED BY (nk)")
    Tables.customer(spark2, dir).select(
      col("c_nationkey").cast("int").as("nk"),
      Num.cents(col("c_acctbal")).as("cents")).writeTo(ta).append()
    Tables.supplier(spark2, dir).select(
      col("s_nationkey").cast("int").as("nk"),
      Num.cents(col("s_acctbal")).as("scents")).writeTo(tb).append()
    spark2.sql(
      s"""SELECT /*+ MERGE(a) */ a.nk, count(*) AS cnt,
         |       sum(a.cents + b.scents) AS tot
         |FROM $ta a JOIN $tb b ON a.nk = b.nk
         |GROUP BY a.nk""".stripMargin)
  }

  /** METADATA-ANSWERED aggregates through the gate
    * ([[MemScanBuilder.computeAgg]]): the global COUNT(*)/COUNT(col)/
    * MIN/MAX over a mem table are served from per-batch statistics with a
    * zero-row scan (AggRuntimeSpec pins the plan: `AGG-PUSHED`, no
    * aggregate exec). The copy-on-write DELETE before the aggregate is
    * the honesty trap: survivors of the rewrite must carry EXACT stats —
    * inherited bounds would let `max(k)` report a deleted row, and the
    * oracle (which replays the delete relationally) would hash-break.
    * At 100 TB this is `SELECT count(*) FROM t` costing a metadata read
    * instead of a table scan — the first query every user runs.
    */
  val dsv2AggStats: QueryDef = QueryDef(
    "dsv2_agg_stats",
    """WITH ins AS (
      |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS v,
      |         CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderstatus END AS c
      |  FROM orders),
      |base AS (SELECT * FROM ins WHERE NOT (v < 2000000))
      |SELECT CAST(count(*) AS BIGINT) AS cnt, CAST(min(k) AS BIGINT) AS mn,
      |       CAST(max(k) AS BIGINT) AS mx, CAST(count(c) AS BIGINT) AS cc,
      |       CAST(min(v) AS BIGINT) AS mnv, CAST(max(v) AS BIGINT) AS mxv
      |FROM base""".stripMargin) { (spark, dir) =>
    val tbl = freshGraftTable(spark, "mem_orders_aggstats", "(k BIGINT, v BIGINT, c STRING)") // v0
    Tables.orders(spark, dir).select(
      col("o_orderkey").as("k"),
      Num.cents(col("o_totalprice")).as("v"),
      when(col("o_orderkey") % 3 === 0, lit(null)).otherwise(col("o_orderstatus")).as("c"))
      .writeTo(tbl).append() // v1
    spark.sql(s"DELETE FROM $tbl WHERE v < 2000000") // v2: CoW rewrite, fresh stats
    spark.sql(
      s"""SELECT count(*) AS cnt, min(k) AS mn, max(k) AS mx,
         |       count(c) AS cc, min(v) AS mnv, max(v) AS mxv
         |FROM $tbl""".stripMargin)
  }

  /** RUNTIME batch pruning through the gate: a selective dimension's keys
    * are pushed into the mem-table fact scan at EXECUTION time (the V2
    * dynamic-partition-pruning shape), and the fact's range-disjoint
    * batches outside the key span are never read — AggRuntimeSpec pins the
    * scan's output-row metric at one batch. The oracle replays the join
    * from the base tables, so over- OR under-pruning breaks the hash.
    */
  val dsv2RuntimePrune: QueryDef = QueryDef(
    "dsv2_runtime_prune",
    """WITH f AS (
      |  SELECT l_orderkey AS k,
      |         CAST(round(l_extendedprice * 100) AS BIGINT) AS v
      |  FROM lineitem),
      |m AS (SELECT max(k) AS mx FROM f),
      |d AS (SELECT o_orderkey AS k FROM orders, m
      |      WHERE o_orderkey > mx // 2 AND o_orderkey <= mx // 2 + 40)
      |SELECT f.k, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(f.v) AS BIGINT) AS tot
      |FROM f JOIN d ON f.k = d.k
      |GROUP BY f.k""".stripMargin) { (spark, dir) =>
    val tbl = freshGraftTable(spark, "mem_lineitem_rt", "(k BIGINT, v BIGINT)") // v0
    val f = Tables.lineitem(spark, dir).select(
      col("l_orderkey").as("k"),
      Num.cents(col("l_extendedprice")).as("v"))
    val mx = f.agg(max(col("k"))).head().getLong(0)
    // four range-disjoint batches: the dim's 40-key window hits one
    val edges = Seq(mx / 4, mx / 2, mx / 4 * 3)
    f.filter(col("k") <= edges(0)).coalesce(1).writeTo(tbl).append() // v1
    f.filter(col("k") > edges(0) && col("k") <= edges(1))
      .coalesce(1).writeTo(tbl).append() // v2
    f.filter(col("k") > edges(1) && col("k") <= edges(2))
      .coalesce(1).writeTo(tbl).append() // v3
    f.filter(col("k") > edges(2)).coalesce(1).writeTo(tbl).append() // v4
    val d = Tables.orders(spark, dir)
      .filter(col("o_orderkey") > mx / 2 && col("o_orderkey") <= mx / 2 + 40)
      .select(col("o_orderkey").as("dk"))
    spark.table(tbl)
      .join(broadcast(d), col("k") === col("dk"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("tot"))
  }

  /** The full CLUSTERED-TABLE contract through the gate: two mem tables
    * identity-partitioned on nation are sort-rewritten (`CALL
    * graft.rewrite_data_files(t, 'nk')`), so their scans report BOTH
    * `KeyGroupedPartitioning` and a per-partition sort order — the
    * merge-hinted join then plans with ZERO exchanges and ZERO sorts
    * (SortOrderSpec pins the plan; scan → merge join directly). The
    * oracle replays the raw per-row join from `customer` × `supplier`,
    * so a misgrouped or misordered merge (rows consumed out of order
    * drop or duplicate matches) breaks the hash, not just a plan
    * assertion.
    */
  val dsv2SpjSorted: QueryDef = QueryDef(
    "dsv2_spj_sorted",
    """WITH a AS (
      |  SELECT CAST(c_nationkey AS INTEGER) AS nk,
      |         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      |  FROM customer),
      |b AS (
      |  SELECT CAST(s_nationkey AS INTEGER) AS nk,
      |         CAST(round(s_acctbal * 100) AS BIGINT) AS scents
      |  FROM supplier)
      |SELECT a.nk, a.cents, b.scents
      |FROM a JOIN b ON a.nk = b.nk""".stripMargin) { (spark, dir) =>
    // child session for the same reason as dsv2_spj_join: the bucketing
    // conf must hold at (lazy) plan time without leaking to later queries
    val sess = spark.newSession()
    sess.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")
    sess.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    val spark2 = sess
    val (ta, tb) = ("graft.mem_cust_sorted", "graft.mem_supp_sorted")
    spark2.sql(s"DROP TABLE IF EXISTS $ta")
    spark2.sql(s"DROP TABLE IF EXISTS $tb")
    spark2.sql(s"CREATE TABLE $ta (nk INT, cents BIGINT) PARTITIONED BY (nk)")
    spark2.sql(s"CREATE TABLE $tb (nk INT, scents BIGINT) PARTITIONED BY (nk)")
    Tables.customer(spark2, dir).select(
      col("c_nationkey").cast("int").as("nk"),
      Num.cents(col("c_acctbal")).as("cents")).writeTo(ta).append()
    Tables.supplier(spark2, dir).select(
      col("s_nationkey").cast("int").as("nk"),
      Num.cents(col("s_acctbal")).as("scents")).writeTo(tb).append()
    spark2.sql("CALL graft.rewrite_data_files('mem_cust_sorted', 'nk')")
    spark2.sql("CALL graft.rewrite_data_files('mem_supp_sorted', 'nk')")
    spark2.sql(
      s"""SELECT /*+ MERGE(a) */ a.nk, a.cents, b.scents
         |FROM $ta a JOIN $tb b ON a.nk = b.nk""".stripMargin)
  }

  /** GROUPED metadata rollup through the gate: `GROUP BY` the identity
    * partition column of a partitioned mem table pushes down completely —
    * one result row per partition tuple, computed from per-batch stats
    * with a zero-row scan and no aggregate exec (AggRuntimeSpec pins the
    * plan and the declines: bucket/non-partition grouping columns, kills
    * under MIN/MAX). The copy-on-write DELETE first makes survivor-stats
    * freshness load-bearing per group. The oracle replays insert, delete,
    * and rollup relationally from `customer`.
    */
  val dsv2AggGroup: QueryDef = QueryDef(
    "dsv2_agg_group",
    """WITH ins AS (
      |  SELECT CAST(c_nationkey AS INTEGER) AS nk, c_custkey AS ck,
      |         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      |  FROM customer),
      |base AS (SELECT * FROM ins WHERE NOT (cents < 0))
      |SELECT nk, CAST(count(*) AS BIGINT) AS cnt, CAST(count(ck) AS BIGINT) AS cks,
      |       CAST(min(cents) AS BIGINT) AS mn, CAST(max(cents) AS BIGINT) AS mx
      |FROM base GROUP BY nk""".stripMargin) { (spark, dir) =>
    val tbl = freshGraftTable(spark, "mem_cust_agg_group", "(nk INT, ck BIGINT, cents BIGINT) PARTITIONED BY (nk)")
    Tables.customer(spark, dir).select(
      col("c_nationkey").cast("int").as("nk"),
      col("c_custkey").as("ck"),
      Num.cents(col("c_acctbal")).as("cents"))
      .writeTo(tbl).append() // v1
    spark.sql(s"DELETE FROM $tbl WHERE cents < 0") // v2: CoW, per-group fresh stats
    spark.sql(
      s"""SELECT nk, count(*) AS cnt, count(ck) AS cks,
         |       min(cents) AS mn, max(cents) AS mx
         |FROM $tbl GROUP BY nk""".stripMargin)
  }

  /** METADATA TABLES through the gate (the Iceberg `db.table.files` /
    * `db.table.partitions` convention, [[MemMetaTable]]): a partitioned
    * merge-on-read table takes two single-task appends and a DV DELETE,
    * then the query reads BOTH metadata relations — per-partition batch
    * and live-row counts, and per-commit-version batch counts with
    * live/deleted row sums from `.files`. The oracle replays the layout
    * relationally (a batch exists per (append, partition) slice with ≥1
    * row; DV deletes shrink live counts but never remove a batch), so a
    * metadata table that missed a batch, double-counted a DV kill, or
    * grouped partitions wrongly is a hash break. At 100 TB these views
    * are what an operator reads INSTEAD of listing files — fragmentation
    * and skew diagnosis at metadata cost.
    */
  val dsv2MetaTables: QueryDef = QueryDef(
    "dsv2_meta_tables",
    """WITH base AS (
      |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS v,
      |         o_orderkey % 4 AS nk
      |  FROM orders WHERE o_orderkey % 19 = 0),
      |r AS (SELECT k, v, nk,
      |        CAST(CASE WHEN k % 2 = 0 THEN 1 ELSE 2 END AS BIGINT) AS ver
      |      FROM base),
      |p AS (
      |  SELECT nk, CAST(count(DISTINCT ver) AS BIGINT) AS batches,
      |         CAST(SUM(CASE WHEN v >= 10000000 THEN 1 ELSE 0 END) AS BIGINT) AS live
      |  FROM r GROUP BY nk),
      |f AS (
      |  SELECT ver, CAST(count(DISTINCT nk) AS BIGINT) AS batches,
      |         CAST(SUM(CASE WHEN v >= 10000000 THEN 1 ELSE 0 END) AS BIGINT) AS live,
      |         CAST(SUM(CASE WHEN v < 10000000 THEN 1 ELSE 0 END) AS BIGINT) AS dead
      |  FROM r GROUP BY ver)
      |SELECT 'partitions' AS src, nk AS key, batches, live AS live_rows,
      |       CAST(0 AS BIGINT) AS deleted_rows
      |FROM p
      |UNION ALL
      |SELECT 'files', ver, batches, live, dead FROM f
      |UNION ALL
      |SELECT 'h:' || kind, version, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
      |       CAST(0 AS BIGINT)
      |FROM (VALUES (CAST(0 AS BIGINT), 'create'), (CAST(1 AS BIGINT), 'append'),
      |             (CAST(2 AS BIGINT), 'append'), (CAST(3 AS BIGINT), 'delete'))
      |  AS t(version, kind)""".stripMargin) { (spark, dir) =>
    val tbl = freshGraftTable(spark, "mem_meta_gate",
      "(k BIGINT, v BIGINT, nk BIGINT) PARTITIONED BY (nk) TBLPROPERTIES ('graft.delete-mode'='merge-on-read')") // v0
    val base = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 19 === 0)
      .select(col("o_orderkey").as("k"), Num.cents(col("o_totalprice")).as("v"),
        (col("o_orderkey") % 4).as("nk"))
    base.filter(col("k") % 2 === 0).coalesce(1).writeTo(tbl).append() // v1
    base.filter(col("k") % 2 === 1).coalesce(1).writeTo(tbl).append() // v2
    spark.sql(s"DELETE FROM $tbl WHERE v < 10000000") // v3: DV kills, no batch dies
    spark.sql(
      s"""SELECT 'partitions' AS src, nk AS key, batch_count AS batches,
         |       row_count AS live_rows, CAST(0 AS BIGINT) AS deleted_rows
         |FROM $tbl.partitions
         |UNION ALL
         |SELECT 'files', version, count(*), sum(live_rows), sum(deleted_rows)
         |FROM $tbl.files GROUP BY version
         |UNION ALL
         |SELECT concat('h:', kind), version, CAST(0 AS BIGINT),
         |       CAST(0 AS BIGINT), CAST(0 AS BIGINT)
         |FROM $tbl.history""".stripMargin)
  }

  /** LIMIT / TOP-N pushdown through the gate ([[MemScanBuilder.pushLimit]]
    * / [[MemScanBuilder.pushTopN]]): a sorted rewrite establishes the
    * ordering claim, then the query takes the ordered head (top-N trims
    * every batch to its first N live rows — LimitPushdownSpec pins the
    * scan-output metric) and a plain-LIMIT cardinality probe (`count(*)`
    * over an arbitrary 50-row head — the VALUE set is nondeterministic,
    * the COUNT is not, and an under-trimming scan that starved the head
    * breaks it). The oracle restates the ordered head relationally and
    * the cardinality as `least(50, count(*))`. At 100 TB these are the
    * `LIMIT 10` / `ORDER BY ts LIMIT 10` every user types first — served
    * by planning a batch, not the table.
    */
  val dsv2LimitTopn: QueryDef = QueryDef(
    "dsv2_limit_topn",
    """WITH base AS (
      |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders WHERE o_orderkey % 13 = 0)
      |SELECT 'top' AS part, k, v
      |FROM (SELECT k, v FROM base ORDER BY k LIMIT 100) t
      |UNION ALL
      |SELECT 'head',
      |  (SELECT CASE WHEN count(*) < 50 THEN count(*) ELSE 50 END FROM base),
      |  CAST(0 AS BIGINT)
      |UNION ALL
      |SELECT 'page',
      |  (SELECT greatest(0, CASE WHEN count(*) - 20 < 40 THEN count(*) - 20 ELSE 40 END)
      |   FROM base),
      |  CAST(0 AS BIGINT)""".stripMargin) { (spark, dir) =>
    val tbl = freshGraftTable(spark, "mem_limit_topn", "(k BIGINT, v BIGINT)") // v0
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 13 === 0)
      .select(col("o_orderkey").as("k"), Num.cents(col("o_totalprice")).as("v"))
      .writeTo(tbl).append() // v1: multi-task, several batches
    spark.sql(s"CALL graft.rewrite_data_files('mem_limit_topn', 'k')") // v2: claim
    spark.sql(
      s"""SELECT 'top' AS part, k, v
         |FROM (SELECT k, v FROM $tbl ORDER BY k LIMIT 100)
         |UNION ALL
         |SELECT 'head', count(*), CAST(0 AS BIGINT)
         |FROM (SELECT k FROM $tbl LIMIT 50)
         |UNION ALL
         |SELECT 'page', count(*), CAST(0 AS BIGINT)
         |FROM (SELECT k FROM $tbl LIMIT 40 OFFSET 20)""".stripMargin)
  }

  /** TABLE-AS-STREAM-SOURCE through the gate ([[MemTableMicroBatchStream]]
    * — the Delta `readStream.table` shape): run 1 streams the INITIAL
    * SNAPSHOT into a checkpointed parquet file sink; two more appends and
    * a compaction later, run 2 resumes from the SAME checkpoint and must
    * emit exactly the two appended windows — nothing re-emitted, the
    * compaction's physical replacements invisible. The sink APPENDS, so
    * any at-least-once slip (snapshot replayed, append double-planned,
    * compaction leaked) lands duplicate rows in `all` and breaks the
    * hash; a lost window breaks it the other way. The oracle restates
    * `snap` as the first slice and `all` as the union, each row exactly
    * once.
    */
  val dsv2TableStream: QueryDef = QueryDef(
    "dsv2_table_stream",
    """WITH base AS (
      |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders WHERE o_orderkey % 17 = 0)
      |SELECT 'snap' AS part, k, v FROM base WHERE k % 3 = 0
      |UNION ALL
      |SELECT 'all', k, v FROM base""".stripMargin) { (spark, dir) =>
    val tbl = freshGraftTable(spark, "mem_table_stream", "(k BIGINT, v BIGINT)") // v0
    val base = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 17 === 0)
      .select(col("o_orderkey").as("k"), Num.cents(col("o_totalprice")).as("v"))
    val out = graft.rentals.Scratch.dir(s"table_stream_out_${System.nanoTime()}")
    val cp = graft.rentals.Scratch.dir(s"table_stream_cp_${System.nanoTime()}")
    def run(): Unit = {
      val q = spark.readStream.table(tbl).writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    base.filter(col("k") % 3 === 0).writeTo(tbl).append() // v1
    run() // snapshot
    val snapDir = graft.rentals.Scratch.dir(s"table_stream_snap_${System.nanoTime()}")
    spark.read.parquet(out).write.mode("overwrite").parquet(snapDir)
    base.filter(col("k") % 3 === 1).writeTo(tbl).append() // v2
    spark.sql(s"CALL graft.compact_table('mem_table_stream')") // v3: invisible
    base.filter(col("k") % 3 === 2).writeTo(tbl).append() // v4
    run() // appended windows only
    spark.read.parquet(snapDir).select(lit("snap").as("part"), col("k"), col("v"))
      .unionAll(
        spark.read.parquet(out).select(lit("all").as("part"), col("k"), col("v")))
  }

  /** `MERGE ... WITH SCHEMA EVOLUTION` through the gate
    * (`TableCapability.AUTOMATIC_SCHEMA_EVOLUTION` + the AddColumn
    * evolution surface): the source carries a column the target lacks;
    * Spark's analyzer ALTERs the target (an ordinary 'alter' ledger
    * version — MergeEvolutionSpec pins the provenance and that pre-alter
    * time travel keeps the old schema) and the merge lands updates,
    * inserts, and the new column in one statement. The oracle replays
    * the evolved merge relationally: pre-existing unmatched rows read
    * NULL in the new column, matched rows take the source's values,
    * new rows insert whole.
    */
  val dsv2MergeEvolve: QueryDef = QueryDef(
    "dsv2_merge_evolve",
    """WITH base AS (
      |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders WHERE o_orderkey % 31 = 0),
      |t AS (SELECT k, v FROM base WHERE k % 2 = 0),
      |s AS (SELECT k, v + 5 AS v, 's' || CAST(k % 7 AS VARCHAR) AS note
      |      FROM base WHERE k % 3 = 0)
      |SELECT t.k, CASE WHEN s.k IS NOT NULL THEN s.v ELSE t.v END AS v,
      |       CASE WHEN s.k IS NOT NULL THEN s.note END AS note
      |FROM t LEFT JOIN s ON t.k = s.k
      |UNION ALL
      |SELECT k, v, note FROM s WHERE k NOT IN (SELECT k FROM t)""".stripMargin) {
    (spark, dir) =>
    val tbl = freshGraftTable(spark, "mem_merge_evolve", "(k BIGINT, v BIGINT)") // v0
    val base = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 31 === 0)
      .select(col("o_orderkey").as("k"), Num.cents(col("o_totalprice")).as("v"))
    base.filter(col("k") % 2 === 0).writeTo(tbl).append() // v1
    base.filter(col("k") % 3 === 0)
      .select(col("k"), (col("v") + lit(5L)).as("v"),
        concat(lit("s"), (col("k") % 7).cast("string")).as("note"))
      .createOrReplaceTempView("merge_evolve_src")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $tbl t
         |USING merge_evolve_src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin) // v2 alter + v3 merge
    spark.sql(s"SELECT k, v, note FROM $tbl")
  }

  /** DECLARED WRITE SORT ORDER through the gate (`TBLPROPERTIES
    * ('graft.sort-order'='k')`, [[MemTables.SortOrderProp]] — the Iceberg
    * `write.sort-order` shape): two UNSORTED appends ride the requested
    * write ordering, the publish VERIFIES each stored batch, and the
    * sorted-layout claim survives ingest — so the ordered head is
    * topN-trimmed at planning even after a merge-on-read DELETE
    * (kill-only: the claim holds, and the trim must count live rows
    * through the delete vectors — an off-by-dead trim loses head rows and
    * breaks the hash). The `sum` branch pins that nothing outside the
    * head was touched. At 100 TB this is the continuously-clustered
    * ingest table: every append keeps it merge-joinable and
    * head-trimmable with no rewrite in between.
    */
  val dsv2SortedIngest: QueryDef = QueryDef(
    "dsv2_sorted_ingest",
    """WITH base AS (
      |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders WHERE o_orderkey % 23 = 0),
      |live AS (SELECT k, v FROM base WHERE v >= 10000000)
      |SELECT 'top' AS part, k, v
      |FROM (SELECT k, v FROM live ORDER BY k LIMIT 50) t
      |UNION ALL
      |SELECT 'sum', CAST(count(*) AS BIGINT), CAST(sum(v) AS BIGINT) FROM live""".stripMargin) {
    (spark, dir) =>
    val tbl = freshGraftTable(spark, "mem_sorted_ingest",
      "(k BIGINT, v BIGINT) TBLPROPERTIES ('graft.sort-order'='k', 'graft.delete-mode'='merge-on-read')") // v0
    val base = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 23 === 0)
      .select(col("o_orderkey").as("k"), Num.cents(col("o_totalprice")).as("v"))
    base.filter(col("k") % 2 === 0).writeTo(tbl).append() // v1: sorted by request
    base.filter(col("k") % 2 === 1).writeTo(tbl).append() // v2: claim survives
    spark.sql(s"DELETE FROM $tbl WHERE v < 10000000") // v3: kill-only, claim holds
    spark.sql(
      s"""SELECT 'top' AS part, k, v
         |FROM (SELECT k, v FROM $tbl ORDER BY k LIMIT 50)
         |UNION ALL
         |SELECT 'sum', count(*), sum(v) FROM $tbl""".stripMargin)
  }

  /** Filtered + dynamic OVERWRITE through the gate (`OVERWRITE_BY_FILTER`
    * / `OVERWRITE_DYNAMIC` — Delta `replaceWhere` and hive dynamic-mode
    * semantics on the connector): a static-partition `INSERT OVERWRITE
    * ... PARTITION (nk = 1)` replaces exactly that partition's slice
    * (filter-kill + append in ONE version), then a dynamic
    * `overwritePartitions()` replaces exactly the tuples present in its
    * data (batch-granular — partition purity, no row evaluated). The
    * `pre` branch aggregates `VERSION AS OF 1`, so an overwrite that
    * leaked into another partition, copied history, or failed atomicity
    * breaks one of the two hashes. At 100 TB this is the
    * incremental-refresh primitive: a period's recomputation replaces its
    * own slice at slice cost.
    */
  val dsv2ReplaceWhere: QueryDef = QueryDef(
    "dsv2_replace_where",
    """WITH base AS (
      |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS v,
      |         o_orderkey % 4 AS nk
      |  FROM orders WHERE o_orderkey % 7 = 0),
      |p1 AS (SELECT k, v + 1000000 AS v, nk FROM base WHERE nk = 1 AND k % 3 = 0),
      |p2 AS (SELECT k, v + 2000000 AS v, nk FROM base WHERE nk = 2 AND k % 5 = 0),
      |cur AS (
      |  SELECT k, v, nk FROM base WHERE nk <> 1 AND nk <> 2
      |  UNION ALL SELECT k, v, nk FROM p1
      |  UNION ALL SELECT k, v, nk FROM p2)
      |SELECT 'cur' AS part, k, v, nk FROM cur
      |UNION ALL
      |SELECT 'pre', CAST(count(*) AS BIGINT), CAST(sum(v) AS BIGINT),
      |       CAST(0 AS BIGINT)
      |FROM base""".stripMargin) { (spark, dir) =>
    val tbl = freshGraftTable(spark, "mem_replace_where", "(k BIGINT, v BIGINT, nk BIGINT) PARTITIONED BY (nk)")
    val base = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey").as("k"), Num.cents(col("o_totalprice")).as("v"),
        (col("o_orderkey") % 4).as("nk"))
    base.writeTo(tbl).append() // v1
    base.createOrReplaceTempView("replace_where_base")
    spark.sql(
      s"""INSERT OVERWRITE $tbl PARTITION (nk = 1)
         |SELECT k, v + 1000000 FROM replace_where_base
         |WHERE nk = 1 AND k % 3 = 0""".stripMargin) // v2: static = filter kill
    base.filter(col("nk") === 2 && col("k") % 5 === 0)
      .select(col("k"), (col("v") + lit(2000000L)).as("v"), col("nk"))
      .writeTo(tbl).overwritePartitions() // v3: dynamic = tuple-granular
    spark.sql(
      s"""SELECT 'cur' AS part, k, v, nk FROM $tbl
         |UNION ALL
         |SELECT 'pre', count(*), sum(v), CAST(0 AS BIGINT)
         |FROM $tbl VERSION AS OF 1""".stripMargin)
  }

  /** CDC UPDATE PRE/POST-IMAGES through the gate (the Delta-CDF
    * `update_preimage`/`update_postimage` shape via
    * `option("updateImages", "true")`): the delta DML path records the
    * pre→post linkage at publish ([[MemTables.applyDelta]]), and the feed
    * surfaces image pairs instead of the default delete+insert log. The
    * oracle restates the append's inserts plus both image sets — a feed
    * that lost the linkage (plain delete/insert types), mislabeled a
    * non-update row, or drifted a value breaks the hash. Consumers that
    * want the old log just omit the option (UpdateImagesSpec pins the
    * byte-identical default).
    */
  val dsv2CdcUpdateImages: QueryDef = QueryDef(
    "dsv2_cdc_update_images",
    """WITH base AS (
      |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders WHERE o_orderkey % 37 = 0)
      |SELECT k, v, 'insert' AS _change_type, CAST(1 AS BIGINT) AS _commit_version
      |FROM base
      |UNION ALL
      |SELECT k, v, 'update_preimage', 2 FROM base WHERE k % 3 = 0
      |UNION ALL
      |SELECT k, v + 7, 'update_postimage', 2 FROM base WHERE k % 3 = 0""".stripMargin) {
    (spark, dir) =>
    val tbl = freshGraftTable(spark, "mem_cdc_images",
      "(k BIGINT, v BIGINT) TBLPROPERTIES ('graft.delete-mode'='merge-on-read')") // v0
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 37 === 0)
      .select(col("o_orderkey").as("k"), Num.cents(col("o_totalprice")).as("v"))
      .writeTo(tbl).append() // v1
    spark.sql(s"UPDATE $tbl SET v = v + 7 WHERE k % 3 = 0") // v2: delta path
    spark.read.format("graft.sources.MemChangesSource")
      .option("table", "mem_cdc_images")
      .option("from", "0").option("to", "2")
      .option("updateImages", "true")
      .load()
  }

  /** TIME-PARTITIONED table layout through the gate
    * (`PARTITIONED BY (months(d))`, [[MemTables.TimePart]] — the
    * reference's own hive `(StateName, year)` layout made first-class,
    * `jobs/io_utils.py:101,105`): orders land month-partitioned with
    * their RAW dates (no derived partition column anywhere), a dynamic
    * overwrite replaces exactly the February-1995 tuple with its even-key
    * half, and the month-range read prunes at planning on the raw date
    * predicate (the monotone-transform contract — TimePartitionSpec pins
    * the planned-partition counts). The oracle restates the
    * overwrite-then-read relationally from `orders`, so a tuple split
    * that misplaces a row, an overwrite that clips the wrong month, or a
    * pruning rule that drops a boundary day all break the hash. At
    * 100 TB time-partitioning is THE dominant layout: ingest by arrival,
    * query by range, expire by age — each costing its months, never the
    * table.
    */
  val dsv2TimePartition: QueryDef = QueryDef(
    "dsv2_time_partition",
    """WITH base AS (
      |  SELECT o_orderkey AS k, CAST(o_orderdate AS DATE) AS d,
      |         CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders),
      |repl AS (
      |  SELECT k, d, CAST(-1 AS BIGINT) AS v FROM base
      |  WHERE d >= DATE '1995-02-01' AND d < DATE '1995-03-01' AND k % 2 = 0),
      |final AS (
      |  SELECT * FROM base WHERE d < DATE '1995-02-01' OR d >= DATE '1995-03-01'
      |  UNION ALL SELECT * FROM repl)
      |SELECT 'win' AS part, k, d, v FROM final
      |WHERE d >= DATE '1995-01-15' AND d < DATE '1995-04-15'
      |UNION ALL
      |SELECT 'total', CAST(count(*) AS BIGINT), CAST(max(d) AS DATE),
      |       CAST(sum(v) AS BIGINT)
      |FROM final""".stripMargin) { (spark, dir) =>
    val tbl = freshGraftTable(spark, "mem_orders_bymonth",
      "(k BIGINT, d DATE, v BIGINT) PARTITIONED BY (months(d))") // v0
    val base = Tables.orders(spark, dir).select(
      col("o_orderkey").as("k"),
      col("o_orderdate").as("d"),
      Num.cents(col("o_totalprice")).as("v"))
    base.writeTo(tbl).append() // v1: clustered by months(d), tuple-pure split
    // dynamic overwrite: replaces exactly the month tuples present in the
    // incoming rows (February 1995), whole batches, no row evaluated
    base.filter(col("d") >= lit(java.sql.Date.valueOf("1995-02-01")) &&
        col("d") < lit(java.sql.Date.valueOf("1995-03-01")) &&
        col("k") % 2 === 0)
      .withColumn("v", lit(-1L))
      .writeTo(tbl).overwritePartitions() // v2
    spark.sql(
      s"""SELECT 'win' AS part, k, d, v FROM $tbl
         |WHERE d >= DATE '1995-01-15' AND d < DATE '1995-04-15'
         |UNION ALL
         |SELECT 'total', count(*), max(d), sum(v) FROM $tbl""".stripMargin)
  }

  /** PARTITION SPEC EVOLUTION through the gate (`CALL
    * graft.replace_partition_spec`, [[MemTables.replacePartitionSpec]] —
    * Iceberg's signature layout feature): customers land under spec A
    * (identity on nation), the spec evolves to bucket(8, custkey), and a
    * second append lands under spec B. Both eras stay readable and
    * PRUNABLE under their own written spec (`nk = 7` prunes era A via the
    * identity tuple, `ck = 42` prunes era B via the bucket hash —
    * SpecEvolutionSpec pins the planned counts and the SPJ decline on
    * mixed eras). The oracle restates both slices and the total from
    * `customer`: a tuple misread across eras or a row double-placed by the
    * evolution breaks the hash. At 100 TB spec evolution is what lets a
    * table re-layout for tomorrow's queries without rewriting yesterday's
    * petabytes.
    */
  val dsv2SpecEvolve: QueryDef = QueryDef(
    "dsv2_spec_evolve",
    """WITH base AS (
      |  SELECT c_custkey AS ck, CAST(c_nationkey AS INTEGER) AS nk,
      |         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      |  FROM customer)
      |SELECT 'nation' AS part, ck, nk, cents FROM base WHERE nk = 7
      |UNION ALL
      |SELECT 'key', ck, nk, cents FROM base WHERE ck = 42
      |UNION ALL
      |SELECT 'total', CAST(count(*) AS BIGINT), CAST(sum(nk) AS INTEGER),
      |       CAST(sum(cents) AS BIGINT)
      |FROM base""".stripMargin) { (spark, dir) =>
    val tbl = freshGraftTable(spark, "mem_cust_specevolve",
      "(ck BIGINT, nk INT, cents BIGINT) PARTITIONED BY (nk)") // v0, spec 0
    val base = Tables.customer(spark, dir).select(
      col("c_custkey").as("ck"),
      col("c_nationkey").cast("int").as("nk"),
      Num.cents(col("c_acctbal")).as("cents"))
    base.filter(col("nk") < 13).writeTo(tbl).append() // v1 under spec 0
    spark.sql(
      s"CALL graft.replace_partition_spec('mem_cust_specevolve', 'bucket(8, ck)')") // v2
    base.filter(col("nk") >= 13).writeTo(tbl).append() // v3 under spec 1
    spark.sql(
      s"""SELECT 'nation' AS part, ck, nk, cents FROM $tbl WHERE nk = 7
         |UNION ALL
         |SELECT 'key', ck, nk, cents FROM $tbl WHERE ck = 42
         |UNION ALL
         |SELECT 'total', count(*), CAST(sum(nk) AS INT), sum(cents) FROM $tbl""".stripMargin)
  }

  /** The FILE-BACKED storage plane through the gate
    * (`graft.storage=parquet`, [[MemTables.FileStore]]): orders land
    * month-partitioned as EXECUTOR-WRITTEN parquet files (the driver
    * commits manifests — path, count, tuple, bounds — never rows), a
    * merge-on-read DELETE overlays delete vectors on the files without
    * rewriting a byte, the distributed rewrite republishes
    * executor-written manifests (no driver row collect — the round-11
    * verdict's flagged ceiling), and the month-window read prunes on the
    * raw date predicate and STREAMS the files in the executors.
    * ParquetStorageSpec pins the architecture (every batch file-backed,
    * drop/expiry reclaim); this row pins the DATA: the oracle restates
    * delete + slice + total from `orders`, so a row lost to the
    * file/manifest hand-off anywhere in write→DV→rewrite→scan breaks the
    * hash. This is the storage plane a 100 TB deployment actually runs —
    * the driver-resident mode is the gate-scale default, this mode is the
    * scale path.
    */
  val dsv2ParquetStorage: QueryDef = QueryDef(
    "dsv2_parquet_storage",
    """WITH base AS (
      |  SELECT o_orderkey AS k, CAST(o_orderdate AS DATE) AS d,
      |         CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders),
      |kept AS (SELECT * FROM base WHERE NOT (v < 10000000))
      |SELECT 'win' AS part, k, d, v FROM kept
      |WHERE d >= DATE '1995-01-01' AND d < DATE '1995-07-01'
      |UNION ALL
      |SELECT 'total', CAST(count(*) AS BIGINT), CAST(max(d) AS DATE),
      |       CAST(sum(v) AS BIGINT)
      |FROM kept""".stripMargin) { (spark, dir) =>
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")
    val tbl = "graft.mem_orders_parquet"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, d DATE, v BIGINT) " +
      "PARTITIONED BY (months(d)) TBLPROPERTIES (" +
      "'graft.storage'='parquet', 'graft.delete-mode'='merge-on-read')") // v0
    Tables.orders(spark, dir).select(
      col("o_orderkey").as("k"),
      col("o_orderdate").as("d"),
      Num.cents(col("o_totalprice")).as("v"))
      .writeTo(tbl).append() // v1: executor files, manifest commit
    spark.sql(s"DELETE FROM $tbl WHERE v < 10000000") // v2: DVs over files
    spark.sql(s"CALL graft.rewrite_data_files('mem_orders_parquet', 'k')") // v3
    spark.sql(
      s"""SELECT 'win' AS part, k, d, v FROM $tbl
         |WHERE d >= DATE '1995-01-01' AND d < DATE '1995-07-01'
         |UNION ALL
         |SELECT 'total', count(*), max(d), sum(v) FROM $tbl""".stripMargin)
  }

  /** COLUMN DEFAULTS through the gate (`ALTER TABLE ... ADD COLUMN ...
    * DEFAULT`, [[MemTables.defaultFor]]): orders land, the table gains a
    * defaulted `src` column (metadata-only — the verdict's "DEFAULT-valued
    * evolution is the common warehouse shape"), and a second slice lands
    * with explicit values. Pre-alter rows must read the EXISTS default in
    * every surface the oracle touches — grouped counts over the column,
    * filters on the default value, and the pre-alter snapshot staying
    * bytes-identical under time travel. ColumnDefaultSpec pins the NOT
    * NULL write rejection and the DELETE-evaluator/skipping integration;
    * this row pins the data against DuckDB replaying the alter
    * relationally.
    */
  val dsv2ColumnDefault: QueryDef = QueryDef(
    "dsv2_column_default",
    """WITH base AS (
      |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders),
      |legacy AS (SELECT k, v, 'legacy' AS src FROM base),
      |fresh AS (SELECT k, v, 'fresh' AS src FROM base WHERE k % 7 = 0),
      |final AS (SELECT * FROM legacy UNION ALL SELECT * FROM fresh)
      |SELECT src AS part, CAST(count(*) AS BIGINT) AS c,
      |       CAST(sum(v) AS BIGINT) AS sv
      |FROM final GROUP BY src
      |UNION ALL
      |SELECT 'pre-alter', CAST(count(*) AS BIGINT), CAST(sum(v) AS BIGINT)
      |FROM base""".stripMargin) { (spark, dir) =>
    val tbl = freshGraftTable(spark, "mem_orders_default", "(k BIGINT, v BIGINT)") // v0
    val base = Tables.orders(spark, dir).select(
      col("o_orderkey").as("k"), Num.cents(col("o_totalprice")).as("v"))
    base.writeTo(tbl).append() // v1
    spark.sql(s"ALTER TABLE $tbl ADD COLUMN src STRING DEFAULT 'legacy'") // v2
    base.filter(col("k") % 7 === 0).withColumn("src", lit("fresh"))
      .writeTo(tbl).append() // v3
    spark.sql(
      s"""SELECT src AS part, count(*) AS c, sum(v) AS sv FROM $tbl GROUP BY src
         |UNION ALL
         |SELECT 'pre-alter', count(*), sum(v) FROM $tbl VERSION AS OF 1""".stripMargin)
  }

  /** CATALOG-OWNED VIEWS through the gate (`CALL graft.create_view` +
    * [[graft.plans.ResolveGraftViews]]): a view over the live orders
    * table and a view pinning a pre-delete snapshot via `VERSION AS OF`
    * read side by side — the stored SQL re-resolves at read, so the live
    * view tracks the DELETE while the pinned view replays history. The
    * oracle restates both relationally; ViewCatalogSpec pins the API
    * round-trip, the shadow guard, and restart survival. At 100 TB views
    * are the governance surface: the lakehouse catalog owning them (not
    * the session) is what makes them shareable across engines.
    */
  val dsv2ViewRead: QueryDef = QueryDef(
    "dsv2_view_read",
    """WITH base AS (
      |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders),
      |kept AS (SELECT * FROM base WHERE NOT (v < 15000000))
      |SELECT 'live' AS part, CAST(count(*) AS BIGINT) AS c,
      |       CAST(sum(v) AS BIGINT) AS sv
      |FROM kept WHERE k % 2 = 0
      |UNION ALL
      |SELECT 'pinned', CAST(count(*) AS BIGINT), CAST(sum(v) AS BIGINT)
      |FROM base WHERE k % 2 = 0""".stripMargin) { (spark, dir) =>
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")
    val tbl = "graft.mem_orders_viewed"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    MemViews.views.remove("orders_even_live")
    MemViews.views.remove("orders_even_pinned")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v BIGINT)") // v0
    Tables.orders(spark, dir).select(
      col("o_orderkey").as("k"), Num.cents(col("o_totalprice")).as("v"))
      .writeTo(tbl).append() // v1
    spark.sql("CALL graft.create_view('orders_even_live', " +
      s"'SELECT k, v FROM $tbl WHERE k % 2 = 0')")
    spark.sql("CALL graft.create_view('orders_even_pinned', " +
      s"'SELECT k, v FROM $tbl VERSION AS OF 1 WHERE k % 2 = 0')")
    spark.sql(s"DELETE FROM $tbl WHERE v < 15000000") // v2: live view shrinks
    spark.sql(
      """SELECT 'live' AS part, count(*) AS c, sum(v) AS sv
        |FROM graft.orders_even_live
        |UNION ALL
        |SELECT 'pinned', count(*), sum(v) FROM graft.orders_even_pinned""".stripMargin)
  }

  /** The SHARED CATALOG SERVICE through the gate ([[CatalogServer]]/
    * [[CatalogClient]] — the Iceberg-REST-catalog shape): a live HTTP
    * service over the warehouse becomes the commit AUTHORITY, and a full
    * table lifecycle (create → append → merge-on-read DELETE → read)
    * runs with every mutable pointer commit routed through it; data and
    * manifest files keep going direct to storage. The output pins the
    * PROTOCOL alongside the data: the `protocol` row's flags record that
    * the lifecycle's >=3 pointer commits actually went through the
    * service, that the service lists the committed table, and that it
    * serves the current metadata document — while the `nation` rows pin
    * the data against DuckDB replaying the delete relationally. At
    * 100 TB this is how a FLEET of drivers shares one warehouse: a
    * single arbiter serializes optimistic commits, so CAS holds even on
    * stores with no conditional-PUT primitive. RestCatalogSpec pins the
    * failure modes (409 reload-retry, warehouse guardrail, fail-loud on
    * an unreachable service, cross-driver freshness).
    */
  val dsv2RestCatalog: QueryDef = QueryDef(
    "dsv2_rest_catalog",
    """WITH base AS (
      |  SELECT c_custkey AS k, CAST(c_nationkey AS BIGINT) AS nk,
      |         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      |  FROM customer),
      |kept AS (SELECT * FROM base WHERE nk <> 13)
      |SELECT 'nation' AS part, nk, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(cents) AS BIGINT) AS sv
      |FROM kept GROUP BY nk
      |UNION ALL
      |SELECT 'protocol', CAST(1 AS BIGINT), CAST(1 AS BIGINT),
      |       CAST(1 AS BIGINT)""".stripMargin) { (spark, dir) =>
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")
    val tbl = "graft.mem_cust_rest"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val server = new CatalogServer(MemTables.tablesRoot.getAbsolutePath).start()
    MetaIO.useRestCatalog(server.uri)
    try {
      spark.sql(s"CREATE TABLE $tbl (k BIGINT, nk BIGINT, cents BIGINT) " +
        "TBLPROPERTIES ('graft.storage'='parquet', " +
        "'graft.delete-mode'='merge-on-read')") // v0: commit 1
      Tables.customer(spark, dir).select(
        col("c_custkey").as("k"),
        col("c_nationkey").cast("long").as("nk"),
        Num.cents(col("c_acctbal")).as("cents"))
        .writeTo(tbl).append() // v1: commit 2
      spark.sql(s"DELETE FROM $tbl WHERE nk = 13") // v2 (DVs): commit 3
      // protocol flags, computed WHILE the service is the authority
      val routed = server.commitCount.get >= 3
      val client = new CatalogClient(server.uri)
      val listed = client.listTables().contains("mem_cust_rest")
      val served = MemTables.get("mem_cust_rest").get.storageDir
        .exists(d => client.readCurrent(d, TableMetadata.FileName).nonEmpty)
      val out = spark.sql(
        s"""SELECT 'nation' AS part, nk, count(*) AS n, sum(cents) AS sv
           |FROM $tbl GROUP BY nk
           |UNION ALL
           |SELECT 'protocol', CAST(${if (routed) 1 else 0} AS BIGINT),
           |       CAST(${if (listed) 1 else 0} AS BIGINT),
           |       CAST(${if (served) 1 else 0} AS BIGINT)""".stripMargin)
      // materialize the (small, aggregated) result WHILE the service is
      // the authority, so the returned plan has no read-after-teardown
      val rows = out.collect().toSeq
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), out.schema)
    } finally {
      MetaIO.useLocalCatalog()
      server.stop()
    }
  }

  /** The DURABLE METADATA PLANE through the gate ([[TableMetadata]] +
    * `CALL graft.unload_table` + disk recovery): the restart-survival
    * drill of the table format, run twice mid-lifecycle. Orders land
    * file-backed and month-partitioned, a merge-on-read DELETE overlays
    * delete vectors, a tag pins the pre-delete snapshot — then the
    * in-memory state is DROPPED and every later statement (ALTER ADD
    * COLUMN DEFAULT, a second append, the final read) runs against the
    * state recovered from `metadata.json` beside the data files. A
    * second unload lands right before the read, so the measured query
    * itself plans off recovered manifests: version ledger, DVs, schema
    * eras, EXISTS defaults, refs, and time stamps all came off disk. The
    * oracle restates the full lifecycle relationally — any field the
    * recovery misplaces (a DV entry, a default, the tag's version)
    * breaks the hash. At 100 TB this IS the difference between a table
    * format and an in-memory model of one: the engine owning the files
    * can restart, scale out, or hand the table to another driver, because
    * the metadata document — not the process — is the source of truth.
    * MetadataPersistSpec pins the protocol details (branch stages, epoch
    * ledgers, spec timelines surviving recovery).
    */
  val dsv2MetadataPersist: QueryDef = QueryDef(
    "dsv2_metadata_persist",
    """WITH base AS (
      |  SELECT o_orderkey AS k, CAST(o_orderdate AS DATE) AS d,
      |         CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders),
      |kept AS (SELECT * FROM base WHERE NOT (v < 12000000)),
      |legacy AS (SELECT k, d, v, 'legacy' AS src FROM kept),
      |fresh AS (SELECT k, d, v, 'fresh' AS src FROM base WHERE k % 5 = 0),
      |fin AS (SELECT * FROM legacy UNION ALL SELECT * FROM fresh)
      |SELECT src AS part, CAST(count(*) AS BIGINT) AS c,
      |       CAST(sum(v) AS BIGINT) AS sv
      |FROM fin GROUP BY src
      |UNION ALL
      |SELECT 'tagged', CAST(count(*) AS BIGINT), CAST(sum(v) AS BIGINT)
      |FROM base
      |UNION ALL
      |SELECT 'win', CAST(count(*) AS BIGINT), CAST(sum(v) AS BIGINT)
      |FROM fin WHERE d >= DATE '1995-01-01' AND d < DATE '1995-07-01'""".stripMargin) {
    (spark, dir) =>
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")
    val tbl = "graft.mem_orders_durable"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, d DATE, v BIGINT) " +
      "PARTITIONED BY (months(d)) TBLPROPERTIES (" +
      "'graft.storage'='parquet', 'graft.delete-mode'='merge-on-read')") // v0
    val base = Tables.orders(spark, dir).select(
      col("o_orderkey").as("k"),
      col("o_orderdate").as("d"),
      Num.cents(col("o_totalprice")).as("v"))
    base.writeTo(tbl).append() // v1: executor files + durable manifests
    spark.sql(s"CALL graft.create_tag('mem_orders_durable', 'pre', 1)")
    spark.sql(s"DELETE FROM $tbl WHERE v < 12000000") // v2: DVs over files
    // RESTART #1: every statement below runs on disk-recovered state
    spark.sql(s"CALL graft.unload_table('mem_orders_durable')")
    spark.sql(s"ALTER TABLE $tbl ADD COLUMN src STRING DEFAULT 'legacy'") // v3
    base.filter(col("k") % 5 === 0).withColumn("src", lit("fresh"))
      .writeTo(tbl).append() // v4
    // RESTART #2: the measured read itself plans off recovered manifests
    spark.sql(s"CALL graft.unload_table('mem_orders_durable')")
    spark.sql(
      s"""SELECT src AS part, count(*) AS c, sum(v) AS sv FROM $tbl GROUP BY src
         |UNION ALL
         |SELECT 'tagged', count(*), sum(v) FROM $tbl VERSION AS OF 'pre'
         |UNION ALL
         |SELECT 'win', count(*), sum(v) FROM $tbl
         |WHERE d >= DATE '1995-01-01' AND d < DATE '1995-07-01'""".stripMargin)
  }

  /** STORAGE MIGRATION through the gate (`CALL graft.migrate_storage`,
    * [[MemTables.migrateStorage]]): a deliberately DRIVER-RESIDENT table
    * (explicit `'graft.storage'=''`... the property must be absent, so
    * the create names no storage and the session default is overridden
    * by building it under a scoped conf) accumulates real history —
    * append, MoR DELETE, overwrite — then promotes onto the file-backed
    * plane in place: every batch (history included) becomes a parquet
    * file + manifest, no version is minted, and the table ACQUIRES
    * durability (the measured read runs after an unload, off recovered
    * metadata). The oracle restates the final state and the pre-migration
    * snapshot relationally — a row lost or a DV misplaced in the
    * conversion breaks the hash. This is the operational on-ramp a
    * deployment uses to move yesterday's driver-resident tables onto the
    * scale plane without recreating them.
    */
  val dsv2MigrateStorage: QueryDef = QueryDef(
    "dsv2_migrate_storage",
    """WITH base AS (
      |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders),
      |kept AS (SELECT * FROM base WHERE NOT (v < 14000000)),
      |fresh AS (SELECT k, v FROM base WHERE k % 3 = 0),
      |fin AS (SELECT * FROM kept UNION ALL SELECT * FROM fresh)
      |SELECT 'now' AS part, CAST(count(*) AS BIGINT) AS c,
      |       CAST(sum(v) AS BIGINT) AS sv
      |FROM fin
      |UNION ALL
      |SELECT 'pre-delete', CAST(count(*) AS BIGINT), CAST(sum(v) AS BIGINT)
      |FROM base""".stripMargin) { (spark, dir) =>
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")
    val tbl = "graft.mem_orders_migrate"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    // start DRIVER-RESIDENT on purpose (the migration's whole premise),
    // overriding the session's parquet default for this one create
    val prior = spark.conf.getOption(SeqCatalog.DefaultStorageConf)
    spark.conf.unset(SeqCatalog.DefaultStorageConf)
    try {
      spark.sql(s"CREATE TABLE $tbl (k BIGINT, v BIGINT) " +
        "TBLPROPERTIES ('graft.delete-mode'='merge-on-read')") // v0
    } finally prior.foreach(spark.conf.set(SeqCatalog.DefaultStorageConf, _))
    val base = Tables.orders(spark, dir).select(
      col("o_orderkey").as("k"), Num.cents(col("o_totalprice")).as("v"))
    base.writeTo(tbl).append() // v1: driver-resident batches
    spark.sql(s"DELETE FROM $tbl WHERE v < 14000000") // v2: DVs
    spark.sql(s"CALL graft.migrate_storage('mem_orders_migrate', 'parquet')")
    base.filter(col("k") % 3 === 0).writeTo(tbl).append() // v3: lands as files
    // durability drill: the measured read plans off recovered metadata
    spark.sql(s"CALL graft.unload_table('mem_orders_migrate')")
    spark.sql(
      s"""SELECT 'now' AS part, count(*) AS c, sum(v) AS sv FROM $tbl
         |UNION ALL
         |SELECT 'pre-delete', count(*), sum(v) FROM $tbl VERSION AS OF 1""".stripMargin)
  }

  /** MULTI-DIMENSIONAL CLUSTERING through the gate
    * (`CALL graft.rewrite_data_files('t', 'zorder(a, b)')`,
    * [[graft.functions.ZOrder2]] + [[RewriteJobs]]): orders land keyed by
    * (order key, price), the rewrite re-clusters on the Morton
    * interleave of both range-scaled coordinates, and the measured query
    * windows each dimension INDEPENDENTLY — both prune via per-batch
    * min/max bounds the Z-layout tightened (ParquetStorageSpec pins the
    * planned-partition counts; this row pins the data against the
    * oracle's relational restatement). The 100 TB story: a single-column
    * sort serves one predicate family; Z-ordering serves two at ~√ the
    * per-dimension resolution, which is why every warehouse format ships
    * it for two-column scan patterns.
    */
  val dsv2ZorderRewrite: QueryDef = QueryDef(
    "dsv2_zorder_rewrite",
    """WITH base AS (
      |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders)
      |SELECT 'kwin' AS part, CAST(count(*) AS BIGINT) AS c,
      |       CAST(sum(v) AS BIGINT) AS sv
      |FROM base WHERE k < 1000
      |UNION ALL
      |SELECT 'vwin', CAST(count(*) AS BIGINT), CAST(sum(v) AS BIGINT)
      |FROM base WHERE v >= 10000000 AND v < 20000000
      |UNION ALL
      |SELECT 'total', CAST(count(*) AS BIGINT), CAST(sum(v) AS BIGINT)
      |FROM base""".stripMargin) { (spark, dir) =>
    val tbl = freshGraftTable(spark, "mem_orders_zorder",
      "(k BIGINT, v BIGINT) TBLPROPERTIES ('graft.storage'='parquet')") // v0
    Tables.orders(spark, dir).select(
      col("o_orderkey").as("k"), Num.cents(col("o_totalprice")).as("v"))
      .writeTo(tbl).append() // v1
    spark.sql(s"CALL graft.rewrite_data_files('mem_orders_zorder', 'zorder(k, v)')")
    spark.sql(
      s"""SELECT 'kwin' AS part, count(*) AS c, sum(v) AS sv
         |FROM $tbl WHERE k < 1000
         |UNION ALL
         |SELECT 'vwin', count(*), sum(v)
         |FROM $tbl WHERE v >= 10000000 AND v < 20000000
         |UNION ALL
         |SELECT 'total', count(*), sum(v) FROM $tbl""".stripMargin)
  }

  /** PER-BATCH BLOOM SKIPPING through the gate
    * (`'graft.bloom-columns'='k'`, [[MemTables.BloomColsProp]] /
    * [[BatchBloom]]): orders land UNSORTED across several appends — every
    * batch's o_orderkey min/max spans the whole domain, so bounds prune
    * nothing — and the measured query is point lookups: present keys,
    * and a key that exists in no batch (which the registers prove absent
    * at planning; BloomSkippingSpec pins planned-partitions = 0 for it
    * and < total for present keys). The oracle restates the lookups
    * relationally. At 100 TB this is the parquet column-bloom story: the
    * one skipping structure that serves `key = ?` on a column the layout
    * is neither sorted nor partitioned by.
    */
  val dsv2BloomSkipping: QueryDef = QueryDef(
    "dsv2_bloom_skipping",
    """WITH base AS (
      |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders),
      |probes AS (
      |  SELECT k, v FROM base WHERE k IN (1, 7, 32, 33)
      |  UNION ALL
      |  SELECT k, v FROM base WHERE k = -12345)
      |SELECT CAST(count(*) AS BIGINT) AS hits, CAST(sum(v) AS BIGINT) AS sv,
      |       CAST(min(k) AS BIGINT) AS mink, CAST(max(k) AS BIGINT) AS maxk
      |FROM probes""".stripMargin) { (spark, dir) =>
    val tbl = freshGraftTable(spark, "mem_orders_bloom",
      "(k BIGINT, v BIGINT) TBLPROPERTIES ('graft.bloom-columns'='k')") // v0
    val base = Tables.orders(spark, dir).select(
      col("o_orderkey").as("k"), Num.cents(col("o_totalprice")).as("v"))
    // three interleaved slices: every batch spans the key domain
    for (r <- 0 to 2)
      base.filter(col("k") % 3 === r).writeTo(tbl).append() // v1..v3
    spark.sql(
      s"""WITH probes AS (
         |  SELECT k, v FROM $tbl WHERE k IN (1, 7, 32, 33)
         |  UNION ALL
         |  SELECT k, v FROM $tbl WHERE k = -12345)
         |SELECT count(*) AS hits, sum(v) AS sv,
         |       min(k) AS mink, max(k) AS maxk
         |FROM probes""".stripMargin)
  }

  /** INCREMENTAL MATERIALIZED VIEW over the change feed ([[MatViews]]):
    * materialize a filtered per-priority rollup (count/count(x)/sum/avg)
    * at the source's first snapshot, then append, UPDATE, and DELETE an
    * entire group out of the source, and refresh ONCE. The refresh must
    * run INCREMENTALLY (mode + exact `(watermark, current]` window are
    * part of the hash) — it reads only the three-commit change window,
    * folds it into per-group deltas, and MERGEs them into the store,
    * deleting the dead group. The oracle restates the final aggregate
    * from `orders` by replaying the same mutations relationally, so a
    * wrong delta sign, a missed NULL-input row, a leaked dead group, or
    * a silent full-recompute fallback all break the row set or the mode
    * column. The avg column travels as `floor(av * 10000)` — the view
    * projects `sum/count` in exact double arithmetic, restated
    * identically in the oracle. At 100 TB this is the derived-table
    * story: the nightly rollup refresh costs the day's commits, not the
    * table scan.
    */
  val dsv2IncrementalMv: QueryDef = QueryDef(
    "dsv2_incremental_mv",
    """WITH base AS (
      |  SELECT o_orderkey AS k, o_orderpriority AS g,
      |         CASE WHEN o_orderkey % 13 = 0 THEN NULL
      |              ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS v
      |  FROM orders WHERE o_orderkey % 11 = 0),
      |upd AS (SELECT k, g, CASE WHEN k % 5 = 0 THEN v + 50 ELSE v END AS v FROM base),
      |fin AS (SELECT * FROM upd WHERE g <> '1-URGENT'),
      |mv AS (
      |  SELECT g, CAST(count(*) AS BIGINT) AS n, CAST(count(v) AS BIGINT) AS nv,
      |         CAST(sum(v) AS BIGINT) AS sv,
      |         CAST(floor((CAST(sum(v) AS DOUBLE) / count(v)) * 10000) AS BIGINT) AS av4
      |  FROM fin WHERE k % 3 <> 0 GROUP BY g)
      |SELECT g, n, nv, sv, av4, 'incremental' AS mode,
      |       CAST(1 AS BIGINT) AS from_version, CAST(4 AS BIGINT) AS to_version
      |FROM mv""".stripMargin) { (spark, dir) =>
    MatViews.drop("mv_rev") // idempotent re-run: clear view + store
    val tbl = freshGraftTable(spark, "mem_mv_orders", "(k BIGINT, g STRING, v BIGINT)") // v0
    val base = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 11 === 0)
      .select(col("o_orderkey").as("k"), col("o_orderpriority").as("g"),
        when(col("o_orderkey") % 13 === 0, lit(null))
          .otherwise(Num.cents(col("o_totalprice"))).as("v"))
    base.filter(col("k") % 2 === 0).writeTo(tbl).append() // v1
    spark.sql("CALL graft.create_materialized_view('mv_rev', " +
      "'SELECT g, count(*) AS n, count(v) AS nv, sum(v) AS sv, avg(v) AS av " +
      "FROM graft.mem_mv_orders WHERE k % 3 <> 0 GROUP BY g')") // watermark = 1
    base.filter(col("k") % 2 === 1).writeTo(tbl).append() // v2
    spark.sql(s"UPDATE $tbl SET v = v + 50 WHERE k % 5 = 0") // v3
    spark.sql(s"DELETE FROM $tbl WHERE g = '1-URGENT'") // v4: group death
    val refresh = spark.sql("CALL graft.refresh_materialized_view('mv_rev')")
      .select(col("mode"), col("from_version"), col("to_version"))
    spark.sql("SELECT g, n, nv, sv, CAST(floor(av * 10000) AS BIGINT) AS av4 " +
      "FROM graft.mv_rev")
      .crossJoin(refresh)
  }

  /** MV QUERY REWRITE ([[graft.plans.RewriteAggToMatView]]) — the read
    * half of materialized views, pinned END-TO-END: after creating a
    * fresh MV, the ORIGINAL aggregate (narrowed by an extra group-column
    * predicate) must be answered from the pre-aggregated store, not the
    * source. The executed plan is part of the hash: `served_from_store`
    * is computed from the actual scan list (store scanned, source NOT),
    * so a silently disabled or mismatched rewrite fails the oracle even
    * though the VALUES would be identical either way — which is also the
    * correctness half: the oracle recomputes the aggregate from `orders`
    * directly, so a rewrite that changed any value breaks the hash too.
    * At 100 TB this is interactive-dashboard economics: the rollup query
    * costs |groups| rows instead of a table scan.
    */
  val dsv2MvRewrite: QueryDef = QueryDef(
    "dsv2_mv_rewrite",
    """WITH base AS (
      |  SELECT o_orderkey AS k, o_orderpriority AS g,
      |         CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders WHERE o_orderkey % 7 = 0),
      |mv AS (
      |  SELECT g, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS sv
      |  FROM base WHERE k % 3 <> 0 GROUP BY g)
      |SELECT g, n, sv, TRUE AS served_from_store FROM mv
      |WHERE g IN ('1-URGENT', '3-MEDIUM', '5-LOW')""".stripMargin) { (spark, dir) =>
    MatViews.drop("mv_q")
    val tbl = freshGraftTable(spark, "mem_mvq_orders", "(k BIGINT, g STRING, v BIGINT)")
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey").as("k"), col("o_orderpriority").as("g"),
        Num.cents(col("o_totalprice")).as("v"))
      .writeTo(tbl).append() // v1
    spark.sql("CALL graft.create_materialized_view('mv_q', " +
      "'SELECT g, count(*) AS n, sum(v) AS sv " +
      "FROM graft.mem_mvq_orders WHERE k % 3 <> 0 GROUP BY g')") // fresh at v1
    val agg = spark.sql(
      s"""SELECT g, count(*) AS n, sum(v) AS sv FROM $tbl
         |WHERE k % 3 <> 0 AND g IN ('1-URGENT', '3-MEDIUM', '5-LOW')
         |GROUP BY g""".stripMargin)
    val scans = agg.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        s.table.name()
    }
    val servedFromStore =
      scans.contains("mv_q__store") && !scans.contains("mem_mvq_orders")
    agg.withColumn("served_from_store", lit(servedFromStore))
  }

  /** OUTER-shape MV serving through the gate
    * ([[graft.plans.RewriteAggToMatView]]'s outer-step signature): two
    * MVs over the SAME fact/dim pair — one RIGHT JOIN, one FULL OUTER —
    * each serve exactly their own query shape from their own store. The
    * oracle recomputes both outer joins relationally in DuckDB, so a
    * serve that confuses the stores (each kept DIFFERENT null-extension
    * rows), drops an extension group, or silently stops firing breaks
    * the hash — both `served` flags are plan-derived and hashed. The dim
    * keeps only `c_custkey % 3 <> 0`, so the FULL side carries genuine
    * fact-orphan rows (NULL seg group) alongside the RIGHT side's
    * order-less customers. At 100 TB outer-join MVs are the
    * slowly-changing-dimension dashboards — rewrite serving is what
    * makes maintaining them pay off on the read path. JoinMvSpec pins
    * the shape discrimination details (RIGHT vs FULL vs INNER vs
    * chain-length mismatches all decline).
    */
  val dsv2MvOuterServe: QueryDef = QueryDef(
    "dsv2_mv_outer_serve",
    """WITH fact AS (
      |  SELECT o_orderkey AS k, o_custkey AS ck,
      |         CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders WHERE o_orderkey % 5 = 0),
      |dim AS (
      |  SELECT c_custkey AS dk, c_mktsegment AS seg
      |  FROM customer WHERE c_custkey % 3 <> 0)
      |SELECT 'right' AS part, seg, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(v) AS BIGINT) AS sv, TRUE AS served
      |FROM fact RIGHT JOIN dim ON ck = dk GROUP BY seg
      |UNION ALL
      |SELECT 'full', seg, CAST(count(*) AS BIGINT),
      |       CAST(sum(v) AS BIGINT), TRUE
      |FROM fact FULL JOIN dim ON ck = dk GROUP BY seg""".stripMargin) { (spark, dir) =>
    MatViews.drop("mv_osrv_r"); MatViews.drop("mv_osrv_f")
    val fact = freshGraftTable(spark, "mem_osrv_fact", "(k BIGINT, ck BIGINT, v BIGINT)")
    val dim = freshGraftTable(spark, "mem_osrv_dim", "(dk BIGINT, seg STRING)")
    Tables.orders(spark, dir).filter(col("o_orderkey") % 5 === 0)
      .select(col("o_orderkey").as("k"), col("o_custkey").as("ck"),
        Num.cents(col("o_totalprice")).as("v"))
      .writeTo(fact).append()
    Tables.customer(spark, dir).filter(col("c_custkey") % 3 =!= 0)
      .select(col("c_custkey").as("dk"), col("c_mktsegment").as("seg"))
      .writeTo(dim).append()
    spark.sql("CALL graft.create_materialized_view('mv_osrv_r', " +
      s"'SELECT seg, count(*) AS n, sum(v) AS sv FROM $fact " +
      s"RIGHT JOIN $dim ON ck = dk GROUP BY seg')")
    spark.sql("CALL graft.create_materialized_view('mv_osrv_f', " +
      s"'SELECT seg, count(*) AS n, sum(v) AS sv FROM $fact " +
      s"FULL OUTER JOIN $dim ON ck = dk GROUP BY seg')")
    val rightQ = spark.sql(s"SELECT seg, count(*) AS n, sum(v) AS sv " +
      s"FROM $fact RIGHT JOIN $dim ON ck = dk GROUP BY seg")
    val fullQ = spark.sql(s"SELECT seg, count(*) AS n, sum(v) AS sv " +
      s"FROM $fact FULL OUTER JOIN $dim ON ck = dk GROUP BY seg")
    def servedOnly(df: DataFrame, store: String): Boolean = {
      val scans = scannedTables(df)
      scans.contains(store) && !scans.exists(_.startsWith("mem_osrv_"))
    }
    rightQ.select(lit("right").as("part"), col("seg"), col("n"), col("sv"),
        lit(servedOnly(rightQ, "mv_osrv_r__store")).as("served"))
      .unionAll(fullQ.select(lit("full"), col("seg"), col("n"), col("sv"),
        lit(servedOnly(fullQ, "mv_osrv_f__store"))))
  }

  /** Scanned table names of an executed plan, AQE subtrees included — a
    * rollup replacement aggregates the store, and the exchange hides the
    * scan inside an AdaptiveSparkPlanExec that plain collect() skips.
    */
  private def scannedTables(df: DataFrame): Seq[String] = {
    def go(pl: org.apache.spark.sql.execution.SparkPlan): Seq[String] = pl match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        go(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => go(q.plan)
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        Seq(b.table.name())
      case other => other.children.flatMap(go)
    }
    go(df.queryExecution.executedPlan)
  }

  /** MV ROLLUP serving ([[graft.plans.RewriteAggToMatView]]'s coarser-
    * grain path): a query grouping a PROPER SUBSET of the MV's grain —
    * here `GROUP BY g` and the GLOBAL set against an MV at `(g, m)` —
    * re-aggregates the store (sum-of-sums, sum-of-counts, recomposed avg,
    * min-of-mins) instead of re-scanning the source, WITH an extra
    * predicate on the grain column the query dropped (`m IN (1,2)`
    * selects whole finer groups below the rollup). Both serve flags are
    * plan-derived and part of the oracle hash, and the oracle recomputes
    * everything from `orders` directly — a value changed by the rollup
    * (avg-of-avgs instead of recomposition, a lost NULL group) breaks the
    * hash, and so does a rewrite that silently stopped firing. At 100 TB
    * one MV at the fine grain serves the whole dashboard drill-down
    * hierarchy above it — |MV groups| rows in, never the table.
    */
  val dsv2MvRollup: QueryDef = QueryDef(
    "dsv2_mv_rollup",
    """WITH base AS (
      |  SELECT o_orderkey AS k, o_orderpriority AS g,
      |         CAST(o_orderkey % 4 AS BIGINT) AS m,
      |         CASE WHEN o_orderkey % 17 = 0 THEN NULL
      |              ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS v
      |  FROM orders WHERE o_orderkey % 5 = 0),
      |coarse AS (
      |  SELECT g, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS sv,
      |         CASE WHEN count(v) = 0 THEN NULL
      |              ELSE CAST(sum(v) AS DOUBLE) / CAST(count(v) AS DOUBLE) END AS av,
      |         CAST(min(v) AS BIGINT) AS lo
      |  FROM base WHERE m IN (1, 2) GROUP BY g),
      |total AS (
      |  SELECT CAST(count(*) AS BIGINT) AS t_n, CAST(sum(v) AS BIGINT) AS t_sv
      |  FROM base)
      |SELECT g, n, sv, av, lo, t_n, t_sv,
      |       TRUE AS rollup_served, TRUE AS global_served
      |FROM coarse CROSS JOIN total""".stripMargin) { (spark, dir) =>
    MatViews.drop("mv_r")
    val tbl = freshGraftTable(spark, "mem_mvr_orders",
      "(k BIGINT, g STRING, m BIGINT, v BIGINT)")
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 5 === 0)
      .select(col("o_orderkey").as("k"), col("o_orderpriority").as("g"),
        (col("o_orderkey") % 4).cast("long").as("m"),
        when(col("o_orderkey") % 17 === 0, lit(null))
          .otherwise(Num.cents(col("o_totalprice"))).as("v"))
      .writeTo(tbl).append() // v1
    spark.sql("CALL graft.create_materialized_view('mv_r', " +
      "'SELECT g, m, count(*) AS n, count(v) AS cv, sum(v) AS sv, min(v) AS lo " +
      "FROM graft.mem_mvr_orders GROUP BY g, m')") // fresh at v1, grain (g, m)
    // coarser grain + a predicate on the DROPPED grain column: avg must
    // recompose from summed components (avg-of-avgs would be wrong — the
    // (g, m) group sizes are uneven by construction)
    val coarse = spark.sql(
      s"""SELECT g, count(*) AS n, sum(v) AS sv, avg(v) AS av, min(v) AS lo
         |FROM $tbl WHERE m IN (1, 2) GROUP BY g""".stripMargin)
    // the GLOBAL set: an Aggregate with no grouping over the store
    val total = spark.sql(s"SELECT count(*) AS t_n, sum(v) AS t_sv FROM $tbl")
    def served(df: DataFrame): Boolean = {
      val s = scannedTables(df)
      s.contains("mv_r__store") && !s.contains("mem_mvr_orders")
    }
    coarse.crossJoin(total)
      .withColumn("rollup_served", lit(served(coarse)))
      .withColumn("global_served", lit(served(total)))
  }

  /** Threshold-triggered AUTO-COMPACTION
    * ('graft.auto-compact-min-files' — the Delta auto-compact shape):
    * a run of tiny single-statement commits fragments a partitioned
    * file-backed table past the declared live-file threshold, and the
    * write path itself triggers the distributed fold — bounded file
    * count with zero external maintenance. The hash pins: the contents
    * after the folds (identical to the oracle's recomputation — a fold
    * that lost or duplicated a row breaks it), `compaction_triggered`
    * from the version ledger's op kinds, `files_bounded` (live batches
    * at most one per partition tuple at the end — the fold's whole
    * point), and the CDC insert count (compaction is CDC-invisible; the
    * feed still shows every original insert). At 100 TB this bounds what
    * a micro-batch ingest can fragment a partition into. Adjudication
    * note: dsv2_partitioned_prune's ~1.5 s at sf0.1 is NOT this shape —
    * that row's 100+ files are one-per-tuple already (the layout's
    * honest floor), which auto-compaction correctly leaves alone.
    */
  val dsv2AutoCompact: QueryDef = QueryDef(
    "dsv2_auto_compact",
    """WITH base AS (
      |  SELECT CAST(o_orderkey % 3 AS INT) AS g,
      |         CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders WHERE o_orderkey % 2 = 0)
      |SELECT g, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS sv,
      |       TRUE AS compaction_triggered, TRUE AS files_bounded,
      |       TRUE AS cdc_preserved
      |FROM base GROUP BY g""".stripMargin) { (spark, dir) =>
    val tbl = freshGraftTable(spark, "mem_auto_compact",
      "(g INT, v BIGINT) PARTITIONED BY (g) " +
        "TBLPROPERTIES ('graft.storage'='parquet', " +
        "'graft.auto-compact-min-files'='10')")
    val base = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 2 === 0)
      .select((col("o_orderkey") % 3).cast("int").as("g"),
        Num.cents(col("o_totalprice")).as("v"))
    // 8 tiny single-task commits, each scattering rows across all 3
    // tuples (≤ 3 files per commit): the live file count crosses the
    // threshold mid-run and the write path folds to one file per tuple
    (0 until 8).foreach(i =>
      base.filter(col("v") % 8 === i).coalesce(1).writeTo(tbl).append())
    val st = MemTables.get("mem_auto_compact").get
    val (live, version, kinds) = st.synchronized(
      (st.batches.count(_.removedAt == Long.MaxValue), st.version,
        st.opKinds.values.toSet))
    val inserted = base.count()
    val feed = spark.read.format("graft.sources.MemChangesSource")
      .option("table", "mem_auto_compact")
      .option("from", "0").option("to", version.toString).load()
    val cdcInserts = feed.filter(col(MemChangesSource.ChangeType) === "insert").count()
    spark.sql(s"SELECT g, count(*) AS n, sum(v) AS sv FROM $tbl GROUP BY g")
      .withColumn("compaction_triggered", lit(kinds.contains("compact")))
      // ≤ one live file per tuple after the last fold, plus at most the
      // two sub-threshold trailing commits (3 files each)
      .withColumn("files_bounded", lit(live <= 9))
      .withColumn("cdc_preserved", lit(cdcInserts == inserted))
  }

  /** MV AUTO-REFRESH on streaming epochs ('auto-refresh' create option):
    * the connector's streaming sink refreshes the view after every epoch
    * commit, so the rewrite keeps serving a continuously-written source
    * with ZERO manual refresh CALLs. The gate streams the events table
    * into a mem source in micro-batches, then hashes the MV-served
    * aggregate (plan-derived `served_from_store`), the watermark-tracks-
    * epochs flag, and the values against the oracle's recomputation —
    * a hook that silently stopped firing, over- or under-applied an
    * epoch, or served stale contents all break the row set.
    */
  val dsv2MvAutorefresh: QueryDef = QueryDef(
    "dsv2_mv_autorefresh",
    """WITH base AS (
      |  SELECT event_type AS g,
      |         CAST(COALESCE(CAST(round(value * 100) AS BIGINT), 0) AS BIGINT) AS v
      |  FROM events),
      |mv AS (
      |  SELECT g, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS sv
      |  FROM base GROUP BY g)
      |SELECT g, n, sv, TRUE AS watermark_current, TRUE AS served_from_store
      |FROM mv""".stripMargin) { (spark, dir) =>
    MatViews.drop("mv_ar")
    val tbl = freshGraftTable(spark, "mem_mvar_events", "(g STRING, v BIGINT)")
    spark.sql("CALL graft.create_materialized_view('mv_ar', " +
      "'SELECT g, count(*) AS n, sum(v) AS sv FROM graft.mem_mvar_events " +
      "GROUP BY g', 'auto-refresh')") // fresh at v1, auto-tied to epochs
    val sess = spark.newSession()
    sess.conf.set("spark.sql.shuffle.partitions", "8")
    sess.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")
    val cp = graft.rentals.Scratch.dir(s"mvar_cp_${System.nanoTime()}")
    val q = graft.streaming.Streams.readTableStream(sess, dir, "events")
      .select(col("event_type").as("g"),
        coalesce(Num.cents(col("value")), lit(0L)).as("v"))
      .writeStream
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable(tbl)
    q.awaitTermination()
    val st = MatViews.registry("mv_ar")
    val watermarkCurrent =
      MemTables.get("mem_mvar_events").exists(s =>
        st.watermark == s.version && st.pending.isEmpty)
    val agg = spark.sql(
      s"SELECT g, count(*) AS n, sum(v) AS sv FROM $tbl GROUP BY g")
    val scans = scannedTables(agg)
    val served = scans.contains("mv_ar__store") && !scans.contains("mem_mvar_events")
    agg.withColumn("watermark_current", lit(watermarkCurrent))
      .withColumn("served_from_store", lit(served))
  }

  /** ATOMIC CTAS/RTAS ([[StagedMemTable]]): `CREATE TABLE AS SELECT`
    * stages the whole write and publishes the name only on success. The
    * row pins three behaviors in one hash: the CTAS result read back
    * (values), a FAILED CTAS stranding NO table (`failed_ctas_clean` —
    * the non-atomic fallback shape leaves an empty husk), and a REPLACE
    * TABLE AS SELECT whose failed run kept the old contents then whose
    * successful run swapped wholesale (`rtas_rows`). At 100 TB atomic
    * CTAS is what makes `CREATE TABLE ... AS SELECT` safe to retry
    * blindly — no cleanup protocol, no half-created names.
    */
  val dsv2Ctas: QueryDef = QueryDef(
    "dsv2_ctas",
    """WITH src AS (
      |  SELECT o_orderpriority AS g,
      |         CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS sv
      |  FROM orders WHERE o_orderkey % 4 = 0 GROUP BY o_orderpriority)
      |SELECT g, n, sv,
      |       TRUE AS failed_ctas_clean,
      |       CAST(3 AS BIGINT) AS rtas_rows
      |FROM src""".stripMargin) { (spark, dir) =>
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")
    Seq("mem_ctas_result", "mem_ctas_broken", "mem_rtas_swap")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS graft.$t"))
    Tables.orders(spark, dir).createOrReplaceTempView("ctas_orders_src")
    spark.sql(
      """CREATE TABLE graft.mem_ctas_result
        |TBLPROPERTIES ('graft.storage'='parquet') AS
        |SELECT o_orderpriority AS g,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS sv
        |FROM ctas_orders_src WHERE o_orderkey % 4 = 0
        |GROUP BY o_orderpriority""".stripMargin)
    // a failing CTAS must strand nothing — not even an empty table
    val failedClean = try {
      spark.sql("CREATE TABLE graft.mem_ctas_broken AS " +
        "SELECT raise_error('boom') AS x FROM range(0, 3)").collect()
      false
    } catch {
      case _: Exception => MemTables.get("mem_ctas_broken").isEmpty
    }
    // RTAS: failed replace keeps the old table; successful replace swaps
    spark.sql("CREATE TABLE graft.mem_rtas_swap AS SELECT id AS x FROM range(0, 9)")
    try spark.sql("REPLACE TABLE graft.mem_rtas_swap AS " +
      "SELECT raise_error('no') AS x FROM range(0, 1)").collect()
    catch { case _: Exception => () }
    val keptOld = spark.table("graft.mem_rtas_swap").count() == 9L
    spark.sql("REPLACE TABLE graft.mem_rtas_swap AS SELECT id AS x FROM range(0, 3)")
    val rtasRows =
      if (keptOld) spark.table("graft.mem_rtas_swap").count() else -1L
    spark.table("graft.mem_ctas_result")
      .withColumn("failed_ctas_clean", lit(failedClean))
      .withColumn("rtas_rows", lit(rtasRows))
  }

  /** STAR-SCHEMA (join) materialized view — `fact ⋈ dim GROUP BY`
    * materialized as one store, maintained INCREMENTALLY by the
    * telescoped delta×snapshot join ([[MatViews]] —
    * Δ(A⋈B) = ΔA⋈B@old + A@new⋈ΔB, signed, exact for arbitrary DML),
    * and served by the rewrite: the restated join-aggregate must scan
    * ONLY the store (flag plan-derived, part of the hash). TWO refresh
    * legs pin the algebra in the oracle hash: a fact APPEND folds
    * (mode=incremental), then a DIM DELETE — which retro-removes every
    * joined fact row of the deleted priority, the case a naive one-sided
    * delta gets wrong — also folds (mode=incremental), and the final
    * values must equal the oracle's from-scratch recomputation. At
    * 100 TB this is the star-schema dashboard shape (`tpch_q3/q5`-style):
    * refresh cost tracks the change rate × join fan-out, never the join.
    */
  val dsv2MvJoin: QueryDef = QueryDef(
    "dsv2_mv_join",
    """WITH fact AS (
      |  SELECT o_orderkey AS k, o_orderpriority AS g,
      |         CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders WHERE o_orderkey % 3 = 0
      |  UNION ALL SELECT -1, '1-URGENT', CAST(999 AS BIGINT)),
      |dim AS (
      |  SELECT DISTINCT o_orderpriority AS dk,
      |         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |              THEN 'hot' ELSE 'cold' END AS seg
      |  FROM orders WHERE o_orderpriority <> '5-LOW'),
      |mv AS (
      |  SELECT seg, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS sv
      |  FROM fact JOIN dim ON g = dk GROUP BY seg)
      |SELECT seg, n, sv, 'incremental' AS append_mode,
      |       'incremental' AS dim_delete_mode, TRUE AS served_from_store
      |FROM mv""".stripMargin) { (spark, dir) =>
    MatViews.drop("mv_j")
    val fact = freshGraftTable(spark, "mem_mvj_fact", "(k BIGINT, g STRING, v BIGINT)")
    val dim = freshGraftTable(spark, "mem_mvj_dim", "(dk STRING, seg STRING)")
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey").as("k"), col("o_orderpriority").as("g"),
        Num.cents(col("o_totalprice")).as("v"))
      .writeTo(fact).append() // fact v1
    Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("dk")).distinct()
      .select(col("dk"),
        when(col("dk").isin("1-URGENT", "2-HIGH"), lit("hot"))
          .otherwise(lit("cold")).as("seg"))
      .writeTo(dim).append() // dim v1
    spark.sql("CALL graft.create_materialized_view('mv_j', " +
      "'SELECT seg, count(*) AS n, sum(v) AS sv " +
      "FROM graft.mem_mvj_fact JOIN graft.mem_mvj_dim ON g = dk GROUP BY seg')")
    spark.sql(s"INSERT INTO $fact VALUES (-1, '1-URGENT', 999)") // stale fact
    val mode1 = spark.sql("CALL graft.refresh_materialized_view('mv_j')")
      .head().getString(1) // incremental: fact delta ⋈ dim@old
    // dim delete retro-removes EVERY '5-LOW' fact row from the aggregate
    spark.sql(s"DELETE FROM $dim WHERE dk = '5-LOW'")
    val mode2 = spark.sql("CALL graft.refresh_materialized_view('mv_j')")
      .head().getString(1) // incremental: fact@new ⋈ dim's −rows
    val agg = spark.sql(
      s"""SELECT seg, count(*) AS n, sum(v) AS sv
         |FROM $fact JOIN $dim ON g = dk GROUP BY seg""".stripMargin)
    val scans = scannedTables(agg)
    val served = scans.contains("mv_j__store") &&
      !scans.exists(n => n == "mem_mvj_fact" || n == "mem_mvj_dim")
    agg.withColumn("append_mode", lit(mode1))
      .withColumn("dim_delete_mode", lit(mode2))
      .withColumn("served_from_store", lit(served))
  }

  /** MIN/MAX materialized view — the conditional-maintainability half of
    * [[MatViews]]: extremes fold incrementally while the change window is
    * a pure insert stream, and fall back to a LOUD full recompute the
    * moment a row-removing commit appears in it (decided from the version
    * ledger's op kinds — no data scan). Both refresh MODES and their
    * exact windows are part of the oracle hash: refresh #1 (two appends)
    * must report `incremental`, refresh #2 (a DELETE then an append) must
    * report `full` — a silently-wrong extreme after the delete, or an
    * incremental path that missed the delete, breaks the row set; a
    * needlessly-full first refresh breaks the mode column. NULL inputs
    * (every 17th key) pin the skip-nulls semantics of the fold.
    */
  val dsv2MvMinmax: QueryDef = QueryDef(
    "dsv2_mv_minmax",
    """WITH base AS (
      |  SELECT o_orderkey AS k, o_orderpriority AS g,
      |         CASE WHEN o_orderkey % 17 = 0 THEN NULL
      |              ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS v
      |  FROM orders WHERE o_orderkey % 13 = 0),
      |final AS (
      |  SELECT k, g, v FROM base WHERE k % 9 <> 0
      |  UNION ALL
      |  SELECT -1, '5-LOW', CAST(123 AS BIGINT)),
      |mv AS (
      |  SELECT g, CAST(min(v) AS BIGINT) AS lo, CAST(max(v) AS BIGINT) AS hi,
      |         CAST(sum(v) AS BIGINT) AS sv
      |  FROM final GROUP BY g)
      |SELECT g, lo, hi, sv,
      |       'incremental' AS r1_mode, CAST(2 AS BIGINT) AS r1_to,
      |       'full' AS r2_mode, CAST(4 AS BIGINT) AS r2_to
      |FROM mv""".stripMargin) { (spark, dir) =>
    MatViews.drop("mv_x")
    val tbl = freshGraftTable(spark, "mem_mvx_orders", "(k BIGINT, g STRING, v BIGINT)") // v0
    val base = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 13 === 0)
      .select(col("o_orderkey").as("k"), col("o_orderpriority").as("g"),
        when(col("o_orderkey") % 17 === 0, lit(null))
          .otherwise(Num.cents(col("o_totalprice"))).as("v"))
    base.filter(col("k") % 2 === 0).writeTo(tbl).append() // v1
    spark.sql("CALL graft.create_materialized_view('mv_x', " +
      "'SELECT g, min(v) AS lo, max(v) AS hi, sum(v) AS sv " +
      "FROM graft.mem_mvx_orders GROUP BY g')") // watermark = 1
    base.filter(col("k") % 2 === 1).writeTo(tbl).append() // v2: insert-only window
    val r1 = spark.sql("CALL graft.refresh_materialized_view('mv_x')")
      .select(col("mode").as("r1_mode"), col("to_version").as("r1_to"))
    spark.sql(s"DELETE FROM $tbl WHERE k % 9 = 0") // v3: removes extremes
    spark.sql(s"INSERT INTO $tbl VALUES (-1, '5-LOW', 123)") // v4
    val r2 = spark.sql("CALL graft.refresh_materialized_view('mv_x')")
      .select(col("mode").as("r2_mode"), col("to_version").as("r2_to"))
    spark.sql("SELECT g, lo, hi, sv FROM graft.mv_x")
      .crossJoin(r1).crossJoin(r2)
  }

  /** count(DISTINCT x) MV component ([[MatViews]] + the NDV-sketch SQL
    * surface): the store keeps a per-group distinct-value SKETCH — exact
    * below its 2048-value exact mode, which every group here is far
    * under — so the oracle's direct `count(DISTINCT v)` recomputation
    * must hash-match the served values through BOTH maintenance modes:
    * the insert-only window folds incrementally (set-union of the window
    * sketch — re-seen values must not double-count), and the DELETE
    * window forces the loud full recompute (a sketch cannot un-see a
    * value). Both mode strings are pinned into the hash as flag columns.
    * At 100 TB: a distinct-users rollup refreshes at the change rate
    * while appends dominate, and degrades to one recompute — never to a
    * silently wrong count — when retention deletes land.
    */
  val dsv2MvCountDistinct: QueryDef = QueryDef(
    "dsv2_mv_count_distinct",
    """WITH base AS (
      |  SELECT o_orderkey AS k, o_orderpriority AS g,
      |         CAST(o_custkey % 97 AS BIGINT) AS v
      |  FROM orders WHERE o_orderkey % 6 IN (0, 3)),
      |live AS (SELECT * FROM base WHERE v >= 10)
      |SELECT g, CAST(count(*) AS BIGINT) AS n,
      |       CAST(count(DISTINCT v) AS BIGINT) AS dx,
      |       TRUE AS incr_mode, TRUE AS full_mode
      |FROM live GROUP BY g""".stripMargin) { (spark, dir) =>
    MatViews.drop("mv_cd")
    val tbl = freshGraftTable(spark, "mem_mvcd_orders", "(k BIGINT, g STRING, v BIGINT)")
    def slice(rem: Int) = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 6 === rem)
      .select(col("o_orderkey").as("k"), col("o_orderpriority").as("g"),
        (col("o_custkey") % 97).cast("long").as("v"))
    slice(0).writeTo(tbl).append() // v1
    spark.sql("CALL graft.create_materialized_view('mv_cd', " +
      "'SELECT g, count(*) AS n, count(DISTINCT v) AS dx " +
      "FROM graft.mem_mvcd_orders GROUP BY g')") // fresh at v1
    slice(3).writeTo(tbl).append() // v2: insert-only window
    val r1 = spark.sql("CALL graft.refresh_materialized_view('mv_cd')").head()
    spark.sql(s"DELETE FROM $tbl WHERE v < 10") // sketches cannot un-see
    val r2 = spark.sql("CALL graft.refresh_materialized_view('mv_cd')").head()
    spark.sql("SELECT g, n, dx FROM graft.mv_cd")
      .withColumn("incr_mode", lit(r1.getString(1) == "incremental"))
      .withColumn("full_mode", lit(r2.getString(1) == "full"))
  }

  /** LEFT OUTER join MV ([[MatViews]]): `fact ⟕ dim GROUP BY seg`
    * materializes null-extension rows (orphan facts under the NULL
    * group) and maintains them INCREMENTALLY — the telescoped inner
    * terms handle the matched halves, and the anti-delta flip terms emit
    * the compensating ± null-extension rows as fact rows flip between
    * matched and unmatched. The hash pins the two hard transitions: a
    * fact window inserting both matched and orphan rows, then a dim
    * DELETE that ORPHANS previously-matched fact rows back to
    * null-extension (the case a one-sided delta gets wrong). Both
    * refreshes' mode strings are pinned as flag columns — this row fails
    * if either quietly falls back to a full recompute. At 100 TB: the
    * dominant enrich-join shape (events ⟕ dims with incomplete dim
    * coverage) refreshes at the change rate × join fan-out.
    */
  val dsv2MvLeftJoin: QueryDef = QueryDef(
    "dsv2_mv_left_join",
    """WITH fact AS (
      |  SELECT o_orderkey AS k, o_custkey AS ck,
      |         CAST(o_orderkey % 1000 AS BIGINT) AS v
      |  FROM orders WHERE o_orderkey % 4 IN (0, 1)),
      |dim AS (
      |  SELECT c_custkey AS dk, c_mktsegment AS seg FROM customer
      |  WHERE c_custkey % 5 <> 2 AND c_custkey % 7 <> 3)
      |SELECT seg, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS sv,
      |       TRUE AS incr_fact, TRUE AS incr_dim
      |FROM fact LEFT JOIN dim ON ck = dk GROUP BY seg""".stripMargin) { (spark, dir) =>
    MatViews.drop("mv_lj")
    val fact = freshGraftTable(spark, "mem_mvlj_fact", "(k BIGINT, ck BIGINT, v BIGINT)")
    val dim = freshGraftTable(spark, "mem_mvlj_dim", "(dk BIGINT, seg STRING)")
    def slice(rem: Int) = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 4 === rem)
      .select(col("o_orderkey").as("k"), col("o_custkey").as("ck"),
        (col("o_orderkey") % 1000).cast("long").as("v"))
    Tables.customer(spark, dir).filter(col("c_custkey") % 5 =!= 2)
      .select(col("c_custkey").as("dk"), col("c_mktsegment").as("seg"))
      .writeTo(dim).append()
    slice(0).writeTo(fact).append()
    spark.sql("CALL graft.create_materialized_view('mv_lj', " +
      "'SELECT seg, count(*) AS n, sum(v) AS sv " +
      "FROM graft.mem_mvlj_fact LEFT JOIN graft.mem_mvlj_dim ON ck = dk GROUP BY seg')")
    slice(1).writeTo(fact).append() // fact window: matched + orphan inserts
    val r1 = spark.sql("CALL graft.refresh_materialized_view('mv_lj')").head()
    spark.sql(s"DELETE FROM $dim WHERE dk % 7 = 3") // orphans matched facts
    val r2 = spark.sql("CALL graft.refresh_materialized_view('mv_lj')").head()
    spark.sql("SELECT seg, n, sv FROM graft.mv_lj")
      .withColumn("incr_fact", lit(r1.getString(1) == "incremental"))
      .withColumn("incr_dim", lit(r2.getString(1) == "incremental"))
  }

  /** LEFT step INSIDE a longer chain (`fact ⟕ dim1 ⋈ dim2`): the
    * anti-delta flip terms must suffix-join dim2@OLD like every other
    * telescoped term (the left-deep recursion
    * Δ(J_k ⟕ A) = Δ(J_k) ⟕ A@old + J_k@new ⋈ ΔA + flips), and dim1's
    * null-extension rows ride the prefix into dim2's inner delta. The
    * hash pins a fact window and then a dim1 DELETE whose orphaned rows
    * flip back to null-extension THROUGH the inner suffix — both modes
    * pinned as flags so a silent full-recompute fallback fails the row.
    */
  val dsv2MvLeftChain: QueryDef = QueryDef(
    "dsv2_mv_left_chain",
    """WITH fact AS (
      |  SELECT o_orderkey AS k, o_custkey AS ck,
      |         CAST(o_orderkey % 3 AS BIGINT) AS pk,
      |         CAST(o_orderkey % 1000 AS BIGINT) AS v
      |  FROM orders WHERE o_orderkey % 8 IN (0, 1)),
      |d1 AS (
      |  SELECT c_custkey AS dk, c_mktsegment AS seg FROM customer
      |  WHERE c_custkey % 5 <> 2 AND c_custkey % 7 <> 3),
      |d2 AS (
      |  SELECT CAST(r_regionkey AS BIGINT) AS qk, r_name AS rg FROM region
      |  WHERE r_regionkey < 3)
      |SELECT seg, rg, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS sv,
      |       TRUE AS incr_fact, TRUE AS incr_dim
      |FROM fact LEFT JOIN d1 ON ck = dk JOIN d2 ON pk = qk
      |GROUP BY seg, rg""".stripMargin) { (spark, dir) =>
    MatViews.drop("mv_lc")
    val fact = freshGraftTable(spark, "mem_mvlc_fact",
      "(k BIGINT, ck BIGINT, pk BIGINT, v BIGINT)")
    val d1 = freshGraftTable(spark, "mem_mvlc_d1", "(dk BIGINT, seg STRING)")
    val d2 = freshGraftTable(spark, "mem_mvlc_d2", "(qk BIGINT, rg STRING)")
    def slice(rem: Int) = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 8 === rem)
      .select(col("o_orderkey").as("k"), col("o_custkey").as("ck"),
        (col("o_orderkey") % 3).cast("long").as("pk"),
        (col("o_orderkey") % 1000).cast("long").as("v"))
    Tables.customer(spark, dir).filter(col("c_custkey") % 5 =!= 2)
      .select(col("c_custkey").as("dk"), col("c_mktsegment").as("seg"))
      .writeTo(d1).append()
    Tables.region(spark, dir).filter(col("r_regionkey") < 3)
      .select(col("r_regionkey").cast("long").as("qk"), col("r_name").as("rg"))
      .writeTo(d2).append()
    slice(0).writeTo(fact).append()
    spark.sql("CALL graft.create_materialized_view('mv_lc', " +
      "'SELECT seg, rg, count(*) AS n, sum(v) AS sv " +
      "FROM graft.mem_mvlc_fact LEFT JOIN graft.mem_mvlc_d1 ON ck = dk " +
      "JOIN graft.mem_mvlc_d2 ON pk = qk GROUP BY seg, rg')")
    slice(1).writeTo(fact).append() // fact window through the chain
    val r1 = spark.sql("CALL graft.refresh_materialized_view('mv_lc')").head()
    spark.sql(s"DELETE FROM $d1 WHERE dk % 7 = 3") // orphan flips via d2@old
    val r2 = spark.sql("CALL graft.refresh_materialized_view('mv_lc')").head()
    spark.sql("SELECT seg, rg, n, sv FROM graft.mv_lc")
      .withColumn("incr_fact", lit(r1.getString(1) == "incremental"))
      .withColumn("incr_dim", lit(r2.getString(1) == "incremental"))
  }

  /** FULL OUTER join MV ([[MatViews]]): both null-extension families
    * materialize (orphan facts under NULL dim groups; unmatched dims as
    * right-null-extension rows with NULL fact aggregates) and maintain
    * incrementally — the LEFT machinery covers the matched + fact-side
    * halves, and the FULL-specific terms emit the dim-side ones: ΔD rows
    * unmatched in fact@NEW (± with the feed's signs) and dim@OLD rows
    * whose match-existence flips as the fact side changes. The hash pins
    * a fact window that both ADDS orphans and RETRACTS right-null
    * extensions (new facts matching previously-unmatched dims), then a
    * dim DELETE that orphans matched facts; both mode flags pinned.
    */
  val dsv2MvFullJoin: QueryDef = QueryDef(
    "dsv2_mv_full_join",
    """WITH fact AS (
      |  SELECT o_orderkey AS k, o_custkey AS ck,
      |         CAST(o_orderkey % 1000 AS BIGINT) AS v
      |  FROM orders WHERE o_orderkey % 8 IN (0, 1)),
      |dim AS (
      |  SELECT c_custkey AS dk, c_mktsegment AS seg FROM customer
      |  WHERE c_custkey % 5 <> 2 AND c_custkey % 7 <> 3)
      |SELECT seg, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS sv,
      |       TRUE AS incr_fact, TRUE AS incr_dim
      |FROM fact FULL OUTER JOIN dim ON ck = dk GROUP BY seg""".stripMargin) { (spark, dir) =>
    MatViews.drop("mv_fj")
    val fact = freshGraftTable(spark, "mem_mvfj_fact", "(k BIGINT, ck BIGINT, v BIGINT)")
    val dim = freshGraftTable(spark, "mem_mvfj_dim", "(dk BIGINT, seg STRING)")
    def slice(rem: Int) = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 8 === rem)
      .select(col("o_orderkey").as("k"), col("o_custkey").as("ck"),
        (col("o_orderkey") % 1000).cast("long").as("v"))
    Tables.customer(spark, dir).filter(col("c_custkey") % 5 =!= 2)
      .select(col("c_custkey").as("dk"), col("c_mktsegment").as("seg"))
      .writeTo(dim).append()
    slice(0).writeTo(fact).append()
    spark.sql("CALL graft.create_materialized_view('mv_fj', " +
      "'SELECT seg, count(*) AS n, sum(v) AS sv " +
      "FROM graft.mem_mvfj_fact FULL OUTER JOIN graft.mem_mvfj_dim ON ck = dk GROUP BY seg')")
    slice(1).writeTo(fact).append() // adds orphans AND retracts right-null-exts
    val r1 = spark.sql("CALL graft.refresh_materialized_view('mv_fj')").head()
    spark.sql(s"DELETE FROM $dim WHERE dk % 7 = 3") // orphans matched facts
    val r2 = spark.sql("CALL graft.refresh_materialized_view('mv_fj')").head()
    spark.sql("SELECT seg, n, sv FROM graft.mv_fj")
      .withColumn("incr_fact", lit(r1.getString(1) == "incremental"))
      .withColumn("incr_dim", lit(r2.getString(1) == "incremental"))
  }

  /** RIGHT OUTER join MV ([[MatViews]]): unmatched DIM rows materialize
    * as null-extensions of the whole fact side and maintain
    * INCREMENTALLY — the dim-side delta rides the reversed RIGHT JOIN
    * feed term (U_R is linear in the dim for a fixed fact side), and the
    * right-flip anti-delta terms emit ± null-extension rows as dim rows
    * flip between matched and unmatched when the FACT side changes. The
    * hash pins both hard transitions: a fact window that MATCHES
    * previously-orphan dims (retraction), then a fact DELETE that
    * re-orphans dims (+1 flips). Mode flags pinned — the row fails if
    * either refresh silently falls back to a full recompute.
    */
  val dsv2MvRightJoin: QueryDef = QueryDef(
    "dsv2_mv_right_join",
    """WITH fact AS (
      |  SELECT o_orderkey AS k, o_custkey AS ck,
      |         CAST(o_orderkey % 1000 AS BIGINT) AS v
      |  FROM orders WHERE o_orderkey % 4 IN (0, 1) AND o_custkey % 11 <> 5),
      |dim AS (
      |  SELECT c_custkey AS dk, c_mktsegment AS seg FROM customer
      |  WHERE c_custkey % 5 <> 2)
      |SELECT seg, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS sv,
      |       TRUE AS incr_fact, TRUE AS incr_dim
      |FROM fact RIGHT JOIN dim ON ck = dk GROUP BY seg""".stripMargin) { (spark, dir) =>
    MatViews.drop("mv_rj")
    val fact = freshGraftTable(spark, "mem_mvrj_fact", "(k BIGINT, ck BIGINT, v BIGINT)")
    val dim = freshGraftTable(spark, "mem_mvrj_dim", "(dk BIGINT, seg STRING)")
    def slice(rem: Int) = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 4 === rem)
      .select(col("o_orderkey").as("k"), col("o_custkey").as("ck"),
        (col("o_orderkey") % 1000).cast("long").as("v"))
    Tables.customer(spark, dir).filter(col("c_custkey") % 5 =!= 2)
      .select(col("c_custkey").as("dk"), col("c_mktsegment").as("seg"))
      .writeTo(dim).append()
    slice(0).writeTo(fact).append()
    spark.sql("CALL graft.create_materialized_view('mv_rj', " +
      "'SELECT seg, count(*) AS n, sum(v) AS sv " +
      "FROM graft.mem_mvrj_fact RIGHT JOIN graft.mem_mvrj_dim ON ck = dk GROUP BY seg')")
    slice(1).writeTo(fact).append() // matches previously-orphan dims
    val r1 = spark.sql("CALL graft.refresh_materialized_view('mv_rj')").head()
    spark.sql(s"DELETE FROM $fact WHERE ck % 11 = 5") // re-orphans dims
    val r2 = spark.sql("CALL graft.refresh_materialized_view('mv_rj')").head()
    spark.sql("SELECT seg, n, sv FROM graft.mv_rj")
      .withColumn("incr_fact", lit(r1.getString(1) == "incremental"))
      .withColumn("incr_dim", lit(r2.getString(1) == "incremental"))
  }

  /** FULL OUTER inside a LONGER chain (`fact ⟗ dim1 ⟕ dim2`): the
    * two-table restriction is gone — a FULL step's dim null-extensions
    * empty the whole multi-table prefix via per-table WHERE FALSE
    * subqueries, and both flip families compose with the LEFT suffix at
    * OLD pins per the ΔJ recursion (right-null-extension rows carry a
    * NULL pk, so they ride the suffix as LEFT null-extensions — visible
    * in the result as NULL rg). The hash pins a fact window (adds
    * orphans AND retracts right-null-extensions), then a dim1 DELETE
    * (left flips + feed retractions through the suffix); mode flags
    * pinned against silent full-recompute fallbacks.
    */
  val dsv2MvFullChain: QueryDef = QueryDef(
    "dsv2_mv_full_chain",
    """WITH fact AS (
      |  SELECT o_orderkey AS k, o_custkey AS ck,
      |         CAST(o_orderkey % 3 AS BIGINT) AS pk,
      |         CAST(o_orderkey % 1000 AS BIGINT) AS v
      |  FROM orders WHERE o_orderkey % 8 IN (0, 1)),
      |d1 AS (
      |  SELECT c_custkey AS dk, c_mktsegment AS seg FROM customer
      |  WHERE c_custkey % 5 <> 2 AND c_custkey % 7 <> 3),
      |d2 AS (
      |  SELECT CAST(r_regionkey AS BIGINT) AS qk, r_name AS rg FROM region
      |  WHERE r_regionkey < 3)
      |SELECT seg, rg, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS sv,
      |       TRUE AS incr_fact, TRUE AS incr_dim
      |FROM fact FULL OUTER JOIN d1 ON ck = dk LEFT JOIN d2 ON pk = qk
      |GROUP BY seg, rg""".stripMargin) { (spark, dir) =>
    MatViews.drop("mv_fc")
    val fact = freshGraftTable(spark, "mem_mvfc_fact",
      "(k BIGINT, ck BIGINT, pk BIGINT, v BIGINT)")
    val d1 = freshGraftTable(spark, "mem_mvfc_d1", "(dk BIGINT, seg STRING)")
    val d2 = freshGraftTable(spark, "mem_mvfc_d2", "(qk BIGINT, rg STRING)")
    def slice(rem: Int) = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 8 === rem)
      .select(col("o_orderkey").as("k"), col("o_custkey").as("ck"),
        (col("o_orderkey") % 3).cast("long").as("pk"),
        (col("o_orderkey") % 1000).cast("long").as("v"))
    Tables.customer(spark, dir).filter(col("c_custkey") % 5 =!= 2)
      .select(col("c_custkey").as("dk"), col("c_mktsegment").as("seg"))
      .writeTo(d1).append()
    Tables.region(spark, dir).filter(col("r_regionkey") < 3)
      .select(col("r_regionkey").cast("long").as("qk"), col("r_name").as("rg"))
      .writeTo(d2).append()
    slice(0).writeTo(fact).append()
    spark.sql("CALL graft.create_materialized_view('mv_fc', " +
      "'SELECT seg, rg, count(*) AS n, sum(v) AS sv " +
      "FROM graft.mem_mvfc_fact FULL OUTER JOIN graft.mem_mvfc_d1 ON ck = dk " +
      "LEFT JOIN graft.mem_mvfc_d2 ON pk = qk GROUP BY seg, rg')")
    slice(1).writeTo(fact).append() // orphans added + right-null-exts retracted
    val r1 = spark.sql("CALL graft.refresh_materialized_view('mv_fc')").head()
    spark.sql(s"DELETE FROM $d1 WHERE dk % 7 = 3") // left flips through suffix
    val r2 = spark.sql("CALL graft.refresh_materialized_view('mv_fc')").head()
    spark.sql("SELECT seg, rg, n, sv FROM graft.mv_fc")
      .withColumn("incr_fact", lit(r1.getString(1) == "incremental"))
      .withColumn("incr_dim", lit(r2.getString(1) == "incremental"))
  }

  val all: Seq[QueryDef] =
    Seq(orcRoundtrip, jsonlRoundtrip, csvRoundtrip, xmlRoundtrip, schemaDriftMerge,
      dsv2SeqPushdown, dsv2SeqAggPushdown, dsv2SeqStream, dsv2SeqCatalogSql,
      dsv2MemWriteRoundtrip, dsv2AlterEvolution, dsv2DropReadd, dsv2TimeTravel,
      snapshotDiffCatalog, dsv2CdcRead, dsv2CdcStream, dsv2DeleteWhere,
      dsv2StreamingSink, dsv2UpdateWhere, dsv2MergeUpsert, dsv2CdcDml, dsv2MergeFull,
      dsv2DeleteMor, dsv2UpdateMor, dsv2Compact, dsv2TableHistory, dsv2TagTravel,
      dsv2SelectiveRead, dsv2SchemaEvolve, dsv2BranchWap, dsv2DeleteEquality,
      dsv2RewriteSorted, dsv2PartitionedPrune, dsv2SpjJoin, dsv2AggStats,
      dsv2RuntimePrune, dsv2SpjSorted, dsv2AggGroup, dsv2MetaTables, dsv2LimitTopn,
      dsv2TableStream, dsv2MergeEvolve, dsv2SortedIngest, dsv2ReplaceWhere,
      dsv2CdcUpdateImages, dsv2TimePartition, dsv2SpecEvolve, dsv2ParquetStorage,
      dsv2ColumnDefault, dsv2ViewRead, dsv2MetadataPersist,
      dsv2MigrateStorage, dsv2ZorderRewrite, dsv2BloomSkipping, dsv2IncrementalMv,
      dsv2MvRewrite, dsv2MvMinmax, dsv2MvRollup, dsv2MvJoin, dsv2Ctas,
      dsv2MvAutorefresh, dsv2AutoCompact, dsv2MvCountDistinct, dsv2MvLeftJoin,
      dsv2MvLeftChain, dsv2MvFullJoin, dsv2MvRightJoin, dsv2MvFullChain,
      dsv2RestCatalog, dsv2MvOuterServe)
}
