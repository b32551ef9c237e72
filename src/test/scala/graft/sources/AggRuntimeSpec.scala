package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Metadata-answered aggregates ([[MemScanBuilder.computeAgg]]) and
  * join-driven runtime batch pruning on the mem-table scan — the two
  * planning integrations that let a 100 TB table answer `count(*)` from
  * statistics and a selective join skip the batches the build side can
  * never match.
  */
class AggRuntimeSpec extends SparkSpec {

  private def catalogOn(): Unit =
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("aggregates answer from batch stats: zero-row scan, no aggregate exec") {
    catalogOn()
    spark.sql("DROP TABLE IF EXISTS graft.agg_base")
    spark.sql("CREATE TABLE graft.agg_base (k BIGINT, v INT, s STRING)")
    spark.sql("INSERT INTO graft.agg_base SELECT id, CAST(id % 7 AS INT), " +
      "CASE WHEN id % 3 = 0 THEN NULL ELSE concat('x', id) END FROM range(0, 100)")
    spark.sql("INSERT INTO graft.agg_base VALUES (100, NULL, 'y')")
    val q = spark.sql(
      "SELECT count(*) AS c, min(k) AS mn, max(k) AS mx, count(s) AS cs, count(v) AS cv " +
        "FROM graft.agg_base")
    val r = q.head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
      ((101L, 0L, 100L, 67L, 100L)))
    val p = plan(q)
    assert(p.contains("AGG-PUSHED"), p)
    assert(!p.contains("HashAggregate"), s"complete pushdown must plan no aggregate exec:\n$p")
    spark.sql("DROP TABLE graft.agg_base")
  }

  test("deletes keep aggregates honest: COUNT(*) stays exact, MIN/MAX decline on kills") {
    catalogOn()
    // merge-on-read: delete vectors are kills — bounds go stale-conservative
    spark.sql("DROP TABLE IF EXISTS graft.agg_mor")
    spark.sql("CREATE TABLE graft.agg_mor (k BIGINT) " +
      "TBLPROPERTIES ('graft.delete-mode'='merge-on-read')")
    spark.sql("INSERT INTO graft.agg_mor SELECT id FROM range(0, 50)")
    spark.sql("DELETE FROM graft.agg_mor WHERE k >= 40")
    val qc = spark.sql("SELECT count(*) AS c FROM graft.agg_mor")
    assert(qc.head().getLong(0) === 40L) // kills subtracted exactly
    assert(plan(qc).contains("AGG-PUSHED"))
    val qm = spark.sql("SELECT max(k) AS mx FROM graft.agg_mor")
    assert(qm.head().getLong(0) === 39L) // correct via the ordinary scan
    assert(!plan(qm).contains("AGG-PUSHED"), "a killed row may be the recorded max")
    // copy-on-write: the delete REWRITES batches, survivors carry fresh
    // stats — min/max stay pushable and correct
    spark.sql("DROP TABLE IF EXISTS graft.agg_cow")
    spark.sql("CREATE TABLE graft.agg_cow (k BIGINT)")
    spark.sql("INSERT INTO graft.agg_cow SELECT id FROM range(0, 50)")
    spark.sql("DELETE FROM graft.agg_cow WHERE k >= 40")
    val qw = spark.sql("SELECT max(k) AS mx, count(*) AS c FROM graft.agg_cow")
    val rw = qw.head()
    assert((rw.getLong(0), rw.getLong(1)) === ((39L, 40L)))
    assert(plan(qw).contains("AGG-PUSHED"))
    spark.sql("DROP TABLE graft.agg_mor")
    spark.sql("DROP TABLE graft.agg_cow")
  }

  test("aggregates compose with widening, time travel, and empty tables") {
    catalogOn()
    spark.sql("DROP TABLE IF EXISTS graft.agg_ev")
    spark.sql("CREATE TABLE graft.agg_ev (k INT)")
    spark.sql("INSERT INTO graft.agg_ev VALUES (5), (7)") // v1
    spark.sql("ALTER TABLE graft.agg_ev ALTER COLUMN k TYPE BIGINT") // v2
    spark.sql("INSERT INTO graft.agg_ev VALUES (CAST(9000000000 AS BIGINT))") // v3
    val q = spark.sql("SELECT min(k) AS mn, max(k) AS mx, count(*) AS c FROM graft.agg_ev")
    val r = q.head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((5L, 9000000000L, 3L)))
    assert(plan(q).contains("AGG-PUSHED"))
    // snapshot read: pre-widen schema, pre-append contents
    val qt = spark.sql("SELECT max(k) AS mx, count(*) AS c FROM graft.agg_ev VERSION AS OF 1")
    val rt = qt.head()
    assert((rt.getInt(0), rt.getLong(1)) === ((7, 2L)))
    assert(plan(qt).contains("AGG-PUSHED"))
    // empty table: count 0, min NULL — still metadata-answered
    spark.sql("DROP TABLE IF EXISTS graft.agg_empty")
    spark.sql("CREATE TABLE graft.agg_empty (k BIGINT)")
    val qe = spark.sql("SELECT count(*) AS c, min(k) AS mn FROM graft.agg_empty")
    val re = qe.head()
    assert(re.getLong(0) === 0L && re.isNullAt(1))
    assert(plan(qe).contains("AGG-PUSHED"))
    spark.sql("DROP TABLE graft.agg_ev")
    spark.sql("DROP TABLE graft.agg_empty")
  }

  test("unsupported aggregate shapes decline to the ordinary plan") {
    catalogOn()
    spark.sql("DROP TABLE IF EXISTS graft.agg_dec")
    spark.sql("CREATE TABLE graft.agg_dec (k BIGINT, v INT)")
    spark.sql("INSERT INTO graft.agg_dec SELECT id, CAST(id % 5 AS INT) FROM range(0, 100)")
    // residual filters block pushdown (the source never filters rows)
    val qf = spark.sql("SELECT count(*) AS c FROM graft.agg_dec WHERE k < 10")
    assert(qf.head().getLong(0) === 10L)
    assert(!plan(qf).contains("AGG-PUSHED"))
    // sum / distinct / group-by are not stats-answerable
    val qs = spark.sql("SELECT sum(k) AS s, count(DISTINCT v) AS d FROM graft.agg_dec")
    val rs = qs.head()
    assert((rs.getLong(0), rs.getLong(1)) === ((4950L, 5L)))
    assert(!plan(qs).contains("AGG-PUSHED"))
    val qg = spark.sql("SELECT v, count(*) AS c FROM graft.agg_dec GROUP BY v")
    assert(qg.count() === 5)
    assert(!plan(qg).contains("AGG-PUSHED"))
    spark.sql("DROP TABLE graft.agg_dec")
  }

  test("GROUP BY identity partition columns pushes down; rollup answers from tuples") {
    catalogOn()
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.sql("DROP TABLE IF EXISTS graft.agg_grp")
    spark.sql("CREATE TABLE graft.agg_grp (nk INT, ck BIGINT, v BIGINT) " +
      "PARTITIONED BY (nk, bucket(4, ck))")
    spark.sql("INSERT INTO graft.agg_grp " +
      "SELECT CAST(id % 3 AS INT), id, id * 10 FROM range(0, 60)")
    spark.sql("INSERT INTO graft.agg_grp VALUES (CAST(NULL AS INT), 100, 999)")
    val q = spark.sql(
      "SELECT nk, count(*) AS c, min(v) AS mn, max(v) AS mx FROM graft.agg_grp GROUP BY nk")
    val rows = q.collect().map(r =>
      (if (r.isNullAt(0)) -1 else r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(rows === Seq(
      (-1, 1L, 999L, 999L), // NULL tuple is its own group
      (0, 20L, 0L, 570L), (1, 20L, 10L, 580L), (2, 20L, 20L, 590L)))
    val p = plan(q)
    assert(p.contains("AGG-PUSHED") && !p.contains("HashAggregate"), p)
    // non-partition / bucket-transform grouping columns decline
    val qd = spark.sql("SELECT ck, count(*) AS c FROM graft.agg_grp GROUP BY ck")
    assert(qd.count() === 61)
    assert(!plan(qd).contains("AGG-PUSHED"))
    spark.sql("DROP TABLE graft.agg_grp")
  }

  test("pushed GROUP BY stays SQL-exact under deletes: dead groups vanish, counts push") {
    catalogOn()
    spark.sql("DROP TABLE IF EXISTS graft.agg_grpd")
    spark.sql("CREATE TABLE graft.agg_grpd (nk INT, v BIGINT) PARTITIONED BY (nk) " +
      "TBLPROPERTIES ('graft.delete-mode'='merge-on-read')")
    spark.sql("INSERT INTO graft.agg_grpd SELECT CAST(id % 3 AS INT), id FROM range(0, 30)")
    spark.sql("DELETE FROM graft.agg_grpd WHERE nk = 2") // whole group dead (DV)
    spark.sql("DELETE FROM graft.agg_grpd WHERE v = 0")  // one row of group 0
    val q = spark.sql("SELECT nk, count(*) AS c FROM graft.agg_grpd GROUP BY nk")
    assert(q.collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).toSeq ===
      Seq((0, 9L), (1, 10L))) // group 2 gone, like the relational answer
    assert(plan(q).contains("AGG-PUSHED"))
    // min/max decline under kills, grouped or not
    val qm = spark.sql("SELECT nk, min(v) AS mn FROM graft.agg_grpd GROUP BY nk")
    assert(qm.collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).toSeq ===
      Seq((0, 3L), (1, 1L)))
    assert(!plan(qm).contains("AGG-PUSHED"))
    spark.sql("DROP TABLE graft.agg_grpd")
  }

  test("runtime filtering prunes mem batches from the join's build side") {
    catalogOn()
    spark.sql("DROP TABLE IF EXISTS graft.rt_fact")
    spark.sql("CREATE TABLE graft.rt_fact (k BIGINT, v BIGINT)")
    import spark.implicits._
    // three range-disjoint batches; the dim's keys hit only the middle one
    (0L until 10L).map(k => (k, k * 10)).toDF("k", "v")
      .coalesce(1).writeTo("graft.rt_fact").append()
    (10L until 20L).map(k => (k, k * 10)).toDF("k", "v")
      .coalesce(1).writeTo("graft.rt_fact").append()
    (20L until 30L).map(k => (k, k * 10)).toDF("k", "v")
      .coalesce(1).writeTo("graft.rt_fact").append()
    val dim = spark.range(0, 1000).filter(col("id") >= 12L && col("id") < 15L)
    val joined = spark.table("graft.rt_fact")
      .join(dim.hint("broadcast"), col("k") === col("id"))
    assert(joined.collect().length === 3)
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"), p)
    def scans(pl: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] = pl match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => Seq(b)
      case other => other.children.flatMap(scans)
    }
    val scanRows = scans(joined.queryExecution.executedPlan)
      .filter(_.toString.contains("GraftMemScan"))
      .flatMap(_.metrics.get("numOutputRows").map(_.value))
    assert(scanRows.nonEmpty && scanRows.forall(_ <= 10L),
      s"scan emitted $scanRows rows; batch pruning did not engage")
    spark.sql("DROP TABLE graft.rt_fact")
  }

  test("runtime filter parsing: IN and = shapes prune directly, others retain") {
    catalogOn()
    spark.sql("DROP TABLE IF EXISTS graft.rt_api")
    spark.sql("CREATE TABLE graft.rt_api (k BIGINT, s STRING)")
    import spark.implicits._
    (0L until 10L).map(k => (k, s"a$k")).toDF("k", "s")
      .coalesce(1).writeTo("graft.rt_api").append()
    (10L until 20L).map(k => (k, s"b$k")).toDF("k", "s")
      .coalesce(1).writeTo("graft.rt_api").append()
    val st = MemTables.get("rt_api").get
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    
    def planned(preds: Predicate*): Int = {
      val scan = new MemScan("rt_api", st.schema, None, None, None, Array.empty, None)
      scan.filter(preds.toArray)
      scan.planInputPartitions().length
    }
    assert(planned() === 2)
    assert(planned(new Predicate("IN",
      Array(Expressions.column("k"), Expressions.literal(3L), Expressions.literal(5L)))) === 1)
    assert(planned(new Predicate("=",
      Array(Expressions.column("k"), Expressions.literal(15L)))) === 1)
    // string keys canonicalize (UTF8String literal vs String bound)
    assert(planned(new Predicate("=",
      Array(Expressions.column("s"),
        Expressions.literal(org.apache.spark.unsafe.types.UTF8String.fromString("b12"))))) === 1)
    // unparsed shapes retain everything (over-retention is safe)
    assert(planned(new Predicate("ALWAYS_TRUE", Array.empty)) === 2)
    spark.sql("DROP TABLE graft.rt_api")
  }
}
