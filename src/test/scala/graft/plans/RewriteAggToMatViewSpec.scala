package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

import graft.SparkSpec
import graft.sources.{MatViews, MemTables, MemViews}

/** The MV query-rewrite rule ([[RewriteAggToMatView]]): matching
  * aggregates over a FRESH materialized view's source are answered from
  * the pre-aggregated store; everything that could change the answer —
  * staleness, different filter/grouping, non-maintained aggregates, time
  * travel, DISTINCT — leaves the query on the source. Plan assertions
  * read the executed plan's scanned table names.
  */
class RewriteAggToMatViewSpec extends SparkSpec {

  private def catalogOn(): Unit =
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")

  private def dropMv(name: String): Unit = {
    MatViews.forget(name)
    MemTables.drop(name + MatViews.StoreSuffix)
    MemViews.views.remove(name)
    ()
  }

  // recurse through AQE wrappers: a rollup replacement aggregates the
  // store, and the exchange puts the scan inside an AdaptiveSparkPlanExec
  // subtree plain collect() never descends into
  private def scansOf(pl: org.apache.spark.sql.execution.SparkPlan): Seq[BatchScanExec] =
    pl match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scansOf(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scansOf(q.plan)
      case b: BatchScanExec => Seq(b)
      case other => other.children.flatMap(scansOf)
    }

  private def scannedTables(df: DataFrame): Seq[String] =
    scansOf(df.queryExecution.executedPlan).map(_.table.name())

  private def hitsStore(df: DataFrame, store: String): Boolean = {
    val t = scannedTables(df)
    t.contains(store) && !t.exists(n => n.startsWith("rw_src"))
  }

  private def setup(): Unit = {
    catalogOn(); dropMv("rw_mv")
    spark.sql("DROP TABLE IF EXISTS graft.rw_src")
    spark.sql("CREATE TABLE graft.rw_src (k BIGINT, g STRING, v BIGINT)")
    spark.sql("INSERT INTO graft.rw_src VALUES (1, 'a', 10), (2, 'a', 20), " +
      "(3, 'b', 30), (4, 'b', NULL), (5, 'c', 50), (6, 'c', 60)")
    spark.sql("CALL graft.create_materialized_view('rw_mv', " +
      "'SELECT g, count(*) AS n, sum(v) AS sv, avg(v) AS av " +
      "FROM graft.rw_src WHERE k % 5 <> 0 GROUP BY g')")
  }

  test("a restated aggregate reads the store, with identical results") {
    setup()
    val q = "SELECT g, sum(v) AS s, count(*) AS c, avg(v) AS a, count(v) AS cv " +
      "FROM graft.rw_src WHERE k % 5 <> 0 GROUP BY g"
    val df = spark.sql(q)
    assert(hitsStore(df, "rw_mv__store"), s"expected store scan, got ${scannedTables(df)}")
    spark.conf.set("spark.graft.mv.rewrite", "false")
    val direct = try spark.sql(q).collect().toSeq.map(_.toSeq).sortBy(_.toString)
    finally spark.conf.unset("spark.graft.mv.rewrite")
    assert(df.collect().toSeq.map(_.toSeq).sortBy(_.toString) === direct)
    // output schema must be untouched by the substitution
    assert(df.schema.fieldNames.toSeq === Seq("g", "s", "c", "a", "cv"))
  }

  test("scalar expressions over maintained aggregates rewrite too") {
    setup()
    val df = spark.sql("SELECT g, sum(v) / count(*) + 1 AS x " +
      "FROM graft.rw_src WHERE k % 5 <> 0 GROUP BY g")
    assert(hitsStore(df, "rw_mv__store"), s"got ${scannedTables(df)}")
    val rows = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows("a") === 16.0) // (10+20)/2 + 1
  }

  test("a STALE view never serves reads — the rewrite just does not fire") {
    setup()
    spark.sql("INSERT INTO graft.rw_src VALUES (7, 'a', 70)")
    val q = "SELECT g, sum(v) AS s FROM graft.rw_src WHERE k % 5 <> 0 GROUP BY g"
    val df = spark.sql(q)
    assert(!hitsStore(df, "rw_mv__store"), "stale MV must not answer the query")
    val m1: Map[String, Long] =
      df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m1("a") === 100L)
    // refresh makes it fresh again — and the rewrite resumes
    spark.sql("CALL graft.refresh_materialized_view('rw_mv')")
    val df2 = spark.sql(q)
    assert(hitsStore(df2, "rw_mv__store"))
    val m2: Map[String, Long] =
      df2.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m2("a") === 100L)
  }

  test("mismatches fall through: filter, grouping, unsupported aggregates, time travel, DISTINCT") {
    setup()
    def stays(q: String): Unit = {
      val df = spark.sql(q)
      assert(!hitsStore(df, "rw_mv__store"), s"must not rewrite: $q")
      df.collect()
    }
    stays("SELECT g, sum(v) AS s FROM graft.rw_src GROUP BY g") // no filter
    stays("SELECT g, sum(v) AS s FROM graft.rw_src WHERE k % 7 <> 0 GROUP BY g")
    stays("SELECT g, k, sum(v) AS s FROM graft.rw_src WHERE k % 5 <> 0 GROUP BY g, k")
    stays("SELECT g, max(v) AS m FROM graft.rw_src WHERE k % 5 <> 0 GROUP BY g")
    stays("SELECT g, sum(k) AS s FROM graft.rw_src WHERE k % 5 <> 0 GROUP BY g") // arg not maintained
    stays("SELECT g, count(DISTINCT v) AS d FROM graft.rw_src WHERE k % 5 <> 0 GROUP BY g")
    stays("SELECT g, sum(v) AS s FROM graft.rw_src VERSION AS OF 1 " +
      "WHERE k % 5 <> 0 GROUP BY g")
    spark.conf.set("spark.graft.mv.rewrite", "false")
    try stays("SELECT g, sum(v) AS s FROM graft.rw_src WHERE k % 5 <> 0 GROUP BY g")
    finally spark.conf.unset("spark.graft.mv.rewrite")
  }

  test("extra group-column predicates apply as a post-filter on the store") {
    setup()
    val df = spark.sql("SELECT g, sum(v) AS s FROM graft.rw_src " +
      "WHERE k % 5 <> 0 AND g IN ('a', 'b') GROUP BY g")
    assert(hitsStore(df, "rw_mv__store"), s"got ${scannedTables(df)}")
    assert(df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("a" -> 30L, "b" -> 30L))
    // ... but an extra NON-group predicate cannot be applied post-hoc
    val miss = spark.sql("SELECT g, sum(v) AS s FROM graft.rw_src " +
      "WHERE k % 5 <> 0 AND v > 15 GROUP BY g")
    assert(!hitsStore(miss, "rw_mv__store"))
    miss.collect()
  }

  test("nullability of the substituted output matches the original exactly") {
    setup()
    val q = "SELECT g, count(*) AS n, sum(v) AS sv " +
      "FROM graft.rw_src WHERE k % 5 <> 0 GROUP BY g"
    val rewritten = spark.sql(q)
    assert(hitsStore(rewritten, "rw_mv__store"))
    spark.conf.set("spark.graft.mv.rewrite", "false")
    val direct = try spark.sql(q) finally spark.conf.unset("spark.graft.mv.rewrite")
    assert(rewritten.schema.map(f => (f.name, f.dataType, f.nullable)) ===
      direct.schema.map(f => (f.name, f.dataType, f.nullable)))
  }

  test("a re-created source at a coincidentally-equal version never serves from the old MV") {
    catalogOn(); dropMv("rw_uuid")
    spark.sql("DROP TABLE IF EXISTS graft.rw_uuid_src")
    spark.sql("CREATE TABLE graft.rw_uuid_src (g STRING, v BIGINT)")
    spark.sql("INSERT INTO graft.rw_uuid_src VALUES ('a', 10)") // v1
    spark.sql("CALL graft.create_materialized_view('rw_uuid', " +
      "'SELECT g, sum(v) AS sv FROM graft.rw_uuid_src GROUP BY g')") // wm=1
    // drop + re-create the source; its NEW clock is also at v1
    spark.sql("DROP TABLE graft.rw_uuid_src")
    spark.sql("CREATE TABLE graft.rw_uuid_src (g STRING, v BIGINT)")
    spark.sql("INSERT INTO graft.rw_uuid_src VALUES ('a', 999)") // v1 again
    val df = spark.sql("SELECT g, sum(v) AS sv FROM graft.rw_uuid_src GROUP BY g")
    assert(!hitsStore(df, "rw_uuid__store"), "old MV must not serve the new table")
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq === Seq(("a", 999L)))
  }

  test("a definition whose GROUP BY order differs from its SELECT order maps columns correctly") {
    catalogOn(); dropMv("rw_order")
    spark.sql("DROP TABLE IF EXISTS graft.rw_order_src")
    spark.sql("CREATE TABLE graft.rw_order_src (a STRING, b STRING, v BIGINT)")
    spark.sql("INSERT INTO graft.rw_order_src VALUES ('a1', 'b1', 10), ('a2', 'b2', 20)")
    // SELECT lists b BEFORE a; GROUP BY lists a BEFORE b — a positional
    // pairing would swap the store columns between the two groups
    spark.sql("CALL graft.create_materialized_view('rw_order', " +
      "'SELECT b, a, sum(v) AS sv FROM graft.rw_order_src GROUP BY a, b')")
    val df = spark.sql("SELECT a, b, sum(v) AS s FROM graft.rw_order_src GROUP BY a, b")
    assert(hitsStore(df, "rw_order__store"), s"got ${scannedTables(df)}")
    assert(df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet ===
      Set(("a1", "b1", 10L), ("a2", "b2", 20L)))
  }

  test("disk-resident MVs serve rewrites after a restart without being read by name") {
    catalogOn(); dropMv("rw_restart")
    spark.sql("DROP TABLE IF EXISTS graft.rw_restart_src")
    spark.sql("CREATE TABLE graft.rw_restart_src (g STRING, v BIGINT) " +
      "TBLPROPERTIES('graft.storage'='parquet')")
    spark.sql("INSERT INTO graft.rw_restart_src VALUES ('a', 10), ('b', 20)")
    spark.sql("CALL graft.create_materialized_view('rw_restart', " +
      "'SELECT g, sum(v) AS sv FROM graft.rw_restart_src GROUP BY g')")
    // the restart drill: no in-memory MV state at all, only disk —
    // and the first touch is a query on the SOURCE, never naming the MV
    val saved = MatViews.registry.toMap
    saved.keys.foreach(MatViews.forget)
    MemTables.unload("rw_restart__store")
    MatViews.resetRecoveryMemos()
    try {
      val df = spark.sql("SELECT g, sum(v) AS s FROM graft.rw_restart_src GROUP BY g")
      assert(hitsStore(df, "rw_restart__store"), s"got ${scannedTables(df)}")
      assert(df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
        Map("a" -> 10L, "b" -> 20L))
    } finally saved.foreach { case (k, v) =>
      if (!MatViews.registry.contains(k)) MatViews.registry.put(k, v)
    }
  }

  test("maintained min/max components serve user min/max queries") {
    catalogOn(); dropMv("rw_ext")
    spark.sql("DROP TABLE IF EXISTS graft.rw_ext_src")
    spark.sql("CREATE TABLE graft.rw_ext_src (g STRING, v BIGINT)")
    spark.sql("INSERT INTO graft.rw_ext_src VALUES ('a', 10), ('a', 30), ('b', NULL)")
    spark.sql("CALL graft.create_materialized_view('rw_ext', " +
      "'SELECT g, min(v) AS lo, max(v) AS hi FROM graft.rw_ext_src GROUP BY g')")
    val df = spark.sql("SELECT g, max(v) AS m, min(v) AS n FROM graft.rw_ext_src GROUP BY g")
    assert(hitsStore(df, "rw_ext__store"), s"got ${scannedTables(df)}")
    val m = df.collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(m("a") === Seq(30L, 10L))
    assert(m("b") === Seq(null, null))
    // avg of the same argument is NOT derivable from extremes — stays on the source
    val miss = spark.sql("SELECT g, avg(v) AS a FROM graft.rw_ext_src GROUP BY g")
    assert(!hitsStore(miss, "rw_ext__store"))
    miss.collect()
  }

  test("an MV maintaining avg serves sum and count of the same argument") {
    catalogOn(); dropMv("rw_avg")
    spark.sql("DROP TABLE IF EXISTS graft.rw_avg_src")
    spark.sql("CREATE TABLE graft.rw_avg_src (g STRING, v BIGINT)")
    spark.sql("INSERT INTO graft.rw_avg_src VALUES ('a', 10), ('a', 30), ('b', NULL)")
    spark.sql("CALL graft.create_materialized_view('rw_avg', " +
      "'SELECT g, avg(v) AS av FROM graft.rw_avg_src GROUP BY g')")
    val df = spark.sql("SELECT g, sum(v) AS s, count(v) AS c FROM graft.rw_avg_src GROUP BY g")
    assert(df.queryExecution.executedPlan.collect {
      case s: BatchScanExec => s.table.name()
    }.contains("rw_avg__store"))
    val m = df.collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(m("a") === Seq(40L, 2L))
    assert(m("b") === Seq(null, 0L))
  }

  // ------------------------------------------------------------- rollup

  /** Two-grain fixture: MV at (g, h); rollup queries at g / global. */
  private def setupRollup(): Unit = {
    catalogOn(); dropMv("rw_ru")
    spark.sql("DROP TABLE IF EXISTS graft.rw_src_ru")
    spark.sql("CREATE TABLE graft.rw_src_ru (k BIGINT, g STRING, h STRING, v BIGINT)")
    // uneven group sizes (avg-of-avgs would be WRONG), NULL v inputs,
    // one (g,h) group whose v is all-NULL (stored sum 0 / cnt 0 / min NULL)
    spark.sql("INSERT INTO graft.rw_src_ru VALUES " +
      "(1, 'a', 'x', 10), (2, 'a', 'x', 20), (3, 'a', 'y', 300), " +
      "(4, 'b', 'x', NULL), (5, 'b', 'y', 50), (6, 'b', 'y', 70), (7, 'c', 'x', NULL)")
    spark.sql("CALL graft.create_materialized_view('rw_ru', " +
      "'SELECT g, h, count(*) AS n, count(v) AS cv, sum(v) AS sv, " +
      "avg(v) AS av, min(v) AS mn, max(v) AS mx " +
      "FROM graft.rw_src_ru GROUP BY g, h')")
  }

  private def sameAsUnrewritten(q: String, store: String): Unit = {
    val df = spark.sql(q)
    assert(hitsStore(df, store), s"expected store scan, got ${scannedTables(df)}")
    spark.conf.set("spark.graft.mv.rewrite", "false")
    val direct = try spark.sql(q)
    finally spark.conf.unset("spark.graft.mv.rewrite")
    assert(df.collect().toSeq.map(_.toSeq).sortBy(_.toString) ===
      direct.collect().toSeq.map(_.toSeq).sortBy(_.toString))
    assert(df.schema === direct.schema,
      s"rollup schema drifted: ${df.schema} vs ${direct.schema}")
  }

  test("a COARSER grouping re-aggregates the store: sum/count/avg/count(x)") {
    setupRollup()
    // avg at the coarse grain MUST recompose sum/count: group 'a' holds
    // sizes 2 and 1 with means 15 and 300 — avg-of-avgs would say 157.5,
    // the truth is 110
    val q = "SELECT g, count(*) AS n, count(v) AS cv, sum(v) AS sv, " +
      "avg(v) AS av FROM graft.rw_src_ru GROUP BY g"
    sameAsUnrewritten(q, "rw_ru__store")
    val m = spark.sql(q).collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(m("a") === Seq(3L, 3L, 330L, 110.0))
    assert(m("b") === Seq(3L, 2L, 120L, 60.0))
    assert(m("c") === Seq(1L, 0L, null, null)) // all-NULL input group
  }

  test("the empty grouping set (global) rolls up from the store") {
    setupRollup()
    sameAsUnrewritten(
      "SELECT count(*) AS n, sum(v) AS sv, avg(v) AS av, count(v) AS cv " +
        "FROM graft.rw_src_ru", "rw_ru__store")
    val r = spark.sql(
      "SELECT count(*) AS n, sum(v) AS sv FROM graft.rw_src_ru").head()
    assert((r.getLong(0), r.getLong(1)) === ((7L, 450L)))
  }

  test("min/max roll up as min-of-mins / max-of-maxs") {
    setupRollup()
    val q = "SELECT g, min(v) AS mn, max(v) AS mx " +
      "FROM graft.rw_src_ru GROUP BY g"
    sameAsUnrewritten(q, "rw_ru__store")
    val m = spark.sql(q).collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(m("a") === Seq(10L, 300L))
    assert(m("c") === Seq(null, null)) // stored NULL extreme is ignored, not folded
  }

  test("rollup honors extra predicates on the grain the query dropped") {
    setupRollup()
    // h is NOT in the query's grouping set, but it IS a store-grain group
    // column: the predicate selects whole finer groups below the rollup
    val q = "SELECT g, sum(v) AS sv, count(*) AS n FROM graft.rw_src_ru " +
      "WHERE h = 'y' GROUP BY g"
    sameAsUnrewritten(q, "rw_ru__store")
    val m = spark.sql(q).collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(m === Map("a" -> Seq(300L, 1L), "b" -> Seq(120L, 2L)))
  }

  test("a grouping FINER than the store grain never serves") {
    setupRollup()
    val df = spark.sql(
      "SELECT g, h, k, count(*) AS n FROM graft.rw_src_ru GROUP BY g, h, k")
    assert(!hitsStore(df, "rw_ru__store"),
      "a finer grain cannot be recovered from the store")
    df.collect()
    // and a grouping disjoint from the grain falls through too
    val df2 = spark.sql(
      "SELECT k, count(*) AS n FROM graft.rw_src_ru GROUP BY k")
    assert(!hitsStore(df2, "rw_ru__store"))
    df2.collect()
  }

  test("rollup on an EMPTY store emits the single global row SQL requires") {
    catalogOn(); dropMv("rw_ru0")
    spark.sql("DROP TABLE IF EXISTS graft.rw_src_ru0")
    spark.sql("CREATE TABLE graft.rw_src_ru0 (g STRING, v BIGINT)")
    spark.sql("CALL graft.create_materialized_view('rw_ru0', " +
      "'SELECT g, count(*) AS n, sum(v) AS sv FROM graft.rw_src_ru0 GROUP BY g')")
    val q = "SELECT count(*) AS n, sum(v) AS sv FROM graft.rw_src_ru0"
    sameAsUnrewritten(q, "rw_ru0__store")
    val r = spark.sql(q).head()
    assert((r.getLong(0), r.isNullAt(1)) === ((0L, true)))
  }

  test("rollup stays correct across an incremental refresh cycle") {
    setupRollup()
    spark.sql("INSERT INTO graft.rw_src_ru VALUES (8, 'a', 'y', 1000)")
    val q = "SELECT g, sum(v) AS sv FROM graft.rw_src_ru GROUP BY g"
    assert(!hitsStore(spark.sql(q), "rw_ru__store"), "stale: must not serve")
    spark.sql("CALL graft.refresh_materialized_view('rw_ru')")
    sameAsUnrewritten(q, "rw_ru__store")
    assert(spark.sql(q).collect()
      .filter(_.getString(0) == "a").map(_.getLong(1)).toSeq === Seq(1330L))
  }
}
