package graft.sources

import graft.SparkSpec

/** Catalog-owned VIEWS ([[MemViews]] + [[graft.plans.ResolveGraftViews]]
  * + the `ViewCatalog` API): `CALL graft.create_view` registers, reads
  * resolve `graft.<view>` through the stored SQL (re-parsed, so schema
  * evolution and time travel underneath compose), views survive catalog
  * re-registration within the process, and DDL failure modes are loud.
  * (OSS Spark 4.1 hard-rejects `CREATE VIEW` SQL against non-session
  * catalogs — the procedure surface + injected resolution is the same
  * technique Iceberg's extensions use.)
  */
class ViewCatalogSpec extends SparkSpec {

  private def catalogOn(): Unit =
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")

  private def drop(names: String*): Unit =
    names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS graft.$n"))

  test("create_view / read / drop_view; live state and time travel compose") {
    catalogOn(); drop("vc_t")
    MemViews.views.remove("vc_v"); MemViews.views.remove("vc_v1")
    spark.sql("CREATE TABLE graft.vc_t (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft.vc_t SELECT id, id * 2 FROM range(0, 10)") // v1
    val made = spark.sql(
      "CALL graft.create_view('vc_v', 'SELECT k, v FROM graft.vc_t WHERE k >= 5')")
      .collect()(0)
    assert(made.getString(0) === "vc_v")
    assert(made.getString(1).contains("k"))
    assert(spark.sql("SELECT count(*) FROM graft.vc_v").head().getLong(0) === 5L)
    // the view re-resolves LIVE state: new data shows up
    spark.sql("INSERT INTO graft.vc_t VALUES (100, 0)") // v2
    assert(spark.sql("SELECT count(*) FROM graft.vc_v").head().getLong(0) === 6L)
    // a view can pin a snapshot via time travel underneath
    spark.sql("CALL graft.create_view('vc_v1', " +
      "'SELECT count(*) AS c FROM graft.vc_t VERSION AS OF 1')")
    assert(spark.sql("SELECT c FROM graft.vc_v1").head().getLong(0) === 10L)
    // views join tables and each other (nested resolution by fixpoint)
    assert(spark.sql(
      "SELECT count(*) FROM graft.vc_v a JOIN graft.vc_t b ON a.k = b.k")
      .head().getLong(0) === 6L)
    spark.sql("CALL graft.drop_view('vc_v1')")
    spark.sql("CALL graft.drop_view('vc_v')")
    assert(!MemViews.views.contains("vc_v"))
    intercept[Exception](spark.sql("SELECT * FROM graft.vc_v").collect())
    drop("vc_t")
  }

  test("views survive catalog re-registration (process-wide store)") {
    catalogOn(); drop("vc_surv_t")
    MemViews.views.remove("vc_surv")
    spark.sql("CREATE TABLE graft.vc_surv_t (k BIGINT)")
    spark.sql("INSERT INTO graft.vc_surv_t VALUES (1), (2)")
    spark.sql("CALL graft.create_view('vc_surv', 'SELECT k FROM graft.vc_surv_t')")
    // simulate a session restart: unset + re-register the catalog (plugin
    // instances rebuild; the store is process-wide like MemTables)
    spark.conf.unset("spark.sql.catalog.graft")
    catalogOn()
    assert(spark.sql("SELECT count(*) FROM graft.vc_surv").head().getLong(0) === 2L)
    spark.sql("CALL graft.drop_view('vc_surv')")
    drop("vc_surv_t")
  }

  test("views cannot shadow tables; broken SQL fails the creator") {
    catalogOn(); drop("vc_shadow")
    spark.sql("CREATE TABLE graft.vc_shadow (k BIGINT)")
    val shadow = intercept[Exception](
      spark.sql("CALL graft.create_view('vc_shadow', 'SELECT 1 AS x')"))
    assert(shadow.getMessage.contains("shadow"), shadow.getMessage)
    // a view over a missing table fails at CALL time, not first read
    intercept[Exception](
      spark.sql("CALL graft.create_view('vc_bad', 'SELECT * FROM graft.nope')"))
    assert(!MemViews.views.contains("vc_bad"))
    intercept[Exception](spark.sql("CALL graft.drop_view('vc_missing')"))
    drop("vc_shadow")
    // ...and the REVERSE: a table cannot shadow an existing view (reads
    // of the shared name would silently keep resolving to the view)
    spark.sql("CALL graft.create_view('vc_taken', 'SELECT 1 AS one')")
    val taken = intercept[Exception](
      spark.sql("CREATE TABLE graft.vc_taken (k BIGINT)"))
    assert(taken.getMessage.toLowerCase.contains("view"), taken.getMessage)
    // the view still answers — nothing was clobbered
    assert(spark.sql("SELECT one FROM graft.vc_taken").head().getInt(0) === 1)
    spark.sql("CALL graft.drop_view('vc_taken')")
  }

  test("late binding: dropped/renamed dependencies fail naming the VIEW") {
    catalogOn(); drop("vc_dep", "vc_dep2")
    MemViews.views.remove("vc_over")
    spark.sql("CREATE TABLE graft.vc_dep (k BIGINT)")
    spark.sql("INSERT INTO graft.vc_dep VALUES (1), (2)")
    spark.sql("CALL graft.create_view('vc_over', " +
      "'SELECT k FROM graft.vc_dep WHERE k > 0')")
    assert(spark.sql("SELECT count(*) FROM graft.vc_over").head().getLong(0) === 2L)
    // DROP the dependency: the read fails with an error naming the view,
    // its missing dependency, and the stored SQL — never a bare
    // TABLE_OR_VIEW_NOT_FOUND about the inner table
    spark.sql("DROP TABLE graft.vc_dep")
    val e = intercept[Exception](spark.sql("SELECT * FROM graft.vc_over").collect())
    assert(e.getMessage.contains("vc_over"), e.getMessage)
    assert(e.getMessage.contains("vc_dep"), e.getMessage)
    assert(e.getMessage.contains("no longer exists"), e.getMessage)
    // late binding: RECREATING the table heals the view (the view tracks
    // the name, not the table identity)
    spark.sql("CREATE TABLE graft.vc_dep (k BIGINT)")
    spark.sql("INSERT INTO graft.vc_dep VALUES (5)")
    assert(spark.sql("SELECT count(*) FROM graft.vc_over").head().getLong(0) === 1L)
    // RENAME equally strands the stored name
    spark.sql("ALTER TABLE graft.vc_dep RENAME TO graft.vc_dep2")
    val r = intercept[Exception](spark.sql("SELECT * FROM graft.vc_over").collect())
    assert(r.getMessage.contains("vc_over") && r.getMessage.contains("vc_dep"),
      r.getMessage)
    spark.sql("CALL graft.drop_view('vc_over')")
    drop("vc_dep", "vc_dep2")
  }

  test("view expansion binds bare names to the CREATOR's catalog context") {
    catalogOn(); drop("vc_ctx_t")
    MemViews.views.remove("vc_ctx_v")
    spark.sql("CREATE TABLE graft.vc_ctx_t (k BIGINT)")
    spark.sql("INSERT INTO graft.vc_ctx_t VALUES (1), (2), (3)")
    val cm = spark.sessionState.catalogManager
    val prev = cm.currentCatalog.name()
    cm.setCurrentCatalog("graft")
    try {
      // analyzed at CALL time under catalog 'graft'; the bare name is legal
      spark.sql(
        "CALL graft.create_view('vc_ctx_v', 'SELECT k FROM vc_ctx_t WHERE k > 1')")
      // a CTE-bound bare name must stay CTE-bound, never get qualified
      // (a CTE that SHADOWS a real table name is rejected at create — the
      // vc_guard spec pins that; here the CTE name is unambiguous)
      MemViews.views.remove("vc_ctx_cte")
      spark.sql("CALL graft.create_view('vc_ctx_cte', " +
        "'WITH vc_ctx_c AS (SELECT 99 AS k) SELECT k FROM vc_ctx_c')")
    } finally cm.setCurrentCatalog(prev)
    // the READER's current catalog is different — the view's bare
    // dependency still resolves against the creator's context
    assert(spark.sql("SELECT count(*) FROM graft.vc_ctx_v").head().getLong(0) === 2L)
    assert(spark.sql("SELECT k FROM graft.vc_ctx_cte").head().getInt(0) === 99)
    spark.sql("CALL graft.drop_view('vc_ctx_v')")
    spark.sql("CALL graft.drop_view('vc_ctx_cte')")
    drop("vc_ctx_t")
  }

  test("create_view rejects temp-view deps and CTE/table name collisions") {
    catalogOn(); drop("vc_guard_t")
    MemViews.views.remove("vc_guard_v")
    spark.sql("CREATE TABLE graft.vc_guard_t (k BIGINT)")
    spark.sql("INSERT INTO graft.vc_guard_t VALUES (1)")
    // a temp-view dependency analyzes fine at CALL time but would mint a
    // view readable by NO ONE (the read-time re-binding points bare names
    // at catalog tables) — Spark's own permanent-view rule: reject
    spark.range(3).createOrReplaceTempView("vc_guard_tmp")
    val e1 = intercept[Exception](spark.sql(
      "CALL graft.create_view('vc_guard_v', 'SELECT * FROM vc_guard_tmp')"))
    assert(e1.getMessage.contains("temporary view"), e1.getMessage)
    // CTE names stay usable — including shadowing a temp view is rejected
    // only when ambiguous; a pure CTE reference is fine
    spark.sql("CALL graft.create_view('vc_guard_v', " +
      "'WITH c AS (SELECT 5 AS k) SELECT k FROM c')")
    assert(spark.sql("SELECT k FROM graft.vc_guard_v").head().getInt(0) === 5)
    spark.sql("CALL graft.drop_view('vc_guard_v')")
    // a bare name matching BOTH a CTE in the SQL and a catalog table is
    // scope-ambiguous for the read-time rewriter — reject at create
    val cm = spark.sessionState.catalogManager
    val prev = cm.currentCatalog.name()
    cm.setCurrentCatalog("graft")
    try {
      val e2 = intercept[Exception](spark.sql(
        "CALL graft.create_view('vc_guard_v', " +
          "'SELECT a.k FROM vc_guard_t a WHERE a.k IN " +
          "(WITH vc_guard_t AS (SELECT 1 AS k) SELECT k FROM vc_guard_t)')"))
      assert(e2.getMessage.contains("matches both a CTE"), e2.getMessage)
    } finally cm.setCurrentCatalog(prev)
    spark.catalog.dropTempView("vc_guard_tmp")
    drop("vc_guard_t")
  }

  test("late binding sees dependencies inside subquery expressions") {
    catalogOn(); drop("vc_sub_a", "vc_sub_b")
    MemViews.views.remove("vc_sub_v")
    spark.sql("CREATE TABLE graft.vc_sub_a (k BIGINT)")
    spark.sql("CREATE TABLE graft.vc_sub_b (k BIGINT)")
    spark.sql("INSERT INTO graft.vc_sub_a VALUES (1), (2)")
    spark.sql("INSERT INTO graft.vc_sub_b VALUES (2)")
    spark.sql("CALL graft.create_view('vc_sub_v', " +
      "'SELECT k FROM graft.vc_sub_a WHERE k IN (SELECT k FROM graft.vc_sub_b)')")
    assert(spark.sql("SELECT count(*) FROM graft.vc_sub_v").head().getLong(0) === 1L)
    // the dependency lives inside a subquery EXPRESSION — the operator
    // walk alone would miss it and surface a raw TABLE_OR_VIEW_NOT_FOUND
    spark.sql("DROP TABLE graft.vc_sub_b")
    val e = intercept[Exception](spark.sql("SELECT * FROM graft.vc_sub_v").collect())
    assert(e.getMessage.contains("vc_sub_v"), e.getMessage)
    assert(e.getMessage.contains("vc_sub_b"), e.getMessage)
    assert(e.getMessage.contains("no longer exists"), e.getMessage)
    spark.sql("CALL graft.drop_view('vc_sub_v')")
    drop("vc_sub_a")
  }

  test("ViewCatalog API: create/load/alter/rename/drop round-trip") {
    catalogOn(); drop("vc_api_t")
    MemViews.views.remove("vc_api"); MemViews.views.remove("vc_api2")
    spark.sql("CREATE TABLE graft.vc_api_t (k BIGINT)")
    import org.apache.spark.sql.connector.catalog.{Identifier, ViewChange, ViewInfo}
    import org.apache.spark.sql.types._
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[SeqCatalog]
    def id(n: String) = Identifier.of(Array.empty, n)
    cat.createView(new ViewInfo(id("vc_api"), "SELECT k FROM graft.vc_api_t",
      "graft", Array.empty[String], new StructType().add("k", LongType),
      Array("k"), Array.empty[String], Array.empty[String],
      new java.util.HashMap[String, String]()))
    assert(cat.viewExists(id("vc_api")))
    val v = cat.loadView(id("vc_api"))
    assert(v.query() === "SELECT k FROM graft.vc_api_t")
    assert(v.schema().fieldNames.toSeq === Seq("k"))
    cat.alterView(id("vc_api"), ViewChange.setProperty("team", "graft"))
    assert(cat.loadView(id("vc_api")).properties().get("team") === "graft")
    cat.alterView(id("vc_api"), ViewChange.removeProperty("team"))
    assert(!cat.loadView(id("vc_api")).properties().containsKey("team"))
    cat.renameView(id("vc_api"), id("vc_api2"))
    assert(!cat.viewExists(id("vc_api")) && cat.viewExists(id("vc_api2")))
    assert(cat.listViews().map(_.name()).contains("vc_api2"))
    assert(cat.dropView(id("vc_api2")))
    intercept[Exception](cat.loadView(id("vc_api2")))
    drop("vc_api_t")
  }
}
