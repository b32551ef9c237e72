package graft.sources

import graft.SparkSpec

/** count(DISTINCT x) materialized-view components ([[MatViews]] +
  * [[graft.functions.NdvSketchAgg]]): stored as per-group NDV sketches —
  * EXACT serving below the sketch's 2048-value exact mode, set-union
  * folding under insert-only windows, loud full recompute the moment a
  * window removes rows (a sketch cannot un-see a value), and the query
  * rewrite never serves a distinct aggregate from the store.
  */
class CountDistinctMvSpec extends SparkSpec {

  private def catalogOn(): Unit =
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")

  private def drop(names: String*): Unit =
    names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS graft.$n"))

  private def mvRows(name: String): Seq[(String, Long, Long)] =
    spark.sql(s"SELECT g, n, dx FROM graft.$name ORDER BY g")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  private def direct(tbl: String): Seq[(String, Long, Long)] =
    spark.sql(s"SELECT g, count(*) AS n, count(DISTINCT v) AS dx " +
      s"FROM graft.$tbl GROUP BY g ORDER BY g")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  test("insert-only windows fold incrementally; exact below the sketch ceiling") {
    catalogOn(); drop("cd_src")
    MatViews.drop("cd_mv")
    spark.sql("CREATE TABLE graft.cd_src (g STRING, v BIGINT) " +
      "TBLPROPERTIES ('graft.storage'='parquet')")
    spark.sql("INSERT INTO graft.cd_src " +
      "SELECT concat('g', id % 3), id % 40 FROM range(0, 200)")
    spark.sql("CALL graft.create_materialized_view('cd_mv', " +
      "'SELECT g, count(*) AS n, count(DISTINCT v) AS dx " +
      "FROM graft.cd_src GROUP BY g')")
    // the stored component is a BINARY sketch, not positions
    val storeSchema = MemTables.get("cd_mv__store").get.schema
    assert(storeSchema.fieldNames.contains("__mv_ndv_dx"))
    assert(storeSchema("__mv_ndv_dx").dataType ===
      org.apache.spark.sql.types.BinaryType)
    assert(mvRows("cd_mv") === direct("cd_src"))
    // overlapping + new values: the union must not double-count re-seen
    // values, and must count the genuinely new ones
    spark.sql("INSERT INTO graft.cd_src " +
      "SELECT concat('g', id % 3), id % 55 FROM range(0, 110)")
    val res = spark.sql("CALL graft.refresh_materialized_view('cd_mv')")
      .collect().head
    assert(res.getString(1) === "incremental",
      s"insert-only window must fold incrementally, got ${res.getString(1)}")
    assert(mvRows("cd_mv") === direct("cd_src"))
    spark.sql("CALL graft.drop_materialized_view('cd_mv')")
    drop("cd_src")
  }

  test("a row-removing window forces a loud full recompute, values exact") {
    catalogOn(); drop("cd_del")
    MatViews.drop("cd_dmv")
    spark.sql("CREATE TABLE graft.cd_del (g STRING, v BIGINT) " +
      "TBLPROPERTIES ('graft.storage'='parquet')")
    spark.sql("INSERT INTO graft.cd_del " +
      "SELECT concat('g', id % 2), id % 30 FROM range(0, 120)")
    spark.sql("CALL graft.create_materialized_view('cd_dmv', " +
      "'SELECT g, count(*) AS n, count(DISTINCT v) AS dx " +
      "FROM graft.cd_del GROUP BY g')")
    // delete every row carrying v >= 20: some groups lose distinct values
    // — a sketch cannot un-see them, so the refresh must go full
    spark.sql("DELETE FROM graft.cd_del WHERE v >= 20")
    val res = spark.sql("CALL graft.refresh_materialized_view('cd_dmv')")
      .collect().head
    assert(res.getString(1) === "full",
      s"row-removing window must force mode=full, got ${res.getString(1)}")
    assert(spark.sql("SELECT g, n, dx FROM graft.cd_dmv ORDER BY g")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
      spark.sql("SELECT g, count(*) AS n, count(DISTINCT v) AS dx " +
        "FROM graft.cd_del GROUP BY g ORDER BY g")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
    spark.sql("CALL graft.drop_materialized_view('cd_dmv')")
    drop("cd_del")
  }

  test("recovery: the sketch component round-trips the durable journal") {
    catalogOn(); drop("cd_rec")
    MatViews.drop("cd_rmv")
    spark.sql("CREATE TABLE graft.cd_rec (g STRING, v BIGINT) " +
      "TBLPROPERTIES ('graft.storage'='parquet')")
    spark.sql("INSERT INTO graft.cd_rec " +
      "SELECT concat('g', id % 2), id % 25 FROM range(0, 100)")
    spark.sql("CALL graft.create_materialized_view('cd_rmv', " +
      "'SELECT g, count(*) AS n, count(DISTINCT v) AS dx " +
      "FROM graft.cd_rec GROUP BY g')")
    val before = spark.sql("SELECT g, n, dx FROM graft.cd_rmv ORDER BY g")
      .collect().map(_.toString).toSeq
    // restart drill: forget the registry entry + unload the store table
    MatViews.forget("cd_rmv")
    MatViews.resetRecoveryMemos()
    spark.sql("CALL graft.unload_table('cd_rmv__store')")
    assert(spark.sql("SELECT g, n, dx FROM graft.cd_rmv ORDER BY g")
      .collect().map(_.toString).toSeq === before)
    // and the recovered view still refreshes incrementally
    spark.sql("INSERT INTO graft.cd_rec VALUES ('g0', 999)")
    val res = spark.sql("CALL graft.refresh_materialized_view('cd_rmv')")
      .collect().head
    assert(res.getString(1) === "incremental")
    assert(spark.sql("SELECT dx FROM graft.cd_rmv WHERE g = 'g0'")
      .collect().head.getLong(0) ===
      spark.sql("SELECT count(DISTINCT v) FROM graft.cd_rec WHERE g = 'g0'")
        .collect().head.getLong(0))
    spark.sql("CALL graft.drop_materialized_view('cd_rmv')")
    drop("cd_rec")
  }

  test("the rewrite never serves a distinct aggregate from the sketch") {
    catalogOn(); drop("cd_rw")
    MatViews.drop("cd_wmv")
    spark.sql("CREATE TABLE graft.cd_rw (g STRING, v BIGINT) " +
      "TBLPROPERTIES ('graft.storage'='parquet')")
    spark.sql("INSERT INTO graft.cd_rw " +
      "SELECT concat('g', id % 2), id % 10 FROM range(0, 50)")
    spark.sql("CALL graft.create_materialized_view('cd_wmv', " +
      "'SELECT g, count(*) AS n, count(DISTINCT v) AS dx " +
      "FROM graft.cd_rw GROUP BY g')")
    // a fresh MV serves count(*) via the rewrite, but the DISTINCT query
    // must recompute from the source (exactness contract)
    val distinctQ = spark.sql(
      "SELECT g, count(DISTINCT v) AS dx FROM graft.cd_rw GROUP BY g")
    val scans = distinctQ.queryExecution.executedPlan.toString()
    assert(!scans.contains("cd_wmv__store"),
      "count(DISTINCT) must never be served from the sketch store")
    // values are exact either way
    assert(distinctQ.collect().map(r =>
      (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq ===
      Seq(("g0", 5L), ("g1", 5L)))
    spark.sql("CALL graft.drop_materialized_view('cd_wmv')")
    drop("cd_rw")
  }
}
