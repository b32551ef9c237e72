package graft.sources

import graft.SparkSpec

/** Incremental materialized views ([[MatViews]]): create-time
  * materialization, delta refresh from the change feed (inserts, updates,
  * deletes, group death, NULL groups, all-NULL sum inputs), the full
  * fallback past the retention horizon, write-intent crash repair, disk
  * recovery, and the create-time validation wall.
  */
class MaterializedViewSpec extends SparkSpec {

  private def catalogOn(): Unit =
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")

  private def dropMv(name: String): Unit = {
    MatViews.forget(name)
    MemTables.drop(name + MatViews.StoreSuffix)
    MemViews.views.remove(name)
    ()
  }

  private def freshSrc(name: String, rows: String*): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS graft.$name")
    spark.sql(s"CREATE TABLE graft.$name (k BIGINT, g STRING, v BIGINT)")
    rows.foreach(r => spark.sql(s"INSERT INTO graft.$name VALUES $r"))
  }

  private def rowsOf(sql: String): Seq[Seq[Any]] =
    spark.sql(sql).collect().toSeq.map(_.toSeq)

  test("create materializes the aggregate and registers a readable view") {
    catalogOn(); dropMv("mv_basic"); freshSrc("mv_basic_src",
      "(1, 'a', 10), (2, 'a', 20), (3, 'b', 30), (4, 'b', NULL), (6, 'c', 60)")
    val res = spark.sql("CALL graft.create_materialized_view('mv_basic', " +
      "'SELECT g, count(*) AS n, count(v) AS nv, sum(v) AS sv, avg(v) AS av " +
      "FROM graft.mv_basic_src WHERE k % 5 <> 0 GROUP BY g')").head()
    assert(res.getString(0) === "mv_basic")
    assert(res.getString(1) === "mv_basic__store")
    assert(res.getLong(2) === 1L) // create(0) + one insert
    assert(res.getLong(3) === 3L) // three groups
    assert(rowsOf("SELECT g, n, nv, sv, av FROM graft.mv_basic ORDER BY g") ===
      rowsOf("SELECT g, count(*) AS n, count(v) AS nv, sum(v) AS sv, avg(v) AS av " +
        "FROM graft.mv_basic_src WHERE k % 5 <> 0 GROUP BY g ORDER BY g"))
    // k=4 row: NULL v counts toward n but not nv/sv/av
    val b = spark.sql("SELECT n, nv, sv FROM graft.mv_basic WHERE g = 'b'").head()
    assert((b.getLong(0), b.getLong(1), b.getLong(2)) === ((2L, 1L, 30L)))
  }

  test("incremental refresh folds inserts, updates, deletes, and group death") {
    catalogOn(); dropMv("mv_incr"); freshSrc("mv_incr_src",
      "(1, 'a', 10), (2, 'a', 20), (3, 'b', 30), (4, 'c', 40)")
    spark.sql("CALL graft.create_materialized_view('mv_incr', " +
      "'SELECT g, count(*) AS n, sum(v) AS sv FROM graft.mv_incr_src GROUP BY g')")
    spark.sql("INSERT INTO graft.mv_incr_src VALUES (5, 'a', 50), (6, 'd', 60)") // v2
    spark.sql("UPDATE graft.mv_incr_src SET v = v + 7 WHERE g = 'b'") // v3
    spark.sql("DELETE FROM graft.mv_incr_src WHERE g = 'c'") // v4: group death
    val r = spark.sql("CALL graft.refresh_materialized_view('mv_incr')").head()
    assert(r.getString(1) === "incremental")
    assert((r.getLong(2), r.getLong(3)) === ((1L, 4L)))
    assert(rowsOf("SELECT g, n, sv FROM graft.mv_incr ORDER BY g") ===
      rowsOf("SELECT g, count(*) AS n, sum(v) AS sv FROM graft.mv_incr_src " +
        "GROUP BY g ORDER BY g"))
    assert(spark.sql("SELECT * FROM graft.mv_incr WHERE g = 'c'").count() === 0L)
    // second refresh with nothing new: noop, watermark already current
    val r2 = spark.sql("CALL graft.refresh_materialized_view('mv_incr')").head()
    assert(r2.getString(1) === "noop")
    assert(r2.getLong(2) === r2.getLong(3))
  }

  test("NULL group keys are real groups; all-NULL sum inputs read NULL") {
    catalogOn(); dropMv("mv_nulls"); freshSrc("mv_nulls_src",
      "(1, NULL, 10), (2, NULL, NULL), (3, 'a', NULL)")
    spark.sql("CALL graft.create_materialized_view('mv_nulls', " +
      "'SELECT g, count(*) AS n, sum(v) AS sv FROM graft.mv_nulls_src GROUP BY g')")
    // group 'a' exists with all-NULL v: sum must read NULL, not 0
    val a0 = spark.sql("SELECT n, sv FROM graft.mv_nulls WHERE g = 'a'").head()
    assert(a0.getLong(0) === 1L && a0.isNullAt(1))
    // grow the NULL group and give 'a' a real value
    spark.sql("INSERT INTO graft.mv_nulls_src VALUES (4, NULL, 40), (5, 'a', 50)")
    // delete one NULL-group row (the NULL-v one)
    spark.sql("DELETE FROM graft.mv_nulls_src WHERE k = 2")
    spark.sql("CALL graft.refresh_materialized_view('mv_nulls')")
    assert(rowsOf("SELECT g, n, sv FROM graft.mv_nulls ORDER BY g NULLS FIRST") ===
      rowsOf("SELECT g, count(*) AS n, sum(v) AS sv FROM graft.mv_nulls_src " +
        "GROUP BY g ORDER BY g NULLS FIRST"))
    val a1 = spark.sql("SELECT n, sv FROM graft.mv_nulls WHERE g = 'a'").head()
    assert(a1.getLong(0) === 2L && a1.getLong(1) === 50L)
  }

  test("refresh falls back to a full recompute past the retention horizon") {
    catalogOn(); dropMv("mv_full"); freshSrc("mv_full_src",
      "(1, 'a', 10), (2, 'b', 20)")
    spark.sql("CALL graft.create_materialized_view('mv_full', " +
      "'SELECT g, count(*) AS n, sum(v) AS sv FROM graft.mv_full_src GROUP BY g')")
    spark.sql("INSERT INTO graft.mv_full_src VALUES (3, 'a', 30)") // v2
    spark.sql("DELETE FROM graft.mv_full_src WHERE k = 2") // v3
    // age the watermark (v1) out of retention: incremental is impossible
    spark.sql("CALL graft.expire_snapshots('mv_full_src', 3)")
    val r = spark.sql("CALL graft.refresh_materialized_view('mv_full')").head()
    assert(r.getString(1) === "full")
    assert((r.getLong(2), r.getLong(3)) === ((1L, 3L)))
    assert(rowsOf("SELECT g, n, sv FROM graft.mv_full ORDER BY g") ===
      rowsOf("SELECT g, count(*) AS n, sum(v) AS sv FROM graft.mv_full_src " +
        "GROUP BY g ORDER BY g"))
  }

  test("write-intent repair: a committed merge with a lost watermark is rolled back, not double-applied") {
    catalogOn(); dropMv("mv_crash"); freshSrc("mv_crash_src",
      "(1, 'a', 10), (2, 'b', 20)")
    spark.sql("CALL graft.create_materialized_view('mv_crash', " +
      "'SELECT g, count(*) AS n, sum(v) AS sv FROM graft.mv_crash_src GROUP BY g')")
    val before = MatViews.registry("mv_crash")
    val storeV0 = MemTables.get("mv_crash__store").get.version
    spark.sql("INSERT INTO graft.mv_crash_src VALUES (3, 'a', 30)") // v2
    spark.sql("CALL graft.refresh_materialized_view('mv_crash')") // merge commits
    val good = rowsOf("SELECT g, n, sv FROM graft.mv_crash ORDER BY g")
    assert(good === Seq(Seq("a", 2L, 40L), Seq("b", 1L, 20L)))
    // simulate the crash window: merge committed (store advanced past
    // storeV0) but the journal still shows the OLD watermark + intent
    val stale = before.copy(pending =
      Some(MatViews.Pending(before.watermark, 2L, storeV0)))
    MatViews.registry.put("mv_crash", stale)
    MatViews.persist(stale)
    val r = spark.sql("CALL graft.refresh_materialized_view('mv_crash')").head()
    assert(r.getString(1) === "incremental")
    assert((r.getLong(2), r.getLong(3)) === ((before.watermark, 2L)))
    // double-application would read (a, 2, 70): the repair must land the
    // same contents as the clean refresh
    assert(rowsOf("SELECT g, n, sv FROM graft.mv_crash ORDER BY g") === good)
  }

  test("disk recovery: registry and view rebuild from the refresh journal") {
    catalogOn(); dropMv("mv_recover"); freshSrc("mv_recover_src",
      "(1, 'a', 10), (2, 'b', 20)")
    spark.sql("CALL graft.create_materialized_view('mv_recover', " +
      "'SELECT g, count(*) AS n, sum(v) AS sv FROM graft.mv_recover_src GROUP BY g')")
    spark.sql("INSERT INTO graft.mv_recover_src VALUES (3, 'b', 30)")
    // the restart drill: drop the registry entry + catalog view + the
    // store table's in-memory state; only disk remains
    spark.sql("CALL graft.unload_table('mv_recover__store')")
    MatViews.forget("mv_recover")
    assert(!MemTables.isLoaded("mv_recover__store"))
    val r = spark.sql("CALL graft.refresh_materialized_view('mv_recover')").head()
    assert(r.getString(1) === "incremental")
    assert(rowsOf("SELECT g, n, sv FROM graft.mv_recover ORDER BY g") ===
      Seq(Seq("a", 1L, 10L), Seq("b", 2L, 50L)))
  }

  test("create validation rejects the non-maintainable shapes loudly") {
    catalogOn(); dropMv("mv_bad"); freshSrc("mv_bad_src", "(1, 'a', 10)")
    def rejects(sql: String, needle: String): Unit = {
      val e = intercept[Exception] {
        spark.sql(s"CALL graft.create_materialized_view('mv_bad', '$sql')")
      }
      assert(e.getMessage.toLowerCase.contains(needle.toLowerCase),
        s"message for [$sql] was: ${e.getMessage}")
      assert(MatViews.registry.get("mv_bad").isEmpty)
      assert(MemTables.get("mv_bad__store").isEmpty, "no store debris on failure")
    }
    rejects("SELECT g, median(v) AS m FROM graft.mv_bad_src GROUP BY g",
      "not incrementally maintainable")
    // count(DISTINCT x) IS supported now (NDV-sketch component) — other
    // distinct aggregates stay rejected
    rejects("SELECT g, sum(DISTINCT v) AS d FROM graft.mv_bad_src GROUP BY g",
      "DISTINCT")
    rejects("SELECT count(*) AS n FROM graft.mv_bad_src", "GROUP BY")
    rejects("SELECT g, sum(v) + 1 AS s FROM graft.mv_bad_src GROUP BY g",
      "expressions over aggregates")
    rejects("SELECT g, sum(v) FROM graft.mv_bad_src GROUP BY g", "alias")
    // joins ARE supported now — but only INNER, alias-free, non-self
    rejects("SELECT g, count(*) AS n FROM graft.mv_bad_src " +
      "JOIN graft.mv_bad_src ON TRUE GROUP BY g", "appears more than once")
    rejects("SELECT g, count(*) AS n FROM graft.mv_bad_src a JOIN graft.mv_bad_src b " +
      "ON a.k = b.k GROUP BY g", "left-deep chain of graft tables")
    // INNER/LEFT/RIGHT/FULL OUTER joins are supported; semi/anti shapes
    // stay rejected
    rejects("SELECT g, count(*) AS n FROM graft.mv_bad_src " +
      "LEFT SEMI JOIN graft.mv_drop_src ON mv_bad_src.k = mv_drop_src.k GROUP BY g",
      "not supported")
    rejects("SELECT g, count(*) AS n FROM graft.mv_bad_src GROUP BY g ORDER BY g",
      "one aggregate block")
    rejects("SELECT g, count(*) AS n, sum(v) AS n FROM graft.mv_bad_src GROUP BY g",
      "duplicate")
    rejects("SELECT k, count(*) AS n FROM graft.mv_bad_src GROUP BY g",
      "must appear in GROUP BY")
    rejects("SELECT g, count(*) AS n FROM graft.no_such_table_mv GROUP BY g",
      "does not exist")
    rejects("SELECT g, count(*) AS n FROM graft.mv_bad_src GROUP BY g, k",
      "must also appear in the SELECT list")
    rejects("SELECT g, count(*) AS n FROM graft.mv_bad_src WHERE rand() < 0.5 GROUP BY g",
      "non-deterministic")
    rejects("SELECT g, count(*) AS n FROM graft.mv_bad_src " +
      "WHERE k > unix_timestamp() GROUP BY g", "time-varying")
    // name collisions: existing table, view, and the store-suffix slot
    val e1 = intercept[Exception] {
      spark.sql("CALL graft.create_materialized_view('mv_bad_src', " +
        "'SELECT g, count(*) AS n FROM graft.mv_bad_src GROUP BY g')")
    }
    assert(e1.getMessage.contains("must not shadow"))
  }

  test("drop never deletes an unrelated plain view sharing the name") {
    catalogOn(); dropMv("mv_plain"); MemViews.views.remove("mv_plain")
    freshSrc("mv_plain_src", "(1, 'a', 10)")
    spark.sql("CALL graft.create_view('mv_plain', " +
      "'SELECT g FROM graft.mv_plain_src')")
    intercept[Exception] {
      spark.sql("CALL graft.drop_materialized_view('mv_plain')").collect()
    }
    assert(MemViews.views.contains("mv_plain"), "plain view must survive")
    MemViews.views.remove("mv_plain")
  }

  test("refresh fails loudly when the source was dropped and re-created") {
    catalogOn(); dropMv("mv_recreate"); freshSrc("mv_recreate_src",
      "(1, 'a', 10)", "(2, 'b', 20)", "(3, 'c', 30)") // v3
    spark.sql("CALL graft.create_materialized_view('mv_recreate', " +
      "'SELECT g, count(*) AS n FROM graft.mv_recreate_src GROUP BY g')")
    freshSrc("mv_recreate_src", "(9, 'z', 90)") // re-created: clock back at v1
    val e = intercept[Exception] {
      spark.sql("CALL graft.refresh_materialized_view('mv_recreate')").collect()
    }
    assert(e.getMessage.contains("re-created"))
    // identity catches the trap the clock can't: re-create the source and
    // advance its NEW clock past the watermark — still a different table
    catalogOn(); dropMv("mv_recreate2"); freshSrc("mv_recreate2_src", "(1, 'a', 10)")
    spark.sql("CALL graft.create_materialized_view('mv_recreate2', " +
      "'SELECT g, count(*) AS n FROM graft.mv_recreate2_src GROUP BY g')") // wm=1
    freshSrc("mv_recreate2_src", "(2, 'b', 20)", "(3, 'c', 30)", "(4, 'd', 40)") // new clock v3 > wm
    val e2 = intercept[Exception] {
      spark.sql("CALL graft.refresh_materialized_view('mv_recreate2')").collect()
    }
    assert(e2.getMessage.contains("re-created"))
  }

  test("drop never deletes an unrelated table that merely matches the store suffix") {
    catalogOn(); dropMv("mv_suffix")
    spark.sql("DROP TABLE IF EXISTS graft.mv_suffix__store")
    spark.sql("CREATE TABLE graft.mv_suffix__store (k BIGINT) " +
      "TBLPROPERTIES('graft.storage'='parquet')")
    spark.sql("INSERT INTO graft.mv_suffix__store VALUES (1), (2)")
    intercept[Exception] {
      spark.sql("CALL graft.drop_materialized_view('mv_suffix')").collect()
    }
    assert(spark.sql("SELECT count(*) FROM graft.mv_suffix__store").head().getLong(0) === 2L,
      "a plain table named like a store must survive a mistyped MV drop")
    spark.sql("DROP TABLE graft.mv_suffix__store")
  }

  test("a restarted process serves MV READS from the journal, not only refreshes") {
    catalogOn(); dropMv("mv_read_rec"); freshSrc("mv_read_rec_src",
      "(1, 'a', 10)", "(2, 'b', 20)")
    spark.sql("CALL graft.create_materialized_view('mv_read_rec', " +
      "'SELECT g, sum(v) AS sv FROM graft.mv_read_rec_src GROUP BY g')")
    spark.sql("CALL graft.unload_table('mv_read_rec__store')")
    MatViews.forget("mv_read_rec")
    assert(!MemTables.isLoaded("mv_read_rec__store"))
    // first touch is a READ — no refresh in between
    assert(rowsOf("SELECT g, sv FROM graft.mv_read_rec ORDER BY g") ===
      Seq(Seq("a", 10L), Seq("b", 20L)))
  }

  test("min/max fold incrementally on insert-only windows, full-recompute on deletes") {
    catalogOn(); dropMv("mv_ext"); freshSrc("mv_ext_src",
      "(1, 'a', 10), (2, 'a', 30), (3, 'b', NULL)")
    spark.sql("CALL graft.create_materialized_view('mv_ext', " +
      "'SELECT g, min(v) AS lo, max(v) AS hi, sum(v) AS sv " +
      "FROM graft.mv_ext_src GROUP BY g')")
    // all-NULL group: extremes read NULL
    val b0 = spark.sql("SELECT lo, hi FROM graft.mv_ext WHERE g = 'b'").head()
    assert(b0.isNullAt(0) && b0.isNullAt(1))
    // insert-only window (two appends) stays incremental, NULL-side folds
    spark.sql("INSERT INTO graft.mv_ext_src VALUES (4, 'a', 5), (5, 'b', 50)")
    spark.sql("INSERT INTO graft.mv_ext_src VALUES (6, 'a', 40)")
    val r1 = spark.sql("CALL graft.refresh_materialized_view('mv_ext')").head()
    assert(r1.getString(1) === "incremental")
    assert(rowsOf("SELECT g, lo, hi, sv FROM graft.mv_ext ORDER BY g") ===
      Seq(Seq("a", 5L, 40L, 85L), Seq("b", 50L, 50L, 50L)))
    // a delete in the window: extremes can't fold — loud full recompute
    spark.sql("DELETE FROM graft.mv_ext_src WHERE k = 6") // removes max of 'a'
    spark.sql("INSERT INTO graft.mv_ext_src VALUES (7, 'a', 7)")
    val r2 = spark.sql("CALL graft.refresh_materialized_view('mv_ext')").head()
    assert(r2.getString(1) === "full")
    assert(rowsOf("SELECT g, lo, hi, sv FROM graft.mv_ext ORDER BY g") ===
      rowsOf("SELECT g, min(v) AS lo, max(v) AS hi, sum(v) AS sv " +
        "FROM graft.mv_ext_src GROUP BY g ORDER BY g"))
    // back to insert-only: incremental resumes
    spark.sql("INSERT INTO graft.mv_ext_src VALUES (8, 'a', 100)")
    val r3 = spark.sql("CALL graft.refresh_materialized_view('mv_ext')").head()
    assert(r3.getString(1) === "incremental")
    assert(rowsOf("SELECT hi FROM graft.mv_ext WHERE g = 'a'") === Seq(Seq(100L)))
  }

  test("struct-field access in the definition is NOT mistaken for a table qualifier") {
    catalogOn(); dropMv("mv_struct")
    spark.sql("DROP TABLE IF EXISTS graft.mv_struct_src")
    spark.sql("CREATE TABLE graft.mv_struct_src " +
      "(k BIGINT, s STRUCT<country: STRING, city: STRING>, v BIGINT)")
    spark.sql("INSERT INTO graft.mv_struct_src VALUES " +
      "(1, named_struct('country', 'DE', 'city', 'B'), 10), " +
      "(2, named_struct('country', 'DE', 'city', 'M'), 20), " +
      "(3, named_struct('country', 'FR', 'city', 'P'), 30)")
    spark.sql("CALL graft.create_materialized_view('mv_struct', " +
      "'SELECT s.country AS c, sum(v) AS sv FROM graft.mv_struct_src GROUP BY s.country')")
    spark.sql("INSERT INTO graft.mv_struct_src VALUES " +
      "(4, named_struct('country', 'FR', 'city', 'L'), 40)")
    val r = spark.sql("CALL graft.refresh_materialized_view('mv_struct')").head()
    assert(r.getString(1) === "incremental")
    assert(rowsOf("SELECT c, sv FROM graft.mv_struct ORDER BY c") ===
      Seq(Seq("DE", 30L), Seq("FR", 70L)))
  }

  test("drop on a journal-less orphan store points at the explicit reclaim path") {
    catalogOn(); dropMv("mv_orphan")
    spark.sql("DROP TABLE IF EXISTS graft.mv_orphan__store")
    // simulate a crash between store CREATE and the first journal write
    spark.sql("CREATE TABLE graft.mv_orphan__store (k BIGINT) " +
      "TBLPROPERTIES('graft.storage'='parquet')")
    val e = intercept[Exception] {
      spark.sql("CALL graft.drop_materialized_view('mv_orphan')").collect()
    }
    assert(e.getMessage.contains("DROP TABLE graft.mv_orphan__store"))
    spark.sql("DROP TABLE graft.mv_orphan__store")
  }

  test("a cached recovery miss never masks a later create of the same name") {
    catalogOn(); dropMv("mv_misscache") // incl. any store left on disk by a prior run
    // prime the negative probe cache with a miss for this name
    intercept[Exception] { spark.sql("SELECT * FROM graft.mv_misscache").collect() }
    freshSrc("mv_misscache_src", "(1, 'a', 10)")
    spark.sql("CALL graft.create_materialized_view('mv_misscache', " +
      "'SELECT g, count(*) AS n FROM graft.mv_misscache_src GROUP BY g')")
    assert(rowsOf("SELECT g, n FROM graft.mv_misscache") === Seq(Seq("a", 1L)))
  }

  test("a struct column named like its own table is rejected as ambiguous") {
    catalogOn(); dropMv("mv_amb")
    spark.sql("DROP TABLE IF EXISTS graft.mv_amb_src")
    spark.sql("CREATE TABLE graft.mv_amb_src " +
      "(mv_amb_src STRUCT<f: BIGINT>, g STRING)")
    // `mv_amb_src.f` is a table qualifier at create but struct access at
    // refresh — silently different expressions; must fail loudly
    val e = intercept[Exception] {
      spark.sql("CALL graft.create_materialized_view('mv_amb', " +
        "'SELECT g, sum(mv_amb_src.f) AS s FROM graft.mv_amb_src GROUP BY g')")
    }
    assert(e.getMessage.contains("ambiguous"))
    spark.sql("DROP TABLE graft.mv_amb_src")
  }

  test("qualified column references are rejected at create, not at refresh") {
    catalogOn(); dropMv("mv_qual"); freshSrc("mv_qual_src", "(1, 'a', 10)")
    val e = intercept[Exception] {
      spark.sql("CALL graft.create_materialized_view('mv_qual', " +
        "'SELECT g, count(*) AS n FROM graft.mv_qual_src " +
        "WHERE mv_qual_src.k > 0 GROUP BY g')")
    }
    assert(e.getMessage.contains("qualified column reference"))
    assert(MemTables.get("mv_qual__store").isEmpty)
  }

  test("five mutation/refresh cycles stay incremental and exact") {
    catalogOn(); dropMv("mv_loop"); freshSrc("mv_loop_src",
      "(1, 'a', 10), (2, 'b', 20)")
    spark.sql("CALL graft.create_materialized_view('mv_loop', " +
      "'SELECT g, count(*) AS n, sum(v) AS sv FROM graft.mv_loop_src GROUP BY g')")
    var expectedFrom = 1L
    for (i <- 1 to 5) {
      spark.sql(s"INSERT INTO graft.mv_loop_src VALUES (${10 + i}, 'a', ${i * 100})")
      if (i % 2 == 0) spark.sql(s"UPDATE graft.mv_loop_src SET v = v + 1 WHERE k = ${10 + i}")
      val r = spark.sql("CALL graft.refresh_materialized_view('mv_loop')").head()
      assert(r.getString(1) === "incremental", s"cycle $i")
      assert(r.getLong(2) === expectedFrom, s"cycle $i watermark chain")
      expectedFrom = r.getLong(3)
      assert(rowsOf("SELECT g, n, sv FROM graft.mv_loop ORDER BY g") ===
        rowsOf("SELECT g, count(*) AS n, sum(v) AS sv FROM graft.mv_loop_src " +
          "GROUP BY g ORDER BY g"), s"cycle $i contents")
    }
  }

  test("a commit landing after the refresh captured its window is picked up next time") {
    catalogOn(); dropMv("mv_window"); freshSrc("mv_window_src", "(1, 'a', 10)")
    spark.sql("CALL graft.create_materialized_view('mv_window', " +
      "'SELECT g, sum(v) AS sv FROM graft.mv_window_src GROUP BY g')")
    spark.sql("INSERT INTO graft.mv_window_src VALUES (2, 'a', 20)") // v2
    val r1 = spark.sql("CALL graft.refresh_materialized_view('mv_window')").head()
    assert((r1.getLong(2), r1.getLong(3)) === ((1L, 2L)))
    // this commit arrives "during" the previous refresh from the MV's
    // point of view — the pinned window must not have swallowed it
    spark.sql("INSERT INTO graft.mv_window_src VALUES (3, 'a', 40)") // v3
    val r2 = spark.sql("CALL graft.refresh_materialized_view('mv_window')").head()
    assert((r2.getString(1), r2.getLong(2), r2.getLong(3)) === (("incremental", 2L, 3L)))
    assert(rowsOf("SELECT sv FROM graft.mv_window") === Seq(Seq(70L)))
  }

  test("materialized_views() lists freshness, watermark, and pending state") {
    catalogOn(); dropMv("mv_list"); freshSrc("mv_list_src",
      "(1, 'a', 10)", "(2, 'b', 20)") // v2
    spark.sql("CALL graft.create_materialized_view('mv_list', " +
      "'SELECT g, count(*) AS n FROM graft.mv_list_src GROUP BY g')")
    def row() = spark.sql("CALL graft.materialized_views()")
      .filter(org.apache.spark.sql.functions.col("view") === "mv_list").head()
    val fresh = row()
    assert(fresh.getString(1) === "mv_list_src")
    assert((fresh.getLong(2), fresh.getLong(3)) === ((2L, 2L)))
    assert(fresh.getBoolean(4) && !fresh.getBoolean(5))
    assert(fresh.getLong(6) === 2L) // two groups
    spark.sql("INSERT INTO graft.mv_list_src VALUES (3, 'c', 30)") // stale now
    val stale = row()
    assert((stale.getLong(2), stale.getLong(3)) === ((2L, 3L)))
    assert(!stale.getBoolean(4))
    spark.sql("CALL graft.refresh_materialized_view('mv_list')")
    assert(row().getBoolean(4) && row().getLong(6) === 3L)
  }

  test("drop removes the view, the registry entry, and the store") {
    catalogOn(); dropMv("mv_drop"); freshSrc("mv_drop_src", "(1, 'a', 10)")
    spark.sql("CALL graft.create_materialized_view('mv_drop', " +
      "'SELECT g, count(*) AS n FROM graft.mv_drop_src GROUP BY g')")
    assert(spark.sql("SELECT * FROM graft.mv_drop").count() === 1L)
    val r = spark.sql("CALL graft.drop_materialized_view('mv_drop')").head()
    assert(r.getBoolean(1))
    assert(MatViews.registry.get("mv_drop").isEmpty)
    assert(MemViews.views.get("mv_drop").isEmpty)
    assert(MemTables.get("mv_drop__store").isEmpty)
    intercept[Exception] {
      spark.sql("CALL graft.drop_materialized_view('mv_drop')").collect()
    }
  }

  test("the backing store rejects every direct write, drop, and rename") {
    catalogOn(); dropMv("mv_guard"); freshSrc("mv_guard_src", "(1, 'a', 10)")
    spark.sql("CALL graft.create_materialized_view('mv_guard', " +
      "'SELECT g, count(*) AS n, sum(v) AS sv FROM graft.mv_guard_src GROUP BY g')")
    val store = "graft.mv_guard__store"
    // direct DML would corrupt the aggregate SILENTLY (the watermark still
    // reads fresh, so the rewrite would keep serving it) — all rejected
    def rejected(sql: String): Unit = {
      val e = intercept[Exception](spark.sql(sql).collect())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("backing store")), s"$sql: $e")
    }
    rejected(s"INSERT INTO $store VALUES ('x', 1, 1, 1)")
    rejected(s"DELETE FROM $store WHERE __mv_n = 1")
    rejected(s"UPDATE $store SET __mv_n = 99 WHERE TRUE")
    rejected(s"TRUNCATE TABLE $store")
    rejected(s"DROP TABLE $store")
    rejected(s"ALTER TABLE $store RENAME TO graft.mv_guard_stolen")
    // the store is intact and the MV machinery still owns it: refresh
    // (MERGE through the same guarded entry points) and drop both work
    spark.sql("INSERT INTO graft.mv_guard_src VALUES (2, 'a', 30)")
    spark.sql("CALL graft.refresh_materialized_view('mv_guard')")
    assert(rowsOf("SELECT g, n, sv FROM graft.mv_guard") ===
      Seq(Seq("a", 2L, 40L)))
    val r = spark.sql("CALL graft.drop_materialized_view('mv_guard')").head()
    assert(r.getBoolean(1))
    assert(MemTables.get("mv_guard__store").isEmpty)
  }

  test("double-sum MVs re-anchor with a full recompute every Nth refresh") {
    catalogOn(); dropMv("mv_drift")
    spark.sql("DROP TABLE IF EXISTS graft.mv_drift_src")
    spark.sql("CREATE TABLE graft.mv_drift_src (k BIGINT, g STRING, x DOUBLE)")
    spark.sql("INSERT INTO graft.mv_drift_src VALUES (1, 'a', 1.5)")
    spark.sql("CALL graft.create_materialized_view('mv_drift', " +
      "'SELECT g, sum(x) AS sx FROM graft.mv_drift_src GROUP BY g')")
    // ordinary refreshes stay incremental and count up
    spark.sql("INSERT INTO graft.mv_drift_src VALUES (2, 'a', 2.5)")
    assert(spark.sql("CALL graft.refresh_materialized_view('mv_drift')")
      .head().getString(1) === "incremental")
    assert(MatViews.registry("mv_drift").deltaRefreshes === 1)
    // at the drift bound the refresh forces mode=full and resets the count
    val st = MatViews.registry("mv_drift")
    MatViews.registry.put("mv_drift",
      st.copy(deltaRefreshes = MatViews.FloatDriftFullEvery - 1))
    spark.sql("INSERT INTO graft.mv_drift_src VALUES (3, 'a', 3.25)")
    assert(spark.sql("CALL graft.refresh_materialized_view('mv_drift')")
      .head().getString(1) === "full")
    assert(MatViews.registry("mv_drift").deltaRefreshes === 0)
    assert(rowsOf("SELECT g, sx FROM graft.mv_drift") ===
      Seq(Seq("a", 7.25)))
    // integral sums are exact — the bound never fires for them
    dropMv("mv_drift_int"); freshSrc("mv_drift_int_src", "(1, 'a', 10)")
    spark.sql("CALL graft.create_materialized_view('mv_drift_int', " +
      "'SELECT g, sum(v) AS sv FROM graft.mv_drift_int_src GROUP BY g')")
    val ist = MatViews.registry("mv_drift_int")
    MatViews.registry.put("mv_drift_int",
      ist.copy(deltaRefreshes = MatViews.FloatDriftFullEvery - 1))
    spark.sql("INSERT INTO graft.mv_drift_int_src VALUES (2, 'a', 5)")
    assert(spark.sql("CALL graft.refresh_materialized_view('mv_drift_int')")
      .head().getString(1) === "incremental")
    dropMv("mv_drift"); dropMv("mv_drift_int")
  }

  test("the drift counter survives the journal round trip") {
    catalogOn(); dropMv("mv_drift_jr"); freshSrc("mv_drift_jr_src", "(1, 'a', 1)")
    spark.sql("CALL graft.create_materialized_view('mv_drift_jr', " +
      "'SELECT g, count(*) AS n FROM graft.mv_drift_jr_src GROUP BY g')")
    spark.sql("INSERT INTO graft.mv_drift_jr_src VALUES (2, 'b', 2)")
    spark.sql("CALL graft.refresh_materialized_view('mv_drift_jr')")
    assert(MatViews.registry("mv_drift_jr").deltaRefreshes === 1)
    MatViews.forget("mv_drift_jr") // restart half: registry gone, disk intact
    MatViews.resetRecoveryMemos()
    assert(MatViews.getOrRecover("mv_drift_jr").get.deltaRefreshes === 1)
    dropMv("mv_drift_jr")
  }
}
