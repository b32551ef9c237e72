package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

import graft.SparkSpec

/** STAR-SCHEMA (join) materialized views: `fact ⋈ dims GROUP BY`
  * definitions materialize, maintain by LOUD full recompute whenever any
  * source moves, serve matching join-aggregates through the rewrite rule
  * (staleness on EITHER source stops serving), and survive the journal
  * round trip with every source's identity + watermark.
  */
class JoinMvSpec extends SparkSpec {

  private def catalogOn(): Unit =
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")

  private def dropMv(name: String): Unit = {
    MatViews.forget(name)
    MemTables.drop(name + MatViews.StoreSuffix)
    MemViews.views.remove(name)
    ()
  }

  private def scansOf(pl: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
    pl match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scansOf(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scansOf(q.plan)
      case b: BatchScanExec => Seq(b.table.name())
      case other => other.children.flatMap(scansOf)
    }

  private def servedFromStore(df: DataFrame, store: String): Boolean = {
    val t = scansOf(df.queryExecution.executedPlan)
    t.contains(store) && t.forall(_ == store)
  }

  private def rowsOf(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).sortBy(_.toString)

  private def setup(): Unit = {
    catalogOn(); dropMv("jmv")
    spark.sql("DROP TABLE IF EXISTS graft.jmv_fact")
    spark.sql("DROP TABLE IF EXISTS graft.jmv_dim")
    spark.sql("CREATE TABLE graft.jmv_fact (k BIGINT, ck BIGINT, v BIGINT)")
    spark.sql("CREATE TABLE graft.jmv_dim (dk BIGINT, seg STRING)")
    spark.sql("INSERT INTO graft.jmv_fact VALUES " +
      "(1, 10, 100), (2, 10, 200), (3, 20, 300), (4, 20, NULL), (5, 30, 500)")
    spark.sql("INSERT INTO graft.jmv_dim VALUES " +
      "(10, 'auto'), (20, 'auto'), (30, 'bike'), (40, 'none')")
    spark.sql("CALL graft.create_materialized_view('jmv', " +
      "'SELECT seg, count(*) AS n, sum(v) AS sv, avg(v) AS av " +
      "FROM graft.jmv_fact JOIN graft.jmv_dim ON ck = dk GROUP BY seg')")
  }

  test("a join MV materializes the join-aggregate and reads back correctly") {
    setup()
    assert(rowsOf(spark.sql("SELECT seg, n, sv FROM graft.jmv")) ===
      Seq(Seq("auto", 4L, 600L), Seq("bike", 1L, 500L)))
    val st = MatViews.registry("jmv")
    assert(st.joins.map(_.key) === Seq("jmv_dim"))
    assert(st.joins.head.uuid.nonEmpty)
  }

  test("the rewrite serves a matching join-aggregate from the store") {
    setup()
    val q = "SELECT seg, count(*) AS n, sum(v) AS sv, avg(v) AS av " +
      "FROM graft.jmv_fact JOIN graft.jmv_dim ON ck = dk GROUP BY seg"
    val df = spark.sql(q)
    assert(servedFromStore(df, "jmv__store"),
      s"expected store scan, got ${scansOf(df.queryExecution.executedPlan)}")
    spark.conf.set("spark.graft.mv.rewrite", "false")
    val direct = try spark.sql(q)
    finally spark.conf.unset("spark.graft.mv.rewrite")
    assert(rowsOf(df) === rowsOf(direct))
    assert(df.schema === direct.schema)
    // the commuted ON and swapped table order still match (canonical form)
    val df2 = spark.sql("SELECT seg, sum(v) AS sv FROM graft.jmv_dim " +
      "JOIN graft.jmv_fact ON dk = ck GROUP BY seg")
    assert(servedFromStore(df2, "jmv__store"))
    df2.collect()
  }

  test("staleness on EITHER source stops serving; refresh restores it") {
    setup()
    val q = "SELECT seg, sum(v) AS sv FROM graft.jmv_fact " +
      "JOIN graft.jmv_dim ON ck = dk GROUP BY seg"
    // dim-only commit: fact watermark still matches, dim does not
    spark.sql("INSERT INTO graft.jmv_dim VALUES (50, 'bike')")
    assert(!servedFromStore(spark.sql(q), "jmv__store"),
      "a stale dim must stop the rewrite")
    val r = spark.sql("CALL graft.refresh_materialized_view('jmv')").head()
    assert(r.getString(1) === "incremental",
      "an in-retention window folds incrementally")
    assert(servedFromStore(spark.sql(q), "jmv__store"))
    // fact-only commit: a row keyed to the NEW dim row
    spark.sql("INSERT INTO graft.jmv_fact VALUES (6, 50, 600)")
    assert(!servedFromStore(spark.sql(q), "jmv__store"))
    assert(spark.sql("CALL graft.refresh_materialized_view('jmv')")
      .head().getString(1) === "incremental")
    val df = spark.sql(q)
    assert(servedFromStore(df, "jmv__store"))
    assert(rowsOf(df) === Seq(Seq("auto", 600L), Seq("bike", 1100L)))
    // noop when nothing moved
    assert(spark.sql("CALL graft.refresh_materialized_view('jmv')")
      .head().getString(1) === "noop")
  }

  test("incremental join refresh folds inserts, deletes, AND retroactive dim updates") {
    setup()
    def direct(): Seq[Seq[Any]] = {
      spark.conf.set("spark.graft.mv.rewrite", "false")
      try rowsOf(spark.sql("SELECT seg, count(*) AS n, sum(v) AS sv, avg(v) AS av " +
        "FROM graft.jmv_fact JOIN graft.jmv_dim ON ck = dk GROUP BY seg"))
      finally spark.conf.unset("spark.graft.mv.rewrite")
    }
    def refreshedMatchesDirect(expectMode: String): Unit = {
      val r = spark.sql("CALL graft.refresh_materialized_view('jmv')").head()
      assert(r.getString(1) === expectMode)
      assert(rowsOf(spark.sql("SELECT seg, n, sv, av FROM graft.jmv")) === direct(),
        "the folded store must equal the direct recomputation")
    }
    // fact deletes (rows leave groups through the join)
    spark.sql("DELETE FROM graft.jmv_fact WHERE k IN (1, 5)")
    refreshedMatchesDirect("incremental")
    // fact update (±1 pair through the join)
    spark.sql("UPDATE graft.jmv_fact SET v = v + 1000 WHERE k = 2")
    refreshedMatchesDirect("incremental")
    // RETROACTIVE dim update: re-segments every joined fact row — the
    // classic case a naive one-sided delta gets wrong; the telescoped
    // dim term joins the dim's ±pair against the fact's NEW snapshot
    spark.sql("UPDATE graft.jmv_dim SET seg = 'bike' WHERE dk = 20")
    refreshedMatchesDirect("incremental")
    // dim delete: its fact rows fall out of the join entirely, and a
    // whole group can die (MERGE deletes the row)
    spark.sql("DELETE FROM graft.jmv_dim WHERE seg = 'auto'")
    refreshedMatchesDirect("incremental")
    // mixed same-refresh window on BOTH sides
    spark.sql("INSERT INTO graft.jmv_fact VALUES (7, 30, 700)")
    spark.sql("INSERT INTO graft.jmv_dim VALUES (60, 'bike')")
    spark.sql("INSERT INTO graft.jmv_fact VALUES (8, 60, 800)")
    refreshedMatchesDirect("incremental")
  }

  test("extremes fold on insert-only windows, full-recompute on deletes; retention forces full") {
    catalogOn(); dropMv("jmv4")
    spark.sql("DROP TABLE IF EXISTS graft.jmv4_f")
    spark.sql("DROP TABLE IF EXISTS graft.jmv4_d")
    spark.sql("CREATE TABLE graft.jmv4_f (ck BIGINT, v BIGINT)")
    spark.sql("CREATE TABLE graft.jmv4_d (dk BIGINT, seg STRING)")
    spark.sql("INSERT INTO graft.jmv4_f VALUES (1, 10), (2, 20)")
    spark.sql("INSERT INTO graft.jmv4_d VALUES (1, 'a'), (2, 'b')")
    spark.sql("CALL graft.create_materialized_view('jmv4', " +
      "'SELECT seg, min(v) AS lo, sum(v) AS sv " +
      "FROM graft.jmv4_f JOIN graft.jmv4_d ON ck = dk GROUP BY seg')")
    spark.sql("INSERT INTO graft.jmv4_f VALUES (1, 5)") // insert-only window
    assert(spark.sql("CALL graft.refresh_materialized_view('jmv4')")
      .head().getString(1) === "incremental")
    assert(rowsOf(spark.sql("SELECT seg, lo FROM graft.jmv4")) ===
      Seq(Seq("a", 5L), Seq("b", 20L)))
    spark.sql("DELETE FROM graft.jmv4_f WHERE v = 5") // removes the extreme
    assert(spark.sql("CALL graft.refresh_materialized_view('jmv4')")
      .head().getString(1) === "full",
      "a row-removing window with extremes must recompute in full")
    assert(rowsOf(spark.sql("SELECT seg, lo FROM graft.jmv4")) ===
      Seq(Seq("a", 10L), Seq("b", 20L)))
    // retention expiry on a JOINED source also forces full
    spark.sql("INSERT INTO graft.jmv4_d VALUES (3, 'c')")
    spark.sql("INSERT INTO graft.jmv4_f VALUES (3, 30)")
    val dimV = MemTables.get("jmv4_d").get.version
    spark.sql(s"CALL graft.expire_snapshots('jmv4_d', $dimV)")
    assert(spark.sql("CALL graft.refresh_materialized_view('jmv4')")
      .head().getString(1) === "full",
      "a watermark expired out of a joined source's retention must recompute")
    assert(rowsOf(spark.sql("SELECT seg, sv FROM graft.jmv4")) ===
      Seq(Seq("a", 10L), Seq("b", 20L), Seq("c", 30L)))
    dropMv("jmv4")
  }

  test("rollup and dropped-grain predicates work over a join MV store") {
    catalogOn(); dropMv("jmv2")
    spark.sql("DROP TABLE IF EXISTS graft.jmv2_fact")
    spark.sql("DROP TABLE IF EXISTS graft.jmv2_dim")
    spark.sql("CREATE TABLE graft.jmv2_fact (ck BIGINT, m BIGINT, v BIGINT)")
    spark.sql("CREATE TABLE graft.jmv2_dim (dk BIGINT, seg STRING)")
    spark.sql("INSERT INTO graft.jmv2_fact VALUES " +
      "(10, 1, 100), (10, 2, 200), (20, 1, 300), (30, 2, 400)")
    spark.sql("INSERT INTO graft.jmv2_dim VALUES (10, 'a'), (20, 'a'), (30, 'b')")
    spark.sql("CALL graft.create_materialized_view('jmv2', " +
      "'SELECT seg, m, count(*) AS n, sum(v) AS sv " +
      "FROM graft.jmv2_fact JOIN graft.jmv2_dim ON ck = dk GROUP BY seg, m')")
    // coarser grain + predicate on the dropped grain column
    val df = spark.sql("SELECT seg, sum(v) AS sv FROM graft.jmv2_fact " +
      "JOIN graft.jmv2_dim ON ck = dk WHERE m = 1 GROUP BY seg")
    assert(servedFromStore(df, "jmv2__store"),
      s"got ${scansOf(df.queryExecution.executedPlan)}")
    assert(rowsOf(df) === Seq(Seq("a", 400L)))
    dropMv("jmv2")
  }

  test("join watermarks and identities survive the journal round trip") {
    setup()
    val before = MatViews.registry("jmv")
    MatViews.forget("jmv")
    MatViews.resetRecoveryMemos()
    val back = MatViews.getOrRecover("jmv").get
    assert(back.joins === before.joins)
    // and the rewrite serves again after the restart
    val df = spark.sql("SELECT seg, count(*) AS n FROM graft.jmv_fact " +
      "JOIN graft.jmv_dim ON ck = dk GROUP BY seg")
    assert(servedFromStore(df, "jmv__store"))
    df.collect()
  }

  test("a dropped or re-created joined source fails refresh loudly") {
    setup()
    spark.sql("DROP TABLE graft.jmv_dim")
    val e = intercept[Exception] {
      spark.sql("CALL graft.refresh_materialized_view('jmv')").collect()
    }
    assert(e.getMessage.contains("no longer exists"))
    // re-created under the same name: identity check must refuse
    spark.sql("CREATE TABLE graft.jmv_dim (dk BIGINT, seg STRING)")
    spark.sql("INSERT INTO graft.jmv_dim VALUES (10, 'auto')")
    val e2 = intercept[Exception] {
      spark.sql("CALL graft.refresh_materialized_view('jmv')").collect()
    }
    assert(e2.getMessage.contains("re-created"))
    // and the rewrite must not serve from the old store either
    val df = spark.sql("SELECT seg, count(*) AS n FROM graft.jmv_fact " +
      "JOIN graft.jmv_dim ON ck = dk GROUP BY seg")
    assert(!servedFromStore(df, "jmv__store"))
    dropMv("jmv")
  }

  test("write-intent repair: a committed overwrite with a lost watermark redoes cleanly") {
    setup()
    val before = MatViews.registry("jmv")
    val storeV0 = MemTables.get("jmv__store").get.version
    spark.sql("INSERT INTO graft.jmv_fact VALUES (6, 30, 600)")
    spark.sql("CALL graft.refresh_materialized_view('jmv')")
    val good = rowsOf(spark.sql("SELECT seg, n, sv FROM graft.jmv"))
    // simulate the crash window: overwrite committed, watermark lost
    val stale = before.copy(pending =
      Some(MatViews.Pending(before.watermark, before.watermark + 1, storeV0)))
    MatViews.registry.put("jmv", stale)
    MatViews.persist(stale)
    val r = spark.sql("CALL graft.refresh_materialized_view('jmv')").head()
    assert(r.getString(1) === "incremental",
      "the repair re-applies the SAME window through the same path")
    assert(rowsOf(spark.sql("SELECT seg, n, sv FROM graft.jmv")) === good,
      "rollback + re-apply must land the clean refresh's contents, never double-apply")
  }

  test("a cross join (ON TRUE) MV serves the cross-join query") {
    catalogOn(); dropMv("jmvx")
    spark.sql("DROP TABLE IF EXISTS graft.jmvx_a")
    spark.sql("DROP TABLE IF EXISTS graft.jmvx_b")
    spark.sql("CREATE TABLE graft.jmvx_a (g STRING, v BIGINT)")
    spark.sql("CREATE TABLE graft.jmvx_b (w BIGINT)")
    spark.sql("INSERT INTO graft.jmvx_a VALUES ('a', 1), ('b', 2)")
    spark.sql("INSERT INTO graft.jmvx_b VALUES (10), (20), (30)")
    spark.sql("CALL graft.create_materialized_view('jmvx', " +
      "'SELECT g, count(*) AS n, sum(v * w) AS sv " +
      "FROM graft.jmvx_a JOIN graft.jmvx_b ON TRUE GROUP BY g')")
    // the optimizer erases the trivially-true condition from the query
    // side; the definition keeps it — the pools must still match
    val df = spark.sql("SELECT g, count(*) AS n, sum(v * w) AS sv " +
      "FROM graft.jmvx_a CROSS JOIN graft.jmvx_b GROUP BY g")
    assert(servedFromStore(df, "jmvx__store"),
      s"got ${scansOf(df.queryExecution.executedPlan)}")
    assert(rowsOf(df) === Seq(Seq("a", 3L, 60L), Seq("b", 3L, 120L)))
    dropMv("jmvx")
  }

  test("a LEFT JOIN MV materializes null-extension rows and folds every flip incrementally") {
    catalogOn(); dropMv("lmv")
    spark.sql("DROP TABLE IF EXISTS graft.lmv_fact")
    spark.sql("DROP TABLE IF EXISTS graft.lmv_dim")
    spark.sql("CREATE TABLE graft.lmv_fact (k BIGINT, ck BIGINT, v BIGINT)")
    spark.sql("CREATE TABLE graft.lmv_dim (dk BIGINT, seg STRING)")
    spark.sql("INSERT INTO graft.lmv_fact VALUES " +
      "(1, 10, 100), (2, 10, 200), (3, 20, 300), (4, 99, 400), (5, NULL, 500)")
    spark.sql("INSERT INTO graft.lmv_dim VALUES (10, 'auto'), (20, 'auto'), (30, 'bike')")
    spark.sql("CALL graft.create_materialized_view('lmv', " +
      "'SELECT seg, count(*) AS n, sum(v) AS sv, avg(v) AS av " +
      "FROM graft.lmv_fact LEFT JOIN graft.lmv_dim ON ck = dk GROUP BY seg')")
    // orphans (ck=99 unmatched, ck=NULL never matches) land in the NULL group
    assert(rowsOf(spark.sql("SELECT seg, n, sv FROM graft.lmv")) ===
      Seq(Seq("auto", 3L, 600L), Seq(null, 2L, 900L)))
    def direct(): Seq[Seq[Any]] = {
      spark.conf.set("spark.graft.mv.rewrite", "false")
      try rowsOf(spark.sql("SELECT seg, count(*) AS n, sum(v) AS sv, avg(v) AS av " +
        "FROM graft.lmv_fact LEFT JOIN graft.lmv_dim ON ck = dk GROUP BY seg"))
      finally spark.conf.unset("spark.graft.mv.rewrite")
    }
    def refreshedMatchesDirect(): Unit = {
      val r = spark.sql("CALL graft.refresh_materialized_view('lmv')").head()
      assert(r.getString(1) === "incremental")
      assert(rowsOf(spark.sql("SELECT seg, n, sv, av FROM graft.lmv")) === direct(),
        "the folded store must equal the direct recomputation")
    }
    // fact window: one matched insert, one new orphan
    spark.sql("INSERT INTO graft.lmv_fact VALUES (6, 30, 600), (7, 77, 700)")
    refreshedMatchesDirect()
    // dim insert that ADOPTS an orphan: k=4 flips NULL → 'bike' (the
    // −1 flip term retracts its null-extension row; the inner Δdim term
    // adds the matched row)
    spark.sql("INSERT INTO graft.lmv_dim VALUES (99, 'bike')")
    refreshedMatchesDirect()
    // dim delete that ORPHANS matched facts: k=1,2 flip back to
    // null-extension (the verdict case a one-sided delta gets wrong)
    spark.sql("DELETE FROM graft.lmv_dim WHERE dk = 10")
    refreshedMatchesDirect()
    // retroactive dim update re-segments matched rows (±pair through the
    // inner term; existence unchanged, so the flip terms emit nothing)
    spark.sql("UPDATE graft.lmv_dim SET seg = 'auto' WHERE dk = 30")
    refreshedMatchesDirect()
    // fact deletes spanning a matched row and a permanent orphan
    spark.sql("DELETE FROM graft.lmv_fact WHERE k IN (5, 6)")
    refreshedMatchesDirect()
    // mixed same-window changes on BOTH sides, flips included
    spark.sql("INSERT INTO graft.lmv_fact VALUES (8, 20, 800)")
    spark.sql("DELETE FROM graft.lmv_dim WHERE dk = 20")
    spark.sql("INSERT INTO graft.lmv_dim VALUES (77, 'auto')")
    refreshedMatchesDirect()
    // group death: empty the NULL group entirely
    spark.sql("UPDATE graft.lmv_fact SET ck = 77 WHERE ck IS NULL OR ck = 99")
    spark.sql("INSERT INTO graft.lmv_dim VALUES (99, 'bike')")
    refreshedMatchesDirect()
    dropMv("lmv")
  }

  test("the rewrite serves LEFT-join aggregates from a LEFT MV store") {
    catalogOn(); dropMv("lmv4")
    spark.sql("DROP TABLE IF EXISTS graft.lmv4_f")
    spark.sql("DROP TABLE IF EXISTS graft.lmv4_d")
    spark.sql("CREATE TABLE graft.lmv4_f (k BIGINT, ck BIGINT, v BIGINT)")
    spark.sql("CREATE TABLE graft.lmv4_d (dk BIGINT, seg STRING)")
    spark.sql("INSERT INTO graft.lmv4_f VALUES " +
      "(1, 10, 100), (2, 10, 200), (3, 99, 300), (4, NULL, 400)")
    spark.sql("INSERT INTO graft.lmv4_d VALUES (10, 'auto'), (20, 'bike')")
    spark.sql("CALL graft.create_materialized_view('lmv4', " +
      "'SELECT seg, count(*) AS n, sum(v) AS sv " +
      "FROM graft.lmv4_f LEFT JOIN graft.lmv4_d ON ck = dk GROUP BY seg')")
    val q = "SELECT seg, count(*) AS n, sum(v) AS sv " +
      "FROM graft.lmv4_f LEFT JOIN graft.lmv4_d ON ck = dk GROUP BY seg"
    val df = spark.sql(q)
    assert(servedFromStore(df, "lmv4__store"),
      s"expected store scan, got ${scansOf(df.queryExecution.executedPlan)}")
    spark.conf.set("spark.graft.mv.rewrite", "false")
    val direct = try spark.sql(q)
    finally spark.conf.unset("spark.graft.mv.rewrite")
    assert(rowsOf(df) === rowsOf(direct))
    assert(df.schema === direct.schema)
    // rollup to the empty grain still serves (null-extension rows and
    // all — the store IS the full-grain truth)
    val global = spark.sql("SELECT count(*) AS n, sum(v) AS sv " +
      "FROM graft.lmv4_f LEFT JOIN graft.lmv4_d ON ck = dk")
    assert(servedFromStore(global, "lmv4__store"))
    assert(rowsOf(global) === Seq(Seq(4L, 1000L)))
    // an INNER query over the same tables must NOT serve from the LEFT
    // store (it dropped the null-extension rows the store keeps)
    val inner = spark.sql("SELECT seg, count(*) AS n FROM graft.lmv4_f " +
      "JOIN graft.lmv4_d ON ck = dk GROUP BY seg")
    assert(!servedFromStore(inner, "lmv4__store"))
    assert(rowsOf(inner) === Seq(Seq("auto", 2L)))
    // a LEFT query with a DIFFERENT ON condition must not serve either
    val otherOn = spark.sql("SELECT seg, count(*) AS n FROM graft.lmv4_f " +
      "LEFT JOIN graft.lmv4_d ON ck = dk + 1 GROUP BY seg")
    assert(!servedFromStore(otherOn, "lmv4__store"))
    // staleness on the dim side stops serving; refresh restores it
    spark.sql("INSERT INTO graft.lmv4_d VALUES (99, 'bike')")
    assert(!servedFromStore(spark.sql(q), "lmv4__store"))
    assert(spark.sql("CALL graft.refresh_materialized_view('lmv4')")
      .head().getString(1) === "incremental")
    val df2 = spark.sql(q)
    assert(servedFromStore(df2, "lmv4__store"))
    assert(rowsOf(df2) ===
      Seq(Seq("auto", 2L, 300L), Seq("bike", 1L, 300L), Seq(null, 1L, 400L)))
    dropMv("lmv4")
  }

  test("LEFT MV extremes block incremental whenever the dim side moves") {
    catalogOn(); dropMv("lmv2")
    spark.sql("DROP TABLE IF EXISTS graft.lmv2_f")
    spark.sql("DROP TABLE IF EXISTS graft.lmv2_d")
    spark.sql("CREATE TABLE graft.lmv2_f (ck BIGINT, v BIGINT)")
    spark.sql("CREATE TABLE graft.lmv2_d (dk BIGINT, seg STRING)")
    spark.sql("INSERT INTO graft.lmv2_f VALUES (1, 10), (2, 20), (9, 90)")
    spark.sql("INSERT INTO graft.lmv2_d VALUES (1, 'a'), (2, 'b')")
    spark.sql("CALL graft.create_materialized_view('lmv2', " +
      "'SELECT seg, min(v) AS lo, sum(v) AS sv " +
      "FROM graft.lmv2_f LEFT JOIN graft.lmv2_d ON ck = dk GROUP BY seg')")
    // fact-side insert-only window still folds (only ADDS view rows)
    spark.sql("INSERT INTO graft.lmv2_f VALUES (1, 5), (8, 80)")
    assert(spark.sql("CALL graft.refresh_materialized_view('lmv2')")
      .head().getString(1) === "incremental")
    assert(rowsOf(spark.sql("SELECT seg, lo FROM graft.lmv2")) ===
      Seq(Seq("a", 5L), Seq("b", 20L), Seq(null, 80L)))
    // a dim INSERT is insert-only on the dim table but can REMOVE a
    // null-extension row (adopting an orphan) — extremes force full
    spark.sql("INSERT INTO graft.lmv2_d VALUES (9, 'a')")
    assert(spark.sql("CALL graft.refresh_materialized_view('lmv2')")
      .head().getString(1) === "full",
      "a moved LEFT dim side with extremes must recompute in full")
    assert(rowsOf(spark.sql("SELECT seg, lo, sv FROM graft.lmv2")) ===
      Seq(Seq("a", 5L, 105L), Seq("b", 20L, 20L), Seq(null, 80L, 80L)))
    dropMv("lmv2")
  }

  test("LEFT steps inside longer chains fold incrementally; RIGHT/FULL reject") {
    catalogOn(); dropMv("lmv3")
    spark.sql("DROP TABLE IF EXISTS graft.lmv3_f")
    spark.sql("DROP TABLE IF EXISTS graft.lmv3_d1")
    spark.sql("DROP TABLE IF EXISTS graft.lmv3_d2")
    spark.sql("CREATE TABLE graft.lmv3_f (ck BIGINT, pk BIGINT, v BIGINT)")
    spark.sql("CREATE TABLE graft.lmv3_d1 (dk BIGINT, seg STRING)")
    spark.sql("CREATE TABLE graft.lmv3_d2 (qk BIGINT, region STRING)")
    // f ⟕ d1 ⋈ d2: the LEFT step sits MID-chain — its flip terms must
    // suffix-join d2@OLD, and d1's null-extensions survive only through
    // the inner d2 match (pk always matches here)
    spark.sql("INSERT INTO graft.lmv3_f VALUES " +
      "(10, 7, 100), (10, 8, 200), (20, 7, 300), (99, 8, 400)")
    spark.sql("INSERT INTO graft.lmv3_d1 VALUES (10, 'a'), (20, 'b')")
    spark.sql("INSERT INTO graft.lmv3_d2 VALUES (7, 'EU'), (8, 'US')")
    spark.sql("CALL graft.create_materialized_view('lmv3', " +
      "'SELECT seg, region, count(*) AS n, sum(v) AS sv FROM graft.lmv3_f " +
      "LEFT JOIN graft.lmv3_d1 ON ck = dk " +
      "JOIN graft.lmv3_d2 ON pk = qk GROUP BY seg, region')")
    assert(rowsOf(spark.sql("SELECT seg, region, n, sv FROM graft.lmv3")) ===
      Seq(Seq("a", "EU", 1L, 100L), Seq("a", "US", 1L, 200L),
        Seq("b", "EU", 1L, 300L), Seq(null, "US", 1L, 400L)))
    def direct(): Seq[Seq[Any]] = {
      spark.conf.set("spark.graft.mv.rewrite", "false")
      try rowsOf(spark.sql(
        "SELECT seg, region, count(*) AS n, sum(v) AS sv FROM graft.lmv3_f " +
          "LEFT JOIN graft.lmv3_d1 ON ck = dk " +
          "JOIN graft.lmv3_d2 ON pk = qk GROUP BY seg, region"))
      finally spark.conf.unset("spark.graft.mv.rewrite")
    }
    def refreshedMatchesDirect(): Unit = {
      val r = spark.sql("CALL graft.refresh_materialized_view('lmv3')").head()
      assert(r.getString(1) === "incremental")
      assert(rowsOf(spark.sql("SELECT seg, region, n, sv FROM graft.lmv3")) ===
        direct(), "the folded store must equal the direct recomputation")
    }
    // mid-chain dim insert ADOPTS the orphan (flip −1 suffixed by d2@old)
    spark.sql("INSERT INTO graft.lmv3_d1 VALUES (99, 'c')")
    refreshedMatchesDirect()
    // mid-chain dim delete ORPHANS matched rows back to null-extension
    spark.sql("DELETE FROM graft.lmv3_d1 WHERE dk = 10")
    refreshedMatchesDirect()
    // inner-suffix dim change: Δd2 term joins the LEFT prefix @NEW —
    // null-extended d1 rows ride the prefix into the inner delta
    spark.sql("UPDATE graft.lmv3_d2 SET region = 'APAC' WHERE qk = 8")
    refreshedMatchesDirect()
    // mixed window across all three sources, flips included
    spark.sql("INSERT INTO graft.lmv3_f VALUES (20, 8, 500), (77, 7, 600)")
    spark.sql("DELETE FROM graft.lmv3_d1 WHERE dk = 99")
    spark.sql("INSERT INTO graft.lmv3_d2 VALUES (9, 'SA')")
    refreshedMatchesDirect()
    // the rewrite serves the chain-LEFT aggregate too (the one outer
    // step composes with pooled inner conjuncts on both sides)
    val served = spark.sql(
      "SELECT seg, region, count(*) AS n, sum(v) AS sv FROM graft.lmv3_f " +
        "LEFT JOIN graft.lmv3_d1 ON ck = dk " +
        "JOIN graft.lmv3_d2 ON pk = qk GROUP BY seg, region")
    assert(servedFromStore(served, "lmv3__store"),
      s"got ${scansOf(served.queryExecution.executedPlan)}")
    assert(rowsOf(served) === direct())
    dropMv("lmv3")
  }

  test("a RIGHT JOIN MV folds both-side null-extension flips incrementally") {
    catalogOn(); dropMv("rmv")
    spark.sql("DROP TABLE IF EXISTS graft.rmv_f")
    spark.sql("DROP TABLE IF EXISTS graft.rmv_d")
    spark.sql("CREATE TABLE graft.rmv_f (k BIGINT, ck BIGINT, v BIGINT)")
    spark.sql("CREATE TABLE graft.rmv_d (dk BIGINT, seg STRING)")
    spark.sql("INSERT INTO graft.rmv_f VALUES (1, 10, 100), (2, 10, 200), (3, 99, 300)")
    spark.sql("INSERT INTO graft.rmv_d VALUES (10, 'a'), (20, 'b'), (30, 'c')")
    val defSql = "SELECT seg, count(*) AS n, count(v) AS nv, sum(v) AS sv " +
      "FROM graft.rmv_f RIGHT JOIN graft.rmv_d ON ck = dk GROUP BY seg"
    spark.sql(s"CALL graft.create_materialized_view('rmv', '$defSql')")
    def direct(): Seq[Seq[Any]] = {
      spark.conf.set("spark.graft.mv.rewrite", "false")
      try rowsOf(spark.sql(defSql))
      finally spark.conf.unset("spark.graft.mv.rewrite")
    }
    assert(rowsOf(spark.sql("SELECT seg, n, nv, sv FROM graft.rmv")) === direct())
    def refreshedMatchesDirect(expectMode: String = "incremental"): Unit = {
      val r = spark.sql("CALL graft.refresh_materialized_view('rmv')").head()
      assert(r.getString(1) === expectMode, s"mode was ${r.getString(1)}")
      assert(rowsOf(spark.sql("SELECT seg, n, nv, sv FROM graft.rmv")) ===
        direct(), "the folded store must equal the direct recomputation")
    }
    // dim-side delta: a new dim row with no fact match adds its
    // null-extension group via the reversed RIGHT JOIN feed term
    spark.sql("INSERT INTO graft.rmv_d VALUES (40, 'd')")
    refreshedMatchesDirect()
    // fact-side flip: the insert MATCHES orphan dim 20 — its
    // null-extension row must retract (right-flip −1)
    spark.sql("INSERT INTO graft.rmv_f VALUES (4, 20, 400)")
    refreshedMatchesDirect()
    // fact-side flip the other way: deleting every match of dim 10
    // re-orphans it (+1 null-extension)
    spark.sql("DELETE FROM graft.rmv_f WHERE ck = 10")
    refreshedMatchesDirect()
    // mixed both-side window: fact churn + dim delete together
    spark.sql("INSERT INTO graft.rmv_f VALUES (5, 30, 500), (6, 77, 600)")
    spark.sql("DELETE FROM graft.rmv_d WHERE dk = 40")
    refreshedMatchesDirect()
    dropMv("rmv")
  }

  test("RIGHT and FULL steps inside longer chains fold incrementally") {
    catalogOn(); dropMv("rmv3")
    spark.sql("DROP TABLE IF EXISTS graft.rmv3_f")
    spark.sql("DROP TABLE IF EXISTS graft.rmv3_d1")
    spark.sql("DROP TABLE IF EXISTS graft.rmv3_d2")
    spark.sql("CREATE TABLE graft.rmv3_f (ck BIGINT, pk BIGINT, v BIGINT)")
    spark.sql("CREATE TABLE graft.rmv3_d1 (dk BIGINT, seg STRING)")
    spark.sql("CREATE TABLE graft.rmv3_d2 (qk BIGINT, region STRING)")
    spark.sql("INSERT INTO graft.rmv3_f VALUES " +
      "(10, 7, 100), (10, 8, 200), (20, 7, 300), (99, 8, 400)")
    spark.sql("INSERT INTO graft.rmv3_d1 VALUES (10, 'a'), (20, 'b'), (30, 'c')")
    spark.sql("INSERT INTO graft.rmv3_d2 VALUES (7, 'EU'), (8, 'US')")
    // f ⟾ d1 ⟕ d2: a RIGHT step MID-chain — orphan d1 rows null-extend
    // the whole fact prefix, then the LEFT suffix null-extends d2 (their
    // pk is NULL, so they ride the suffix as LEFT null-extensions)
    val defSql = "SELECT seg, region, count(*) AS n, sum(v) AS sv " +
      "FROM graft.rmv3_f RIGHT JOIN graft.rmv3_d1 ON ck = dk " +
      "LEFT JOIN graft.rmv3_d2 ON pk = qk GROUP BY seg, region"
    spark.sql(s"CALL graft.create_materialized_view('rmv3', '$defSql')")
    def direct(): Seq[Seq[Any]] = {
      spark.conf.set("spark.graft.mv.rewrite", "false")
      try rowsOf(spark.sql(defSql))
      finally spark.conf.unset("spark.graft.mv.rewrite")
    }
    assert(rowsOf(spark.sql("SELECT seg, region, n, sv FROM graft.rmv3")) ===
      direct())
    def refreshedMatchesDirect(): Unit = {
      val r = spark.sql("CALL graft.refresh_materialized_view('rmv3')").head()
      assert(r.getString(1) === "incremental")
      assert(rowsOf(spark.sql("SELECT seg, region, n, sv FROM graft.rmv3")) ===
        direct(), "the folded store must equal the direct recomputation")
    }
    // prefix (fact) insert matches orphan d1 30: right-flip retraction
    spark.sql("INSERT INTO graft.rmv3_f VALUES (30, 8, 500)")
    refreshedMatchesDirect()
    // dim-side delta + suffix dim change together
    spark.sql("INSERT INTO graft.rmv3_d1 VALUES (40, 'd')")
    spark.sql("UPDATE graft.rmv3_d2 SET region = 'APAC' WHERE qk = 8")
    refreshedMatchesDirect()
    // prefix delete re-orphans d1 10 rows (right-flip +1), mixed window
    spark.sql("DELETE FROM graft.rmv3_f WHERE ck = 10")
    spark.sql("INSERT INTO graft.rmv3_d2 VALUES (9, 'SA')")
    refreshedMatchesDirect()
    dropMv("rmv3")

    // n-way FULL: fact ⟗ d1 ⋈ d2 — FULL no longer two-table-bound
    dropMv("fmv3")
    spark.sql("DELETE FROM graft.rmv3_f WHERE ck > 90") // drop unmatched pk rows
    val fullSql = "SELECT seg, region, count(*) AS n, sum(v) AS sv " +
      "FROM graft.rmv3_f FULL OUTER JOIN graft.rmv3_d1 ON ck = dk " +
      "LEFT JOIN graft.rmv3_d2 ON pk = qk GROUP BY seg, region"
    spark.sql(s"CALL graft.create_materialized_view('fmv3', '$fullSql')")
    def directF(): Seq[Seq[Any]] = {
      spark.conf.set("spark.graft.mv.rewrite", "false")
      try rowsOf(spark.sql(fullSql))
      finally spark.conf.unset("spark.graft.mv.rewrite")
    }
    assert(rowsOf(spark.sql("SELECT seg, region, n, sv FROM graft.fmv3")) ===
      directF())
    def refreshedF(): Unit = {
      val r = spark.sql("CALL graft.refresh_materialized_view('fmv3')").head()
      assert(r.getString(1) === "incremental")
      assert(rowsOf(spark.sql("SELECT seg, region, n, sv FROM graft.fmv3")) ===
        directF())
    }
    // both-side flips through the FULL step, suffix at OLD pins
    spark.sql("INSERT INTO graft.rmv3_f VALUES (40, 7, 700), (88, 8, 800)")
    refreshedF()
    spark.sql("DELETE FROM graft.rmv3_d1 WHERE dk = 20")
    refreshedF()
    spark.sql("INSERT INTO graft.rmv3_d1 VALUES (88, 'e')")
    spark.sql("DELETE FROM graft.rmv3_f WHERE ck = 30")
    refreshedF()
    dropMv("fmv3")
  }

  test("a FULL OUTER join MV folds both-side null-extension flips incrementally") {
    catalogOn(); dropMv("fmv")
    spark.sql("DROP TABLE IF EXISTS graft.fmv_f")
    spark.sql("DROP TABLE IF EXISTS graft.fmv_d")
    spark.sql("CREATE TABLE graft.fmv_f (k BIGINT, ck BIGINT, v BIGINT)")
    spark.sql("CREATE TABLE graft.fmv_d (dk BIGINT, seg STRING)")
    spark.sql("INSERT INTO graft.fmv_f VALUES (1, 10, 100), (2, 99, 200), (3, NULL, 300)")
    spark.sql("INSERT INTO graft.fmv_d VALUES (10, 'a'), (20, 'b')")
    spark.sql("CALL graft.create_materialized_view('fmv', " +
      "'SELECT seg, count(*) AS n, sum(v) AS sv " +
      "FROM graft.fmv_f FULL OUTER JOIN graft.fmv_d ON ck = dk GROUP BY seg')")
    // fact orphans land in the NULL group; the unmatched dim row 20 is a
    // RIGHT-null-extension row (its fact columns NULL → sv is NULL)
    assert(rowsOf(spark.sql("SELECT seg, n, sv FROM graft.fmv")) ===
      Seq(Seq("a", 1L, 100L), Seq("b", 1L, null), Seq(null, 2L, 500L)))
    def direct(): Seq[Seq[Any]] = {
      spark.conf.set("spark.graft.mv.rewrite", "false")
      try rowsOf(spark.sql("SELECT seg, count(*) AS n, sum(v) AS sv " +
        "FROM graft.fmv_f FULL OUTER JOIN graft.fmv_d ON ck = dk GROUP BY seg"))
      finally spark.conf.unset("spark.graft.mv.rewrite")
    }
    def refreshedMatchesDirect(): Unit = {
      val r = spark.sql("CALL graft.refresh_materialized_view('fmv')").head()
      assert(r.getString(1) === "incremental")
      assert(rowsOf(spark.sql("SELECT seg, n, sv FROM graft.fmv")) === direct(),
        "the folded store must equal the direct recomputation")
    }
    // fact insert that MATCHES the dim-orphan 20: the right-null-ext row
    // for 'b' must retract (U_R flip −1 on the fact window) as the
    // matched row appears
    spark.sql("INSERT INTO graft.fmv_f VALUES (4, 20, 400)")
    refreshedMatchesDirect()
    // dim insert that ADOPTS the fact-orphan 99 (U_L flip −1), plus a
    // brand-new dim orphan (U_R delta: ΔD anti-joined fact@NEW)
    spark.sql("INSERT INTO graft.fmv_d VALUES (99, 'c'), (77, 'd')")
    refreshedMatchesDirect()
    // fact delete that re-orphans dim 20: its right-null-extension row
    // must REAPPEAR (U_R flip +1)
    spark.sql("DELETE FROM graft.fmv_f WHERE k = 4")
    refreshedMatchesDirect()
    // dim delete of a matched row: its fact rows flip to the NULL group
    // (U_L flip +1) while the dim row's own presence leaves
    spark.sql("DELETE FROM graft.fmv_d WHERE dk = 10")
    refreshedMatchesDirect()
    // mixed same-window churn on BOTH sides
    spark.sql("INSERT INTO graft.fmv_f VALUES (5, 77, 500), (6, 55, 600)")
    spark.sql("DELETE FROM graft.fmv_d WHERE dk = 99")
    spark.sql("INSERT INTO graft.fmv_d VALUES (55, 'e')")
    refreshedMatchesDirect()
    // retroactive dim update (±pair through the inner term; existence
    // unchanged on both sides)
    spark.sql("UPDATE graft.fmv_d SET seg = 'a' WHERE dk IN (77, 55)")
    refreshedMatchesDirect()
    dropMv("fmv")
  }

  test("FULL MV extremes force full on any movement") {
    catalogOn(); dropMv("fmv2")
    spark.sql("DROP TABLE IF EXISTS graft.fmv2_f")
    spark.sql("DROP TABLE IF EXISTS graft.fmv2_d")
    spark.sql("CREATE TABLE graft.fmv2_f (ck BIGINT, v BIGINT)")
    spark.sql("CREATE TABLE graft.fmv2_d (dk BIGINT, seg STRING)")
    spark.sql("INSERT INTO graft.fmv2_f VALUES (1, 10), (9, 90)")
    spark.sql("INSERT INTO graft.fmv2_d VALUES (1, 'a'), (7, 'q')")
    spark.sql("CALL graft.create_materialized_view('fmv2', " +
      "'SELECT seg, min(v) AS lo, count(*) AS n " +
      "FROM graft.fmv2_f FULL OUTER JOIN graft.fmv2_d ON ck = dk GROUP BY seg')")
    // even a fact-side INSERT-ONLY window can retract a right-null-
    // extension row (matching the dim orphan) — extremes always force
    // the full path on a FULL MV
    spark.sql("INSERT INTO graft.fmv2_f VALUES (7, 70)")
    assert(spark.sql("CALL graft.refresh_materialized_view('fmv2')")
      .head().getString(1) === "full",
      "any moved window with extremes on a FULL MV must recompute")
    assert(rowsOf(spark.sql("SELECT seg, lo, n FROM graft.fmv2")) ===
      Seq(Seq("a", 10L, 1L), Seq(null, 90L, 1L), Seq("q", 70L, 1L)))
    dropMv("fmv2")
  }

  test("a double-LEFT chain folds every flip combination incrementally") {
    catalogOn(); dropMv("lmv5")
    spark.sql("DROP TABLE IF EXISTS graft.lmv5_f")
    spark.sql("DROP TABLE IF EXISTS graft.lmv5_d1")
    spark.sql("DROP TABLE IF EXISTS graft.lmv5_d2")
    spark.sql("CREATE TABLE graft.lmv5_f (ck BIGINT, pk BIGINT, v BIGINT)")
    spark.sql("CREATE TABLE graft.lmv5_d1 (dk BIGINT, seg STRING)")
    spark.sql("CREATE TABLE graft.lmv5_d2 (qk BIGINT, region STRING)")
    spark.sql("INSERT INTO graft.lmv5_f VALUES " +
      "(10, 7, 100), (10, 9, 200), (99, 7, 300), (99, 9, 400), (NULL, NULL, 500)")
    spark.sql("INSERT INTO graft.lmv5_d1 VALUES (10, 'a'), (20, 'b')")
    spark.sql("INSERT INTO graft.lmv5_d2 VALUES (7, 'EU')")
    spark.sql("CALL graft.create_materialized_view('lmv5', " +
      "'SELECT seg, region, count(*) AS n, sum(v) AS sv FROM graft.lmv5_f " +
      "LEFT JOIN graft.lmv5_d1 ON ck = dk " +
      "LEFT JOIN graft.lmv5_d2 ON pk = qk GROUP BY seg, region')")
    def direct(): Seq[Seq[Any]] = {
      spark.conf.set("spark.graft.mv.rewrite", "false")
      try rowsOf(spark.sql(
        "SELECT seg, region, count(*) AS n, sum(v) AS sv FROM graft.lmv5_f " +
          "LEFT JOIN graft.lmv5_d1 ON ck = dk " +
          "LEFT JOIN graft.lmv5_d2 ON pk = qk GROUP BY seg, region"))
      finally spark.conf.unset("spark.graft.mv.rewrite")
    }
    assert(rowsOf(spark.sql("SELECT seg, region, n, sv FROM graft.lmv5")) === direct())
    def refreshedMatchesDirect(): Unit = {
      val r = spark.sql("CALL graft.refresh_materialized_view('lmv5')").head()
      assert(r.getString(1) === "incremental")
      assert(rowsOf(spark.sql("SELECT seg, region, n, sv FROM graft.lmv5")) ===
        direct(), "the folded store must equal the direct recomputation")
    }
    // BOTH LEFT dims move in ONE window: d1 adopts ck=99 (flips −1 at
    // step 1), d2 loses qk=7 (flips +1 at step 2 — over a prefix whose
    // d1 side includes both matched and null-extended rows)
    spark.sql("INSERT INTO graft.lmv5_d1 VALUES (99, 'c')")
    spark.sql("DELETE FROM graft.lmv5_d2 WHERE qk = 7")
    refreshedMatchesDirect()
    // fact churn against the double-null-extension groups
    spark.sql("DELETE FROM graft.lmv5_f WHERE v IN (200, 500)")
    spark.sql("INSERT INTO graft.lmv5_f VALUES (20, 77, 700)")
    refreshedMatchesDirect()
    // re-adopt on the second LEFT step only
    spark.sql("INSERT INTO graft.lmv5_d2 VALUES (9, 'US'), (77, 'SA')")
    refreshedMatchesDirect()
    dropMv("lmv5")
  }

  test("three-way chains materialize and serve") {
    catalogOn(); dropMv("jmv3")
    spark.sql("DROP TABLE IF EXISTS graft.jmv3_f")
    spark.sql("DROP TABLE IF EXISTS graft.jmv3_d1")
    spark.sql("DROP TABLE IF EXISTS graft.jmv3_d2")
    spark.sql("CREATE TABLE graft.jmv3_f (ck BIGINT, pk BIGINT, v BIGINT)")
    spark.sql("CREATE TABLE graft.jmv3_d1 (dk BIGINT, seg STRING)")
    spark.sql("CREATE TABLE graft.jmv3_d2 (qk BIGINT, region STRING)")
    spark.sql("INSERT INTO graft.jmv3_f VALUES (1, 7, 100), (1, 8, 200), (2, 7, 300)")
    spark.sql("INSERT INTO graft.jmv3_d1 VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graft.jmv3_d2 VALUES (7, 'EU'), (8, 'US')")
    spark.sql("CALL graft.create_materialized_view('jmv3', " +
      "'SELECT seg, region, count(*) AS n, sum(v) AS sv " +
      "FROM graft.jmv3_f JOIN graft.jmv3_d1 ON ck = dk " +
      "JOIN graft.jmv3_d2 ON pk = qk GROUP BY seg, region')")
    assert(rowsOf(spark.sql("SELECT seg, region, sv FROM graft.jmv3")) ===
      Seq(Seq("a", "EU", 100L), Seq("a", "US", 200L), Seq("b", "EU", 300L)))
    val df = spark.sql("SELECT seg, region, sum(v) AS sv FROM graft.jmv3_f " +
      "JOIN graft.jmv3_d1 ON ck = dk JOIN graft.jmv3_d2 ON pk = qk " +
      "GROUP BY seg, region")
    val t = scansOf(df.queryExecution.executedPlan)
    assert(t.contains("jmv3__store") && t.forall(_ == "jmv3__store"), s"got $t")
    df.collect()
    dropMv("jmv3")
  }

  test("the rewrite serves RIGHT and FULL OUTER aggregates from their stores") {
    catalogOn(); dropMv("smv_r"); dropMv("smv_fo")
    spark.sql("DROP TABLE IF EXISTS graft.smv_f")
    spark.sql("DROP TABLE IF EXISTS graft.smv_d")
    spark.sql("CREATE TABLE graft.smv_f (k BIGINT, ck BIGINT, v BIGINT)")
    spark.sql("CREATE TABLE graft.smv_d (dk BIGINT, seg STRING)")
    spark.sql("INSERT INTO graft.smv_f VALUES " +
      "(1, 10, 100), (2, 10, 200), (3, 99, 300)")
    spark.sql("INSERT INTO graft.smv_d VALUES (10, 'a'), (20, 'b')")
    val rightSql = "SELECT seg, count(*) AS n, sum(v) AS sv " +
      "FROM graft.smv_f RIGHT JOIN graft.smv_d ON ck = dk GROUP BY seg"
    val fullSql = "SELECT seg, count(*) AS n, sum(v) AS sv " +
      "FROM graft.smv_f FULL OUTER JOIN graft.smv_d ON ck = dk GROUP BY seg"
    spark.sql(s"CALL graft.create_materialized_view('smv_r', '$rightSql')")
    spark.sql(s"CALL graft.create_materialized_view('smv_fo', '$fullSql')")
    def direct(sql: String): Seq[Seq[Any]] = {
      spark.conf.set("spark.graft.mv.rewrite", "false")
      try rowsOf(spark.sql(sql))
      finally spark.conf.unset("spark.graft.mv.rewrite")
    }
    // the RIGHT query serves from the RIGHT store, values identical
    val rq = spark.sql(rightSql)
    assert(servedFromStore(rq, "smv_r__store"),
      s"expected smv_r__store scan, got ${scansOf(rq.queryExecution.executedPlan)}")
    assert(rowsOf(rq) === direct(rightSql))
    // the FULL query serves from the FULL store, values identical —
    // including both null-extension sides
    val fq = spark.sql(fullSql)
    assert(servedFromStore(fq, "smv_fo__store"),
      s"expected smv_fo__store scan, got ${scansOf(fq.queryExecution.executedPlan)}")
    assert(rowsOf(fq) === direct(fullSql))
    // shapes never cross: RIGHT query doesn't serve from the FULL store
    // and vice versa (each kept different null-extension rows), and an
    // INNER query serves from NEITHER
    assert(!servedFromStore(spark.sql(rightSql), "smv_fo__store"))
    assert(!servedFromStore(spark.sql(fullSql), "smv_r__store"))
    val inner = spark.sql("SELECT seg, count(*) AS n FROM graft.smv_f " +
      "JOIN graft.smv_d ON ck = dk GROUP BY seg")
    assert(!servedFromStore(inner, "smv_r__store"))
    assert(!servedFromStore(inner, "smv_fo__store"))
    // a load-bearing IS NOT NULL below a FULL side must NOT serve: the
    // store keeps the orphan rows that filter excludes (for LEFT/RIGHT
    // the optimizer-inferred equivalent is semantics-free — unmatched
    // null-key rows vanish anyway — but a FULL join drops nothing)
    val notNullBelow = spark.sql("SELECT seg, count(*) AS n FROM " +
      "(SELECT * FROM graft.smv_f WHERE ck IS NOT NULL) " +
      "FULL JOIN graft.smv_d ON ck = dk GROUP BY seg")
    assert(!servedFromStore(notNullBelow, "smv_fo__store"),
      "a below-FULL IS NOT NULL is load-bearing and must decline")
    // while the SAME subquery filter below the RIGHT query's extended
    // prefix is ON-implied and semantics-free — it still serves
    val notNullRight = spark.sql("SELECT seg, count(*) AS n FROM " +
      "(SELECT * FROM graft.smv_f WHERE ck IS NOT NULL) " +
      "RIGHT JOIN graft.smv_d ON ck = dk GROUP BY seg")
    assert(servedFromStore(notNullRight, "smv_r__store"),
      "an ON-implied not-null below a RIGHT prefix is semantics-free")
    assert(rowsOf(notNullRight) === direct(
      "SELECT seg, count(*) AS n FROM graft.smv_f " +
        "RIGHT JOIN graft.smv_d ON ck = dk GROUP BY seg"))
    // rollup to the empty grain serves too (extension rows and all)
    val global = spark.sql("SELECT count(*) AS n, sum(v) AS sv " +
      "FROM graft.smv_f FULL OUTER JOIN graft.smv_d ON ck = dk")
    assert(servedFromStore(global, "smv_fo__store"))
    assert(rowsOf(global) === direct(
      "SELECT count(*) AS n, sum(v) AS sv " +
        "FROM graft.smv_f FULL OUTER JOIN graft.smv_d ON ck = dk"))
    // a dim-side WHERE on the RIGHT query (preserved side): the
    // optimizer pushes it below the preserved dim child, the rule
    // hoists it back to the top region (preserved-side selections
    // commute), and — being group-only — it serves as a whole-group
    // post-filter on the store
    val dimPred = spark.sql("SELECT seg, count(*) AS n FROM graft.smv_f " +
      "RIGHT JOIN graft.smv_d ON ck = dk WHERE seg = 'b' GROUP BY seg")
    assert(servedFromStore(dimPred, "smv_r__store"),
      "a group-only dim predicate filters whole groups on the store")
    assert(rowsOf(dimPred) === direct(
      "SELECT seg, count(*) AS n FROM graft.smv_f " +
        "RIGHT JOIN graft.smv_d ON ck = dk WHERE seg = 'b' GROUP BY seg"))
    dropMv("smv_r"); dropMv("smv_fo")
  }

  test("the rewrite serves double-LEFT chains from the chain store") {
    catalogOn(); dropMv("smv_lc")
    spark.sql("DROP TABLE IF EXISTS graft.smvlc_f")
    spark.sql("DROP TABLE IF EXISTS graft.smvlc_d1")
    spark.sql("DROP TABLE IF EXISTS graft.smvlc_d2")
    spark.sql("CREATE TABLE graft.smvlc_f (ck BIGINT, pk BIGINT, v BIGINT)")
    spark.sql("CREATE TABLE graft.smvlc_d1 (dk BIGINT, seg STRING)")
    spark.sql("CREATE TABLE graft.smvlc_d2 (qk BIGINT, region STRING)")
    spark.sql("INSERT INTO graft.smvlc_f VALUES " +
      "(10, 7, 100), (10, 99, 200), (99, 7, 300)")
    spark.sql("INSERT INTO graft.smvlc_d1 VALUES (10, 'a'), (20, 'b')")
    spark.sql("INSERT INTO graft.smvlc_d2 VALUES (7, 'EU'), (8, 'US')")
    val chainSql = "SELECT seg, region, count(*) AS n, sum(v) AS sv " +
      "FROM graft.smvlc_f LEFT JOIN graft.smvlc_d1 ON ck = dk " +
      "LEFT JOIN graft.smvlc_d2 ON pk = qk GROUP BY seg, region"
    spark.sql(s"CALL graft.create_materialized_view('smv_lc', '$chainSql')")
    def direct(sql: String): Seq[Seq[Any]] = {
      spark.conf.set("spark.graft.mv.rewrite", "false")
      try rowsOf(spark.sql(sql))
      finally spark.conf.unset("spark.graft.mv.rewrite")
    }
    val df = spark.sql(chainSql)
    assert(servedFromStore(df, "smv_lc__store"),
      s"expected smv_lc__store scan, got ${scansOf(df.queryExecution.executedPlan)}")
    assert(rowsOf(df) === direct(chainSql))
    // a single-LEFT query over the same tables is a DIFFERENT shape —
    // it must not serve from the double-LEFT store
    val single = spark.sql("SELECT seg, count(*) AS n " +
      "FROM graft.smvlc_f LEFT JOIN graft.smvlc_d1 ON ck = dk " +
      "JOIN graft.smvlc_d2 ON pk = qk GROUP BY seg")
    assert(!servedFromStore(single, "smv_lc__store"))
    // rollup to one grain column serves (re-aggregated store)
    val rolled = spark.sql("SELECT region, sum(v) AS sv " +
      "FROM graft.smvlc_f LEFT JOIN graft.smvlc_d1 ON ck = dk " +
      "LEFT JOIN graft.smvlc_d2 ON pk = qk GROUP BY region")
    assert(servedFromStore(rolled, "smv_lc__store"))
    assert(rowsOf(rolled) === direct(
      "SELECT region, sum(v) AS sv " +
        "FROM graft.smvlc_f LEFT JOIN graft.smvlc_d1 ON ck = dk " +
        "LEFT JOIN graft.smvlc_d2 ON pk = qk GROUP BY region"))
    // after DML on every table, refresh restores serving with the
    // moved truth
    spark.sql("INSERT INTO graft.smvlc_f VALUES (20, 8, 400)")
    spark.sql("INSERT INTO graft.smvlc_d1 VALUES (99, 'c')")
    spark.sql("DELETE FROM graft.smvlc_d2 WHERE qk = 7")
    assert(!servedFromStore(spark.sql(chainSql), "smv_lc__store"))
    spark.sql("CALL graft.refresh_materialized_view('smv_lc')")
    val df2 = spark.sql(chainSql)
    assert(servedFromStore(df2, "smv_lc__store"))
    assert(rowsOf(df2) === direct(chainSql))
    dropMv("smv_lc")
  }
}
