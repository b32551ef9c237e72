package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

import graft.SparkSpec

/** MV AUTO-REFRESH ('auto-refresh' create option): the connector's
  * streaming sink refreshes the view after every epoch commit on its
  * sources — a continuously-written table's MVs keep serving with ZERO
  * manual CALLs, exactly-once across the write-intent crash window, and
  * the option survives the journal round trip.
  */
class MvAutoRefreshSpec extends SparkSpec {

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

  test("streamed epochs keep an auto-refresh MV serving with zero manual CALLs") {
    catalogOn(); dropMv("mvar")
    spark.sql("DROP TABLE IF EXISTS graft.mvar_src")
    spark.sql("CREATE TABLE graft.mvar_src (g STRING, v BIGINT)")
    spark.sql("CALL graft.create_materialized_view('mvar', " +
      "'SELECT g, count(*) AS n, sum(v) AS sv FROM graft.mvar_src GROUP BY g', " +
      "'auto-refresh')")
    assert(MatViews.registry("mvar").autoRefresh)

    val sess = spark.newSession()
    sess.conf.set("spark.sql.shuffle.partitions", "2")
    sess.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import sess.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sess.sqlContext
    val ms = MemoryStream[(String, Long)]
    val cp = graft.rentals.Scratch.dir(s"mvar_cp_${System.nanoTime()}")
    val q = ms.toDF().toDF("g", "v").writeStream
      .option("checkpointLocation", cp)
      .toTable("graft.mvar_src")
    try {
      ms.addData(("a", 10L), ("a", 20L), ("b", 5L)) // epoch 0
      q.processAllAvailable()
      val st1 = MatViews.registry("mvar")
      val src = MemTables.get("mvar_src").get
      assert(st1.watermark === src.version,
        "epoch commit must have auto-refreshed the watermark")
      val agg1 = spark.sql(
        "SELECT g, count(*) AS n, sum(v) AS sv FROM graft.mvar_src GROUP BY g")
      assert(servedFromStore(agg1, "mvar__store"),
        s"got ${scansOf(agg1.queryExecution.executedPlan)}")
      assert(agg1.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap === Map("a" -> ((2L, 30L)), "b" -> ((1L, 5L))))

      ms.addData(("a", 100L)) // epoch 1
      q.processAllAvailable()
      assert(MatViews.registry("mvar").watermark === src.version)
      val agg2 = spark.sql("SELECT g, sum(v) AS sv FROM graft.mvar_src GROUP BY g")
      assert(servedFromStore(agg2, "mvar__store"))
      assert(agg2.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
        Map("a" -> 130L, "b" -> 5L))
    } finally q.stop()
    dropMv("mvar")
  }

  test("exactly-once across a mid-epoch crash window (write-intent repair)") {
    catalogOn(); dropMv("mvar2")
    spark.sql("DROP TABLE IF EXISTS graft.mvar2_src")
    spark.sql("CREATE TABLE graft.mvar2_src (g STRING, v BIGINT)")
    spark.sql("INSERT INTO graft.mvar2_src VALUES ('a', 1)")
    spark.sql("CALL graft.create_materialized_view('mvar2', " +
      "'SELECT g, count(*) AS n, sum(v) AS sv FROM graft.mvar2_src GROUP BY g', " +
      "'auto-refresh')")
    val before = MatViews.registry("mvar2")
    val storeV0 = MemTables.get("mvar2__store").get.version
    // an ordinary commit + auto-path refresh (manual call stands in for
    // the epoch hook — the repair is identical)
    spark.sql("INSERT INTO graft.mvar2_src VALUES ('a', 9)")
    MatViews.autoRefreshFor("mvar2_src")
    val good = spark.sql("SELECT n, sv FROM graft.mvar2 WHERE g = 'a'").head()
    assert((good.getLong(0), good.getLong(1)) === ((2L, 10L)))
    // simulate the crash: merge committed, watermark write lost
    val stale = before.copy(pending =
      Some(MatViews.Pending(before.watermark, before.watermark + 1, storeV0)))
    MatViews.registry.put("mvar2", stale)
    MatViews.persist(stale)
    // the NEXT epoch's auto-refresh repairs — never double-applies
    MatViews.autoRefreshFor("mvar2_src")
    val fixed = spark.sql("SELECT n, sv FROM graft.mvar2 WHERE g = 'a'").head()
    assert((fixed.getLong(0), fixed.getLong(1)) === ((2L, 10L)))
    dropMv("mvar2")
  }

  test("non-auto MVs stay stale across epochs; the option round-trips the journal") {
    catalogOn(); dropMv("mvar3"); dropMv("mvar3m")
    spark.sql("DROP TABLE IF EXISTS graft.mvar3_src")
    spark.sql("CREATE TABLE graft.mvar3_src (g STRING, v BIGINT)")
    spark.sql("INSERT INTO graft.mvar3_src VALUES ('a', 1)")
    spark.sql("CALL graft.create_materialized_view('mvar3', " +
      "'SELECT g, count(*) AS n FROM graft.mvar3_src GROUP BY g', 'auto-refresh')")
    spark.sql("CALL graft.create_materialized_view('mvar3m', " +
      "'SELECT g, sum(v) AS sv FROM graft.mvar3_src GROUP BY g')") // manual
    spark.sql("INSERT INTO graft.mvar3_src VALUES ('b', 2)")
    MatViews.autoRefreshFor("mvar3_src") // the epoch hook
    val src = MemTables.get("mvar3_src").get
    assert(MatViews.registry("mvar3").watermark === src.version)
    assert(MatViews.registry("mvar3m").watermark < src.version,
      "a manual MV must not be refreshed behind the user's back")
    // journal round trip keeps the flag
    MatViews.forget("mvar3"); MatViews.resetRecoveryMemos()
    assert(MatViews.getOrRecover("mvar3").get.autoRefresh)
    dropMv("mvar3"); dropMv("mvar3m")
  }

  test("unknown create options fail loudly") {
    catalogOn(); dropMv("mvar4")
    spark.sql("DROP TABLE IF EXISTS graft.mvar4_src")
    spark.sql("CREATE TABLE graft.mvar4_src (g STRING, v BIGINT)")
    val e = intercept[Exception] {
      spark.sql("CALL graft.create_materialized_view('mvar4', " +
        "'SELECT g, count(*) AS n FROM graft.mvar4_src GROUP BY g', " +
        "'auto-refresh,self-destruct')").collect()
    }
    assert(e.getMessage.contains("unknown option"))
    assert(MatViews.registry.get("mvar4").isEmpty)
  }
}
