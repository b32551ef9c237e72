package graft.sources

import graft.SparkSpec

/** Column-level NDV statistics ([[MemTables.ColStats.ndv]] /
  * [[MemScan.estimateStatistics]]'s `columnStats()`): exact per-batch
  * distinct counts at publish, merged as a bound at planning, surfaced
  * through `SupportsReportStatistics` so Spark's cost-based optimizer
  * sees real column cardinalities on connector tables.
  */
class NdvStatsSpec extends SparkSpec {

  private def catalogOn(): Unit =
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")

  private def drop(names: String*): Unit =
    names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS graft.$n"))

  test("per-batch NDV is exact at publish; canonical across widening forms") {
    catalogOn(); drop("ndv_exact")
    spark.sql("CREATE TABLE graft.ndv_exact (k BIGINT, g BIGINT, s STRING)")
    spark.sql("INSERT INTO graft.ndv_exact " +
      "SELECT id, id % 7, concat('v', id % 3) FROM range(0, 100)")
    val live = MemTables.get("ndv_exact").get.batches
      .filter(_.removedAt == Long.MaxValue)
    // per batch: k all-distinct, g ≤ 7, s ≤ 3 — exact for the batch's rows
    live.foreach { b =>
      assert(b.stats("k").ndv === b.rowCount.toLong)
      assert(b.stats("g").ndv ===
        b.rows.map(_.getLong(1)).distinct.length.toLong)
      assert(b.stats("s").ndv ===
        b.rows.map(_.getUTF8String(2).toString).distinct.length.toLong)
    }
    drop("ndv_exact")
  }

  test("scan statistics expose bounded distinct/null counts to the CBO") {
    catalogOn(); drop("ndv_cbo")
    spark.sql("CREATE TABLE graft.ndv_cbo (k BIGINT, g BIGINT)")
    spark.sql("INSERT INTO graft.ndv_cbo SELECT id, id % 10 FROM range(0, 1000)")
    val nBatches = MemTables.get("ndv_cbo").get.batches
      .count(_.removedAt == Long.MaxValue)

    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.table("graft.ndv_cbo").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(1000)))
      assert(stats.attributeStats.nonEmpty,
        "V2 column stats must reach the catalyst plan")
      val byName = stats.attributeStats.map { case (a, s) => a.name -> s }
      // k: all-distinct — the bound equals the row count exactly
      assert(byName("k").distinctCount.contains(BigInt(1000)))
      // g: 10 true values; the per-batch-sum bound is ≤ 10 × batches and
      // ≥ 10 (every batch holds at most 10 distinct g values)
      val g = byName("g").distinctCount.get
      assert(g >= BigInt(10) && g <= BigInt(10L * nBatches), g.toString)
      assert(byName("k").nullCount.contains(BigInt(0)))
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
    drop("ndv_cbo")
  }

  test("NDV bound caps at live rows and survives the file-backed plane") {
    catalogOn(); drop("ndv_pq")
    spark.sql("CREATE TABLE graft.ndv_pq (k BIGINT) " +
      "TBLPROPERTIES ('graft.storage'='parquet')")
    spark.sql("INSERT INTO graft.ndv_pq SELECT id % 5 FROM range(0, 50)")
    // the write task computed NDV into the manifest — no file load needed
    val live = MemTables.get("ndv_pq").get.batches
      .filter(_.removedAt == Long.MaxValue)
    live.foreach { b =>
      assert(b.store.file.isDefined)
      assert(b.stats("k").ndv >= 1L && b.stats("k").ndv <= 5L)
    }
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.table("graft.ndv_pq").queryExecution.optimizedPlan.stats
      val k = stats.attributeStats.map { case (a, s) => a.name -> s }.apply("k")
      // the bound can never exceed the live row count
      assert(k.distinctCount.get <= BigInt(50))
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
    drop("ndv_pq")
  }
}
