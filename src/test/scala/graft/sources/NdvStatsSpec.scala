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

  test("sketch union: overlapping batch domains estimate tightly") {
    catalogOn(); drop("ndv_overlap")
    spark.sql("CREATE TABLE graft.ndv_overlap (k BIGINT)")
    // 8 commits over the SAME 5000-value domain: the Σ-cap bound reads
    // ~8 × 5000 (capped at rows); the union sketch must land near 5000
    for (_ <- 1 to 8)
      spark.sql("INSERT INTO graft.ndv_overlap SELECT id % 5000 FROM range(0, 5000)")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.table("graft.ndv_overlap").queryExecution.optimizedPlan.stats
      val k = stats.attributeStats.map { case (a, s) => a.name -> s }.apply("k")
      val est = k.distinctCount.get.toLong
      // within HLL error (~2.3% at p=11; allow 10% head-room) of the
      // true 5000 — NOT the Σ bound's 40000-capped-at-rows
      assert(est > 4500 && est < 5500, s"union estimate $est, truth 5000")
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
    drop("ndv_overlap")
  }

  test("NdvSketch: exact below threshold, HLL above, merge and bytes round-trip") {
    // exact mode
    val a = NdvSketch.empty()
    (0 until 1000).foreach(i => a.addValue(java.lang.Long.valueOf(i.toLong)))
    assert(a.isExact && a.estimate === 1000L)
    // duplicates don't count
    (0 until 1000).foreach(i => a.addValue(java.lang.Long.valueOf(i.toLong)))
    assert(a.estimate === 1000L)
    // degrade past the threshold; estimate stays within sketch error
    val b = NdvSketch.empty()
    (0 until 100000).foreach(i => b.addValue(java.lang.Long.valueOf(i.toLong)))
    assert(!b.isExact)
    assert(math.abs(b.estimate - 100000L) < 10000L, b.estimate.toString)
    // union merge: overlapping halves of one domain -> the domain
    val l = NdvSketch.empty(); val r = NdvSketch.empty()
    (0 until 60000).foreach(i => l.addValue(java.lang.Long.valueOf(i.toLong)))
    (30000 until 90000).foreach(i => r.addValue(java.lang.Long.valueOf(i.toLong)))
    l.merge(r)
    assert(math.abs(l.estimate - 90000L) < 9000L, l.estimate.toString)
    // exact + exact stays exact under the threshold
    val e1 = NdvSketch.empty(); val e2 = NdvSketch.empty()
    (0 until 800).foreach(i => e1.addValue(java.lang.Long.valueOf(i.toLong)))
    (400 until 1200).foreach(i => e2.addValue(java.lang.Long.valueOf(i.toLong)))
    e1.merge(e2)
    assert(e1.isExact && e1.estimate === 1200L)
    // canonical hashing: INT 3 and LONG 3 are one distinct value
    val c = NdvSketch.empty()
    c.addValue(Integer.valueOf(3)); c.addValue(java.lang.Long.valueOf(3L))
    assert(c.estimate === 1L)
    // serialization round-trips both modes
    val exactRt = NdvSketch.fromBytes(e1.toBytes)
    assert(exactRt.estimate === e1.estimate && exactRt.isExact)
    val hllRt = NdvSketch.fromBytes(b.toBytes)
    assert(hllRt.estimate === b.estimate && !hllRt.isExact)
    // merging into a round-tripped sketch behaves identically
    exactRt.merge(hllRt)
    assert(math.abs(exactRt.estimate - b.estimate) < b.estimate / 5)
  }
}
