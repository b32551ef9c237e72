package graft.sources

import graft.SparkSpec

/** Partition SPEC EVOLUTION ([[MemTables.replacePartitionSpec]] /
  * `CALL graft.replace_partition_spec`): the spec timeline, per-era
  * pruning (old batches keep their written spec's layout), the SPJ and
  * group-pushdown decline on mixed eras, the dynamic-overwrite reject,
  * the rewrite-as-migration path, and the evolution guards extending to
  * every spec that ever existed.
  */
class SpecEvolutionSpec extends SparkSpec {

  private def catalogOn(): Unit = {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
  }

  private def drop(names: String*): Unit =
    names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS graft.$n"))

  private def scans(pl: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] = pl match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      scans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
    case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => Seq(b)
    case other => other.children.flatMap(scans)
  }

  private def memScan(df: org.apache.spark.sql.DataFrame) =
    scans(df.queryExecution.executedPlan)
      .filter(_.toString.contains("GraftMemScan")).head

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
      case e: org.apache.spark.sql.execution.exchange.Exchange =>
        1 + e.children.map(walk).sum
      case other => other.children.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  private def liveBatches(key: String) =
    MemTables.get(key).get.batches.filter(_.removedAt == Long.MaxValue)

  test("parseSpec round-trips the PARTITIONED BY surface syntax") {
    import MemTables._
    assert(parseSpec("k") === Seq(IdentityPart("k")))
    assert(parseSpec("months(d), bucket(8, k), v, truncate(4, s)") ===
      Seq(TimePart("months", "d"), BucketPart(8, "k"),
        IdentityPart("v"), TruncatePart(4, "s")))
    assert(parseSpec("") === Nil)
    assert(parseSpec(" year(d) ") === Seq(TimePart("years", "d")))
    intercept[IllegalArgumentException](parseSpec("zorder(a, b)"))
    assert(renderSpec(parseSpec("months(d), bucket(8, k)")) ===
      "months(d), bucket(8, k)")
  }

  test("evolve: old batches keep their spec, both eras prune, reads stay exact") {
    catalogOn(); drop("se_t")
    spark.sql("CREATE TABLE graft.se_t (k BIGINT, d DATE) PARTITIONED BY (years(d))")
    spark.sql("""INSERT INTO graft.se_t
      SELECT id, date_add(DATE'1994-07-01', CAST(id * 200 AS INT)) FROM range(0, 4)""")
    val r = spark.sql(
      "CALL graft.replace_partition_spec('se_t', 'months(d)')").collect()(0)
    assert(r.getInt(0) === 1 && r.getString(1) === "months(d)")
    spark.sql("""INSERT INTO graft.se_t
      SELECT id + 100, date_add(DATE'1994-07-01', CAST(id * 200 AS INT)) FROM range(0, 4)""")

    val specs = MemTables.get("se_t").get.specHistory
    assert(specs === Vector(Seq(MemTables.TimePart("years", "d")),
      Seq(MemTables.TimePart("months", "d"))))
    val byId = liveBatches("se_t").groupBy(_.specId)
    assert(byId.keySet === Set(0, 1))
    // era-0 batches carry YEAR ordinals, era-1 batches MONTH ordinals
    assert(byId(0).map(_.part.head.asInstanceOf[Int]).toSet === Set(24, 25, 26))
    assert(byId(1).map(_.part.head.asInstanceOf[Int]).forall(_ > 290))

    // a raw range predicate prunes BOTH eras under their own specs: the
    // 1994 window keeps era-0's 1994 year-batch and era-1's 1994 months
    val w = spark.table("graft.se_t")
      .where("d >= DATE'1994-07-01' AND d < DATE'1995-01-01'")
    assert(w.collect().map(_.getLong(0)).sorted.toSeq === Seq(0L, 100L))
    assert(memScan(w).inputRDD.getNumPartitions === 2, memScan(w).toString)
    // full read sees every era
    assert(spark.table("graft.se_t").count() === 8L)
    drop("se_t")
  }

  test("mixed eras decline SPJ; a rewrite migrates and restores it") {
    catalogOn(); drop("se_a", "se_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      for (t <- Seq("se_a", "se_b")) {
        spark.sql(s"CREATE TABLE graft.$t (nk INT, v BIGINT) PARTITIONED BY (nk)")
        spark.sql(s"INSERT INTO graft.$t SELECT CAST(id % 5 AS INT), id FROM range(0, 50)")
      }
      val join = "SELECT a.v, b.v FROM graft.se_a a JOIN graft.se_b b ON a.nk = b.nk"
      assert(exchanges(spark.sql(join)) === 0) // co-partitioned: SPJ

      // evolve se_a and write one batch under the new spec: mixed eras
      spark.sql("CALL graft.replace_partition_spec('se_a', 'bucket(4, nk)')")
      spark.sql("INSERT INTO graft.se_a SELECT CAST(id % 5 AS INT), id + 100 FROM range(0, 10)")
      assert(liveBatches("se_a").map(_.specId).distinct.size === 2)
      val mixed = spark.sql(join)
      assert(exchanges(mixed) > 0, "mixed-era scan must not report key-grouping")
      assert(mixed.count() === 600L) // 12 a-rows x 10 b-rows per nk x 5

      // the rewrite migrates every live batch to the current spec
      spark.sql("CALL graft.rewrite_data_files('se_a', 'nk')")
      assert(liveBatches("se_a").map(_.specId).distinct ===
        Vector(MemTables.get("se_a").get.currentSpecId))
      // both sides key-grouped again — but now bucket(4) vs identity:
      // compatible co-partitioning is not required to re-check here; the
      // data answer must be identical
      assert(spark.sql(join).count() === 600L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    drop("se_a", "se_b")
  }

  test("dynamic overwrite rejects mixed eras, works again after migration") {
    catalogOn(); drop("se_dyn")
    spark.sql("CREATE TABLE graft.se_dyn (k BIGINT, nk INT) PARTITIONED BY (nk)")
    spark.sql("INSERT INTO graft.se_dyn SELECT id, CAST(id % 3 AS INT) FROM range(0, 30)")
    spark.sql("CALL graft.replace_partition_spec('se_dyn', 'bucket(2, k)')")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val e = intercept[Exception] {
        spark.sql("INSERT OVERWRITE graft.se_dyn VALUES (999, 1)")
      }
      assert(e.getMessage.contains("older partition spec") ||
        Option(e.getCause).exists(_.getMessage.contains("older partition spec")),
        e.toString)
      // version ledger unburned by the reject: history has no gap
      val hist = spark.table("graft.se_dyn.history").collect().map(_.getLong(0)).sorted
      assert(hist.toSeq === (0L to hist.max).toSeq)
      spark.sql("CALL graft.rewrite_data_files('se_dyn', 'k')")
      spark.sql("INSERT OVERWRITE graft.se_dyn VALUES (999, 1)")
      // replaced exactly the bucket tuple of k=999; other bucket survives
      val left = spark.table("graft.se_dyn")
      assert(left.where("k = 999").count() === 1L)
      assert(left.count() > 1L)
    } finally
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    drop("se_dyn")
  }

  test("evolution guards cover every spec era; metadata tables expose spec_id") {
    catalogOn(); drop("se_guard")
    spark.sql("CREATE TABLE graft.se_guard (k BIGINT, d DATE, s STRING) " +
      "PARTITIONED BY (months(d))")
    spark.sql("INSERT INTO graft.se_guard VALUES (1, DATE'2020-05-05', 'x')")
    spark.sql("CALL graft.replace_partition_spec('se_guard', 'truncate(1, s)')")
    spark.sql("INSERT INTO graft.se_guard VALUES (2, DATE'2021-06-06', 'y')")
    // d is only in the OLD spec — still guarded (old batches carry its tuples)
    val e = intercept[Exception](spark.sql("ALTER TABLE graft.se_guard DROP COLUMN d"))
    assert(e.getMessage.toLowerCase.contains("partition"), e.getMessage)

    val files = spark.sql(
      "SELECT spec_id, partition FROM graft.se_guard.files ORDER BY spec_id").collect()
    assert(files.map(_.getInt(0)).toSeq === Seq(0, 1))
    assert(files(0).getString(1).startsWith("d_months="))
    assert(files(1).getString(1) === "s_trunc=y")
    val parts = spark.table("graft.se_guard.partitions").collect()
    assert(parts.length === 2)
    // old-era group: NULL typed column, spec_id 0
    assert(parts.exists(r => r.isNullAt(0) && r.getInt(1) === 0))
    assert(parts.exists(r => !r.isNullAt(0) && r.getString(0) == "y" && r.getInt(1) === 1))

    // replaying the same spec is rejected (nothing to replace)
    val same = intercept[Exception](
      spark.sql("CALL graft.replace_partition_spec('se_guard', 'truncate(1, s)')"))
    assert(same.getMessage.contains("nothing to replace"), same.getMessage)
    drop("se_guard")
  }

  test("time travel across the evolution reads each era exactly") {
    catalogOn(); drop("se_tt")
    spark.sql("CREATE TABLE graft.se_tt (k BIGINT, d DATE) PARTITIONED BY (years(d))")
    spark.sql("INSERT INTO graft.se_tt VALUES (1, DATE'1999-09-09')") // v1
    spark.sql("CALL graft.replace_partition_spec('se_tt', 'days(d)')") // v2
    spark.sql("INSERT INTO graft.se_tt VALUES (2, DATE'2000-01-01')") // v3
    assert(spark.sql("SELECT k FROM graft.se_tt VERSION AS OF 1").collect()
      .map(_.getLong(0)).toSeq === Seq(1L))
    assert(spark.sql("SELECT k FROM graft.se_tt ORDER BY k").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 2L))
    // the pre-evolution snapshot is uniform era 0: pruning on d works there
    val old = spark.sql(
      "SELECT k FROM graft.se_tt VERSION AS OF 1 WHERE d = DATE'1999-09-09'")
    assert(old.collect().map(_.getLong(0)).toSeq === Seq(1L))
    drop("se_tt")
  }
}
