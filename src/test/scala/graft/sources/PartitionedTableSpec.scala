package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.sources._

/** Partitioned mem tables ([[MemTables.PartField]]): layout purity through
  * every write path, exact partition pruning (identity via singleton
  * stats, bucket via the hash), storage-partitioned joins and
  * partition-key aggregation with zero exchanges, the clustered write
  * distribution, and the partition-column evolution guards.
  */
class PartitionedTableSpec extends SparkSpec {

  private def catalogOn(): Unit = {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
  }

  private def drop(names: String*): Unit =
    names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS graft.$n"))

  private def liveBatches(key: String) =
    MemTables.get(key).get.batches.filter(_.removedAt == Long.MaxValue)

  test("partitioned create: transforms echo and every batch is partition-pure") {
    catalogOn(); drop("pt_pure")
    spark.sql("CREATE TABLE graft.pt_pure (k INT, v BIGINT) PARTITIONED BY (k, bucket(4, v))")
    val transforms = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[SeqCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array.empty, "pt_pure"))
      .partitioning()
    assert(transforms.map(_.describe).toSeq === Seq("k", "bucket(4, v)"))
    spark.sql("INSERT INTO graft.pt_pure SELECT CAST(id % 3 AS INT), id FROM range(0, 60)")
    val live = liveBatches("pt_pure")
    assert(live.nonEmpty)
    // partition-pure: every row of a batch recomputes to the batch's tuple
    val spec = MemTables.get("pt_pure").get.partitioning
    live.foreach { b =>
      b.rows.foreach { r =>
        assert(MemTables.partTupleOf(spec, b.schema, r) === b.part)
      }
    }
    // and the split is real: 3 identity values × up to 4 buckets per task
    assert(live.map(_.part).distinct.size > 3)
    drop("pt_pure")
  }

  test("identity and bucket pruning: planned partitions shrink, all filters residual") {
    catalogOn(); drop("pt_prune")
    spark.sql("CREATE TABLE graft.pt_prune (nk INT, ck BIGINT) PARTITIONED BY (nk, bucket(4, ck))")
    // one writer task -> per-(nk, bucket) batches; nk in {0,1,2}, ck 0..59
    spark.sql(
      "INSERT INTO graft.pt_prune SELECT CAST(id % 3 AS INT), id FROM range(0, 60)")
    val st = MemTables.get("pt_prune").get
    val total = liveBatches("pt_prune").size
    assert(total >= 9, s"expected a multi-partition layout, got $total batches")

    def planned(fs: Filter*): Int = {
      val b = new MemScanBuilder("pt_prune", st.schema, None)
      val residual = b.pushFilters(fs.toArray)
      assert(residual.toSeq === fs.toSeq, "every filter must stay a residual")
      b.build().asInstanceOf[MemScan].planInputPartitions().length
    }
    assert(planned() === total)
    // identity: one nation's batches only (singleton stats prune)
    assert(planned(EqualTo("nk", 1)) === total / 3)
    // bucket: ck = 7 keeps exactly the bucketOf(7, 4) batches
    val b7 = MemTables.bucketOf(java.lang.Long.valueOf(7L), 4)
    val bucketPlanned = planned(EqualTo("ck", 7L))
    assert(bucketPlanned < total)
    liveBatches("pt_prune").filter(_.part(1) == b7).foreach { b =>
      assert(bucketPlanned >= 1)
    }
    // IN over two keys keeps at most two buckets' worth per nation
    assert(planned(In("ck", Array[Any](7L, 8L))) <= total / 4 * 2 + total / 4)
    // conjunction composes both prunes
    assert(planned(EqualTo("nk", 1), EqualTo("ck", 7L)) <= total / 3)
    // ranges cannot prune a hash layout (conservative)
    assert(planned(GreaterThan("ck", 100L)) === 0) // ...but bounds still do
    drop("pt_prune")
  }

  test("storage-partitioned join: co-partitioned tables join and aggregate with zero exchanges") {
    catalogOn(); drop("pt_spj_a", "pt_spj_b")
    spark.sql("CREATE TABLE graft.pt_spj_a (k INT, v BIGINT) PARTITIONED BY (k)")
    spark.sql("CREATE TABLE graft.pt_spj_b (k INT, w BIGINT) PARTITIONED BY (k)")
    spark.sql("INSERT INTO graft.pt_spj_a SELECT CAST(id % 5 AS INT), id FROM range(0, 50)")
    spark.sql("INSERT INTO graft.pt_spj_b SELECT CAST(id % 5 AS INT), id * 10 FROM range(0, 20)")
    val j = spark.sql(
      """SELECT /*+ MERGE(a) */ a.k, count(*) AS cnt, sum(a.v + b.w) AS tot
        |FROM graft.pt_spj_a a JOIN graft.pt_spj_b b ON a.k = b.k
        |GROUP BY a.k""".stripMargin)
    val rows = j.collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(0, 1, 2, 3, 4))
    assert(rows.forall(_._2 === 40L)) // 10 × 4 per key
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"),
      s"SPJ join + partition-key aggregate must plan zero exchanges:\n$plan")
    drop("pt_spj_a", "pt_spj_b")
  }

  test("storage-partitioned join: bucket layout (function-catalog resolved)") {
    catalogOn(); drop("pt_spjb_a", "pt_spjb_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("CREATE TABLE graft.pt_spjb_a (k BIGINT, v INT) PARTITIONED BY (bucket(4, k))")
      spark.sql("CREATE TABLE graft.pt_spjb_b (k BIGINT, w INT) PARTITIONED BY (bucket(4, k))")
      spark.sql("INSERT INTO graft.pt_spjb_a SELECT id, CAST(id % 7 AS INT) FROM range(0, 50)")
      spark.sql("INSERT INTO graft.pt_spjb_b SELECT id, CAST(id % 3 AS INT) FROM range(0, 50)")
      val j = spark.sql(
        "SELECT a.k, a.v, b.w FROM graft.pt_spjb_a a JOIN graft.pt_spjb_b b ON a.k = b.k")
      assert(j.count() === 50)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucket SPJ must not shuffle either side:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    drop("pt_spjb_a", "pt_spjb_b")
  }

  test("partitioned write requests a clustered distribution") {
    catalogOn(); drop("pt_dist")
    spark.sql("CREATE TABLE graft.pt_dist (k INT, v BIGINT) PARTITIONED BY (k)")
    val ins = spark.sql(
      "INSERT INTO graft.pt_dist SELECT CAST(id % 5 AS INT), id FROM range(0, 100)")
    val plan = ins.queryExecution.executedPlan.toString
    // STRICT clustering with a pinned (conf-derived) partition count: a
    // REPARTITION_BY_NUM hash exchange on the partition expressions. The
    // earlier non-strict REBALANCE_PARTITIONS_BY_COL shape let AQE's
    // byte-based coalescing squeeze the exchange to one task, which then
    // wrote every partition's file serially (r17: dsv2_partitioned_prune's
    // append was 1 task × 1.16 s for 200 tuple files).
    assert(plan.contains("REPARTITION_BY_NUM") && plan.contains("hashpartitioning(k"),
      s"partitioned INSERT must cluster rows by the partition expressions:\n$plan")
    // unpartitioned writes stay exchange-free
    drop("pt_flat")
    spark.sql("CREATE TABLE graft.pt_flat (k INT, v BIGINT)")
    val flatPlan = spark.sql(
      "INSERT INTO graft.pt_flat SELECT CAST(id % 5 AS INT), id FROM range(0, 100)")
      .queryExecution.executedPlan.toString
    assert(!flatPlan.contains("REPARTITION_BY_NUM") && !flatPlan.contains("Exchange"))
    drop("pt_dist", "pt_flat")
  }

  test("partition columns are protected from drop/rename/retype; spec validated at create") {
    catalogOn(); drop("pt_guard")
    spark.sql("CREATE TABLE graft.pt_guard (k INT, v BIGINT) PARTITIONED BY (k)")
    val e1 = intercept[Exception](spark.sql("ALTER TABLE graft.pt_guard DROP COLUMN k"))
    assert(e1.getMessage.contains("partition column"))
    val e2 = intercept[Exception](spark.sql("ALTER TABLE graft.pt_guard RENAME COLUMN k TO kk"))
    assert(e2.getMessage.contains("partition column"))
    val e3 = intercept[Exception](
      spark.sql("ALTER TABLE graft.pt_guard ALTER COLUMN k TYPE BIGINT"))
    assert(e3.getMessage.contains("partition column"))
    // non-partition columns still evolve freely
    spark.sql("ALTER TABLE graft.pt_guard ALTER COLUMN v TYPE BIGINT")
    spark.sql("ALTER TABLE graft.pt_guard RENAME COLUMN v TO w")
    // create-time validation
    val c1 = intercept[Exception](
      spark.sql("CREATE TABLE graft.pt_bad1 (k INT) PARTITIONED BY (missing)"))
    assert(c1.getMessage.contains("missing")) // Spark rejects at analysis
    // time transforms are supported since round 12; multi-column buckets
    // remain honestly rejected
    val c2 = intercept[Exception](
      spark.sql("CREATE TABLE graft.pt_bad2 (k INT, v INT) PARTITIONED BY (bucket(4, k, v))"))
    assert(c2.getMessage.contains("single-column bucket"), c2.getMessage)
    drop("pt_guard")
  }

  test("NULL identity partition values read back and prune") {
    catalogOn(); drop("pt_null")
    spark.sql("CREATE TABLE graft.pt_null (k INT, v BIGINT) PARTITIONED BY (k)")
    spark.sql("INSERT INTO graft.pt_null VALUES (1, 10), (CAST(NULL AS INT), 99), (2, 20)")
    val all = spark.sql("SELECT v FROM graft.pt_null").collect().map(_.getLong(0)).sorted
    assert(all.toSeq === Seq(10L, 20L, 99L))
    assert(spark.sql("SELECT v FROM graft.pt_null WHERE k IS NULL")
      .collect().map(_.getLong(0)).toSeq === Seq(99L))
    // the null-keyed rows landed in their own partition batch
    assert(liveBatches("pt_null").exists(_.part == Seq(null)))
    drop("pt_null")
  }

  test("DML and distributed rewrite preserve partition purity; snapshots replay") {
    catalogOn(); drop("pt_dml")
    spark.sql("CREATE TABLE graft.pt_dml (k INT, v BIGINT) PARTITIONED BY (k)")
    spark.sql("INSERT INTO graft.pt_dml VALUES (1, 10), (2, 20), (3, 30), (1, 11)") // v1
    spark.sql("UPDATE graft.pt_dml SET v = v + 100 WHERE k = 1") // v2: CoW rewrite
    spark.sql("DELETE FROM graft.pt_dml WHERE k = 3") // v3
    val rows = spark.sql("SELECT k, v FROM graft.pt_dml ORDER BY k, v")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(rows === Seq((1, 110L), (1, 111L), (2, 20L)))
    // time travel before the DML replays the original partitions
    val v1 = spark.sql("SELECT k, v FROM graft.pt_dml VERSION AS OF 1 ORDER BY k, v")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(v1 === Seq((1, 10L), (1, 11L), (2, 20L), (3, 30L)))
    val spec = MemTables.get("pt_dml").get.partitioning
    liveBatches("pt_dml").foreach { b =>
      b.rows.foreach(r => assert(MemTables.partTupleOf(spec, b.schema, r) === b.part))
    }
    // distributed rewrite keeps the layout
    spark.sql("CALL graft.rewrite_data_files('pt_dml', 'k')")
    assert(spark.sql("SELECT k, v FROM graft.pt_dml ORDER BY k, v")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq === rows)
    liveBatches("pt_dml").foreach { b =>
      b.rows.foreach(r => assert(MemTables.partTupleOf(spec, b.schema, r) === b.part))
    }
    drop("pt_dml")
  }

  test("floating -0.0 partitions and prunes as 0.0 (SQL equality)") {
    // regression: bucketOf hashed doubles via raw doubleToLongBits, which
    // distinguishes -0.0 from 0.0 while Spark SQL equality treats them as
    // EQUAL — a -0.0 row landed in a different bucket than `WHERE d = 0.0`
    // pruned to, silently dropping matching rows. canonKey now normalizes
    // floating zeros (and the stats comparator compares them equal, so
    // identity-partition singleton bounds can't wrongly preclude either).
    assert(MemTables.bucketOf(java.lang.Double.valueOf(-0.0), 8) ===
      MemTables.bucketOf(java.lang.Double.valueOf(0.0), 8))
    assert(MemTables.bucketOf(java.lang.Float.valueOf(-0.0f), 8) ===
      MemTables.bucketOf(java.lang.Float.valueOf(0.0f), 8))
    assert(MemTables.canonKey(java.lang.Double.valueOf(-0.0)) ===
      MemTables.canonKey(java.lang.Double.valueOf(0.0)))

    catalogOn(); drop("pt_fzero", "pt_fzero_id")
    import spark.implicits._
    spark.sql("CREATE TABLE graft.pt_fzero (k BIGINT, d DOUBLE) " +
      "PARTITIONED BY (bucket(4, d))")
    Seq((1L, -0.0), (2L, 0.0), (3L, 1.5)).toDF("k", "d").coalesce(1)
      .writeTo("graft.pt_fzero").append()
    assert(spark.sql("SELECT k FROM graft.pt_fzero WHERE d = 0.0")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))

    spark.sql("CREATE TABLE graft.pt_fzero_id (k BIGINT, d DOUBLE) " +
      "PARTITIONED BY (d)")
    Seq((1L, -0.0), (2L, 0.0)).toDF("k", "d").coalesce(1)
      .writeTo("graft.pt_fzero_id").append()
    // one SQL value = ONE partition tuple (two would split a key across
    // groups in storage-partitioned planning)
    assert(liveBatches("pt_fzero_id").map(_.part).distinct.size === 1)
    assert(spark.sql("SELECT k FROM graft.pt_fzero_id WHERE d = 0.0")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    drop("pt_fzero", "pt_fzero_id")
  }

  test("bucket function is SQL-callable and matches the layout hash") {
    catalogOn()
    val got = spark.sql("SELECT graft.bucket(8, CAST(42 AS BIGINT)) AS b").head().getInt(0)
    assert(got === MemTables.bucketOf(java.lang.Long.valueOf(42L), 8))
    val s = spark.sql("SELECT graft.bucket(8, 'abc') AS b").head().getInt(0)
    assert(s === MemTables.bucketOf("abc", 8))
    assert(s >= 0 && s < 8)
  }
}
