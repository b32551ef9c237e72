package graft.sources

import graft.SparkSpec

/** Reported sort order ([[MemScan.outputOrdering]]): a sorted
  * `rewrite_data_files` establishes a per-partition ordering claim that
  * downstream merge joins consume — and every mutation that could break
  * it retires it.
  */
class SortOrderSpec extends SparkSpec {

  private def catalogOn(): Unit = {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
  }

  private def ordering(key: String): Seq[String] = {
    val st = MemTables.get(key).get
    new MemScan(key, st.schema, None, None, None, Array.empty, None)
      .outputOrdering().map(_.expression.describe).toSeq
  }

  test("co-partitioned co-sorted tables merge-join with zero exchanges and zero sorts") {
    catalogOn()
    Seq("so_a", "so_b").foreach(t => spark.sql(s"DROP TABLE IF EXISTS graft.$t"))
    spark.sql("CREATE TABLE graft.so_a (k INT, v BIGINT) PARTITIONED BY (k)")
    spark.sql("CREATE TABLE graft.so_b (k INT, w BIGINT) PARTITIONED BY (k)")
    spark.sql("INSERT INTO graft.so_a SELECT CAST(id % 5 AS INT), id FROM range(0, 50)")
    spark.sql("INSERT INTO graft.so_b SELECT CAST(id % 5 AS INT), id * 10 FROM range(0, 20)")
    def joinPlan(): String = {
      val j = spark.sql(
        """SELECT /*+ MERGE(a) */ a.k, a.v, b.w
          |FROM graft.so_a a JOIN graft.so_b b ON a.k = b.k""".stripMargin)
      assert(j.count() === 200) // 10 × 4 matches per key × 5 keys
      j.queryExecution.executedPlan.toString
    }
    // unsorted layout: the storage-partitioned join already needs no
    // exchange, but each side pays a per-partition sort
    val before = joinPlan()
    assert(before.contains("SortMergeJoin") && !before.contains("Exchange"), before)
    assert(before.contains(" Sort ["), before)
    // sorted rewrite on both sides: the scans now REPORT the ordering and
    // the merge join consumes it directly — zero exchanges, zero sorts
    spark.sql("CALL graft.rewrite_data_files('so_a', 'k')")
    spark.sql("CALL graft.rewrite_data_files('so_b', 'k')")
    assert(ordering("so_a") === Seq("k"))
    val after = joinPlan()
    assert(after.contains("SortMergeJoin") && !after.contains("Exchange"), after)
    assert(!after.contains(" Sort ["),
      s"reported ordering must eliminate the join's sorts:\n$after")
    Seq("so_a", "so_b").foreach(t => spark.sql(s"DROP TABLE graft.$t"))
  }

  test("the ordering claim retires on appends, snapshots before it, and renames; survives kill-only deletes") {
    catalogOn()
    spark.sql("DROP TABLE IF EXISTS graft.so_c")
    spark.sql("CREATE TABLE graft.so_c (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.delete-mode'='merge-on-read')")
    spark.sql("INSERT INTO graft.so_c SELECT id * 7 % 50, id FROM range(0, 50)") // v1
    assert(ordering("so_c").isEmpty) // no claim before a sorted rewrite
    spark.sql("CALL graft.rewrite_data_files('so_c', 'k')") // v2
    assert(ordering("so_c") === Seq("k"))
    val sortedSince = MemTables.get("so_c").get.sortedSince
    // snapshot BEFORE the rewrite: unsorted layout, no claim
    val st = MemTables.get("so_c").get
    assert(new MemScan("so_c", st.schema, Some(sortedSince - 1), None, None,
      Array.empty, None).outputOrdering().isEmpty)
    // kill-only delete (DV): relative order is untouched, claim survives
    spark.sql("DELETE FROM graft.so_c WHERE v < 5") // v3
    assert(ordering("so_c") === Seq("k"))
    // rename of the sorted column retires the claim (it names current cols)
    spark.sql("ALTER TABLE graft.so_c RENAME COLUMN k TO kk") // v4
    assert(ordering("so_c").isEmpty)
    // a fresh sorted rewrite under the new name re-establishes it
    spark.sql("CALL graft.rewrite_data_files('so_c', 'kk')") // v5
    assert(ordering("so_c") === Seq("kk"))
    // an append adds an unsorted batch: claim gone
    spark.sql("INSERT INTO graft.so_c VALUES (999, 999)") // v6
    assert(ordering("so_c").isEmpty)
    spark.sql("DROP TABLE graft.so_c")
  }

  test("rows actually arrive sorted under the claim (merge-join correctness end to end)") {
    catalogOn()
    spark.sql("DROP TABLE IF EXISTS graft.so_d")
    spark.sql("DROP TABLE IF EXISTS graft.so_e")
    spark.sql("CREATE TABLE graft.so_d (k INT, v BIGINT) PARTITIONED BY (k)")
    spark.sql("CREATE TABLE graft.so_e (k INT, w BIGINT) PARTITIONED BY (k)")
    // interleaved inserts so the pre-rewrite layout is genuinely unsorted
    spark.sql("INSERT INTO graft.so_d SELECT CAST(id % 3 AS INT), (id * 13) % 97 FROM range(0, 60)")
    spark.sql("INSERT INTO graft.so_d SELECT CAST(id % 3 AS INT), (id * 7) % 89 FROM range(0, 30)")
    spark.sql("INSERT INTO graft.so_e SELECT CAST(id % 3 AS INT), id FROM range(0, 9)")
    spark.sql("CALL graft.rewrite_data_files('so_d', 'k,v')")
    spark.sql("CALL graft.rewrite_data_files('so_e', 'k')")
    assert(ordering("so_d") === Seq("k", "v"))
    val j = spark.sql(
      """SELECT /*+ MERGE(a) */ a.k, a.v, b.w
        |FROM graft.so_d a JOIN graft.so_e b ON a.k = b.k""".stripMargin)
    // oracle-free cross-check: the merge join's result must equal the
    // hash join's over the same data
    val viaMerge = j.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted
    val viaHash = spark.sql(
      """SELECT /*+ SHUFFLE_HASH(a) */ a.k, a.v, b.w
        |FROM graft.so_d a JOIN graft.so_e b ON a.k = b.k""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted
    assert(viaMerge.toSeq === viaHash.toSeq)
    assert(!j.queryExecution.executedPlan.toString.contains(" Sort ["))
    spark.sql("DROP TABLE graft.so_d")
    spark.sql("DROP TABLE graft.so_e")
  }

  test("declared sort order: the claim survives verified-sorted appends") {
    catalogOn()
    spark.sql("DROP TABLE IF EXISTS graft.so_decl")
    spark.sql("CREATE TABLE graft.so_decl (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.sort-order'='k')")
    // unsorted input: the write REQUESTS the ordering, Spark sorts each
    // task, the publish verifies — the claim holds from the first append
    spark.sql("INSERT INTO graft.so_decl SELECT id * 7 % 50, id FROM range(0, 50)")
    assert(ordering("so_decl") === Seq("k"))
    spark.sql("INSERT INTO graft.so_decl SELECT id * 3 % 40, id FROM range(0, 40)")
    assert(ordering("so_decl") === Seq("k"), "appends must keep the declared claim")
    val st = MemTables.get("so_decl").get
    assert(st.batches.filter(_.removedAt == Long.MaxValue)
      .forall(b => MemTables.batchSorted(b.schema, b.rows, Seq("k"))))
    // the claim feeds the read side: ORDER BY + LIMIT trims at planning
    val q = spark.sql("SELECT k FROM graft.so_decl ORDER BY k LIMIT 3")
    // both inserts are permutations (7⊥50, 3⊥40): exactly one 0 each
    assert(q.collect().map(_.getLong(0)).toSeq === Seq(0L, 0L, 1L))
    assert(q.queryExecution.executedPlan.toString.contains("topN=3(k)"))

    // a row-level mutation retires the claim; a later append cannot
    // revive it (an unsorted replacement batch may live on)...
    spark.sql("UPDATE graft.so_decl SET v = v + 1 WHERE k = 7")
    assert(ordering("so_decl").isEmpty)
    spark.sql("INSERT INTO graft.so_decl SELECT id, id FROM range(0, 5)")
    assert(ordering("so_decl").isEmpty, "append must not revive a retired claim")
    // ...but an INSERT OVERWRITE replaces every batch: claim re-establishes
    spark.sql("INSERT OVERWRITE graft.so_decl SELECT id * 11 % 30, id FROM range(0, 30)")
    assert(ordering("so_decl") === Seq("k"))

    // an UNVERIFIED publish (direct commit, bypassing the requested write
    // ordering — the degraded-distribution stand-in) clears the claim
    // rather than trusting the declaration
    import org.apache.spark.sql.catalyst.InternalRow
    MemTables.commit("so_decl", truncate = false, st.schema,
      Seq(MemTables.RowsPayload(Array(InternalRow(9L, 1L), InternalRow(2L, 2L)))))
    assert(ordering("so_decl").isEmpty, "unsorted rows must clear the claim")
    spark.sql("DROP TABLE graft.so_decl")
  }

  test("declared sort order: create-time validation and evolution guard") {
    catalogOn()
    spark.sql("DROP TABLE IF EXISTS graft.so_guard")
    intercept[Exception](spark.sql(
      "CREATE TABLE graft.so_guard (k BIGINT) TBLPROPERTIES ('graft.sort-order'='nope')"))
    spark.sql("CREATE TABLE graft.so_guard (k INT, v BIGINT) " +
      "TBLPROPERTIES ('graft.sort-order'='k')")
    // dropping or renaming the declared column would fail all future
    // writes at analysis: rejected like a partition column
    intercept[Exception](
      spark.sql("ALTER TABLE graft.so_guard DROP COLUMN k"))
    intercept[Exception](
      spark.sql("ALTER TABLE graft.so_guard RENAME COLUMN k TO kk"))
    // widening the sort column is order-preserving and allowed: the claim
    // (and writes) survive the promotion
    spark.sql("INSERT INTO graft.so_guard SELECT CAST(id * 5 % 9 AS INT), id FROM range(0, 9)")
    spark.sql("ALTER TABLE graft.so_guard ALTER COLUMN k TYPE BIGINT")
    spark.sql("INSERT INTO graft.so_guard SELECT id * 3 % 7, id FROM range(0, 7)")
    assert(ordering("so_guard") === Seq("k"))
    spark.sql("DROP TABLE graft.so_guard")
  }

  test("declared sort order on the FILE plane: task verdicts, zero driver reads") {
    catalogOn()
    spark.sql("DROP TABLE IF EXISTS graft.so_file")
    spark.sql("CREATE TABLE graft.so_file (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.storage'='parquet', 'graft.sort-order'='k')")
    val before = ParquetRows.readCalls.get()
    spark.sql("INSERT INTO graft.so_file SELECT id * 7 % 50, id FROM range(0, 50)")
    spark.sql("INSERT INTO graft.so_file SELECT id * 3 % 40, id FROM range(0, 40)")
    assert(ordering("so_file") === Seq("k"),
      "the task-side sortedness verdict must keep the claim on the file plane")
    assert(ParquetRows.readCalls.get() === before,
      "claim maintenance must never read just-written files back through the driver")
    // the claim feeds the read side on the file plane too
    val q = spark.sql("SELECT k FROM graft.so_file ORDER BY k LIMIT 3")
    assert(q.collect().map(_.getLong(0)).toSeq === Seq(0L, 0L, 1L))
    // an unsorted DIRECT commit (driver-materialized file) clears the
    // claim — that path computes its verdict where ITS rows are too
    import org.apache.spark.sql.catalyst.InternalRow
    val st = MemTables.get("so_file").get
    MemTables.commit("so_file", truncate = false, st.schema,
      Seq(MemTables.RowsPayload(Array(InternalRow(9L, 1L), InternalRow(2L, 2L)))))
    assert(ordering("so_file").isEmpty, "unsorted rows must clear the claim")
    spark.sql("DROP TABLE graft.so_file")
  }
}
