package graft.sources

import graft.SparkSpec

/** BRANCH-SCOPED DML ([[MemTables.stageDeltaToBranch]] /
  * [[MemBranchDeltaOperation]]): DELETE/UPDATE/MERGE against
  * `<table>.branch_<name>` stage row kills + post-images on the branch,
  * main stays byte-identical until `fast_forward` republishes them
  * atomically, and a dropped (audit-failed) branch leaves no trace —
  * the full write-audit-publish loop on mutations.
  */
class BranchDmlSpec extends SparkSpec {

  private def catalogOn(): Unit =
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")

  private def drop(names: String*): Unit =
    names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS graft.$n"))

  private def mainRows(tbl: String) =
    spark.table(tbl).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

  test("branch UPDATE/DELETE invisible to main; fast-forward publishes atomically") {
    catalogOn(); drop("bd_t")
    spark.sql("CREATE TABLE graft.bd_t (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.delete-mode'='merge-on-read')")
    spark.sql("INSERT INTO graft.bd_t SELECT id, id * 10 FROM range(0, 10)") // v1
    val before = mainRows("graft.bd_t")
    spark.sql("CALL graft.create_branch('bd_t', 'audit', 1)")

    // mutations against the branch: an UPDATE (delta: kill + post-image),
    // a DELETE, and a MERGE insert
    spark.sql("UPDATE graft.bd_t.branch_audit SET v = -1 WHERE k = 3")
    spark.sql("DELETE FROM graft.bd_t.branch_audit WHERE k >= 8")
    spark.sql("INSERT INTO graft.bd_t.branch_audit VALUES (100, 1000)")

    // the branch view carries all three; main is byte-identical
    val branchRows = spark.sql(
      "SELECT k, v FROM graft.bd_t.branch_audit").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(branchRows === Seq(
      0L -> 0L, 1L -> 10L, 2L -> 20L, 3L -> -1L, 4L -> 40L,
      5L -> 50L, 6L -> 60L, 7L -> 70L, 100L -> 1000L))
    assert(mainRows("graft.bd_t") === before)
    assert(MemTables.get("bd_t").get.version === 1L, "main must not mint versions")

    // fast-forward publishes everything atomically (appends then one
    // DV-delete commit); the published view equals the branch view
    spark.sql("CALL graft.fast_forward('bd_t', 'audit')")
    assert(mainRows("graft.bd_t") === branchRows)
    // the kills landed as a real delete version: CDC shows row-level
    // delete events there, and pre-publish snapshots replay intact
    val st = MemTables.get("bd_t").get
    val delV = st.version
    assert(st.opKinds(delV) === "delete")
    assert(spark.sql(s"SELECT count(*) FROM graft.bd_t VERSION AS OF 1")
      .head().getLong(0) === 10L)
    val ev = spark.read.format("graft.sources.MemChangesSource")
      .option("table", "bd_t").option("from", (delV - 1).toString)
      .option("to", delV.toString).load()
      .where("_change_type = 'delete'").collect()
    assert(ev.map(_.getLong(0)).sorted.toSeq === Seq(3L, 8L, 9L))
    drop("bd_t")
  }

  test("audit-failed branch drops without a trace (WAP on mutations)") {
    catalogOn(); drop("bd_wap")
    spark.sql("CREATE TABLE graft.bd_wap (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.delete-mode'='merge-on-read')")
    spark.sql("INSERT INTO graft.bd_wap SELECT id, id FROM range(0, 6)") // v1
    val before = mainRows("graft.bd_wap")
    val versionBefore = MemTables.get("bd_wap").get.version
    spark.sql("CALL graft.create_branch('bd_wap', 'cand', 1)")
    // the candidate mutation: zero out everything (fails the audit below)
    spark.sql("UPDATE graft.bd_wap.branch_cand SET v = 0 WHERE k < 6")
    // audit: the branch view must keep sum(v) > 0 — it fails
    val audited = spark.sql(
      "SELECT sum(v) FROM graft.bd_wap.branch_cand").head().getLong(0)
    assert(audited === 0L)
    spark.sql("CALL graft.drop_branch('bd_wap', 'cand')")
    // main: byte-identical, no versions minted, no refs left
    assert(mainRows("graft.bd_wap") === before)
    assert(MemTables.get("bd_wap").get.version === versionBefore)
    assert(MemTables.get("bd_wap").get.branches.isEmpty)
    drop("bd_wap")
  }

  test("branch UPDATE of a branch-staged row; double-kill rejected") {
    catalogOn(); drop("bd_staged")
    spark.sql("CREATE TABLE graft.bd_staged (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.delete-mode'='merge-on-read')")
    spark.sql("INSERT INTO graft.bd_staged VALUES (1, 10)") // v1
    spark.sql("CALL graft.create_branch('bd_staged', 'b', 1)")
    spark.sql("INSERT INTO graft.bd_staged.branch_b VALUES (2, 20)") // staged
    // update the STAGED row (its id was minted at staging)
    spark.sql("UPDATE graft.bd_staged.branch_b SET v = 21 WHERE k = 2")
    assert(spark.sql("SELECT v FROM graft.bd_staged.branch_b WHERE k = 2")
      .head().getLong(0) === 21L)
    // deleting the already-killed pre-image again is rejected loudly
    val bs = MemTables.get("bd_staged").get.branches("b")
    val (bid, poss) = bs.dvs.head
    val err = intercept[IllegalStateException] {
      MemTables.stageDeltaToBranch("bd_staged", "b",
        MemTables.get("bd_staged").get.schema, Seq((bid, poss.head)), Seq.empty)
    }
    assert(err.getMessage.contains("already-deleted"))
    spark.sql("CALL graft.fast_forward('bd_staged', 'b')")
    assert(mainRows("graft.bd_staged") === Seq(1L -> 10L, 2L -> 21L))
    drop("bd_staged")
  }

  test("branch DML on a copy-on-write table is rejected loudly") {
    catalogOn(); drop("bd_cow")
    spark.sql("CREATE TABLE graft.bd_cow (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft.bd_cow VALUES (1, 10)")
    spark.sql("CALL graft.create_branch('bd_cow', 'b', 1)")
    val e = intercept[Exception](
      spark.sql("DELETE FROM graft.bd_cow.branch_b WHERE k = 1"))
    assert(e.getMessage.contains("merge-on-read"), e.getMessage)
    spark.sql("CALL graft.drop_branch('bd_cow', 'b')")
    drop("bd_cow")
  }
}
