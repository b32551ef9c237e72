package graft.sources

import graft.SparkSpec

/** `ALTER TABLE ... ADD COLUMN ... DEFAULT` + declared NOT NULL
  * ([[MemTables.defaultFor]] / the catalog's
  * `SUPPORT_COLUMN_DEFAULT_VALUE`): pre-alter rows read the EXISTS
  * default instead of NULL (scans, DELETE evaluation, data skipping),
  * future INSERTs fill the CURRENT default analyzer-side, time travel
  * keeps the old schema, and NOT NULL writes reject at publish.
  */
class ColumnDefaultSpec extends SparkSpec {

  private def catalogOn(): Unit =
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")

  private def drop(names: String*): Unit =
    names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS graft.$n"))

  test("ADD COLUMN DEFAULT: pre-alter rows read the default, not NULL") {
    catalogOn(); drop("cd_base")
    spark.sql("CREATE TABLE graft.cd_base (k BIGINT)")
    spark.sql("INSERT INTO graft.cd_base SELECT id FROM range(0, 5)") // v1
    spark.sql("ALTER TABLE graft.cd_base ADD COLUMN tag STRING DEFAULT 'legacy'") // v2
    spark.sql("INSERT INTO graft.cd_base VALUES (100, 'fresh')") // v3
    // an INSERT omitting the column fills the CURRENT default analyzer-side
    spark.sql("INSERT INTO graft.cd_base (k) VALUES (200)") // v4

    val rows = spark.sql("SELECT k, tag FROM graft.cd_base ORDER BY k").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq(0L -> "legacy", 1L -> "legacy", 2L -> "legacy", 3L -> "legacy",
        4L -> "legacy", 100L -> "fresh", 200L -> "legacy"))
    // nothing was rewritten: the v1 batch still predates the column
    val v1 = MemTables.get("cd_base").get.batches.filter(_.version == 1L)
    assert(v1.nonEmpty && v1.forall(b => !b.schema.fieldNames.contains("tag")))
    // time travel BEFORE the alter shows the old schema (no tag at all)
    val old = spark.sql("SELECT * FROM graft.cd_base VERSION AS OF 1")
    assert(old.schema.fieldNames.toSeq === Seq("k"))
    assert(old.count() === 5L)
    drop("cd_base")
  }

  test("defaults flow through filters, DELETE evaluation, and skipping") {
    catalogOn(); drop("cd_del")
    spark.sql("CREATE TABLE graft.cd_del (k BIGINT) " +
      "TBLPROPERTIES ('graft.delete-mode'='merge-on-read')")
    spark.sql("INSERT INTO graft.cd_del SELECT id FROM range(0, 10)") // v1
    spark.sql("ALTER TABLE graft.cd_del ADD COLUMN g BIGINT DEFAULT 7") // v2
    spark.sql("INSERT INTO graft.cd_del VALUES (100, 1)") // v3
    // a filter on the default value must MATCH pre-alter rows (treating
    // them all-null would both mis-prune and mis-evaluate)
    assert(spark.sql("SELECT count(*) FROM graft.cd_del WHERE g = 7")
      .head().getLong(0) === 10L)
    assert(spark.sql("SELECT count(*) FROM graft.cd_del WHERE g IS NULL")
      .head().getLong(0) === 0L)
    // DELETE WHERE g = <default> kills exactly the pre-alter rows
    spark.sql("DELETE FROM graft.cd_del WHERE g = 7")
    assert(spark.table("graft.cd_del").collect().map(_.getLong(0)).toSeq === Seq(100L))
    drop("cd_del")
  }

  test("defaults survive the file-backed plane and aggregate honesty") {
    catalogOn(); drop("cd_pq")
    spark.sql("CREATE TABLE graft.cd_pq (k BIGINT) " +
      "TBLPROPERTIES ('graft.storage'='parquet')")
    spark.sql("INSERT INTO graft.cd_pq SELECT id FROM range(0, 6)")
    spark.sql("ALTER TABLE graft.cd_pq ADD COLUMN b BIGINT DEFAULT 42")
    spark.sql("INSERT INTO graft.cd_pq VALUES (9, 1)")
    assert(spark.sql("SELECT sum(b) FROM graft.cd_pq").head().getLong(0) ===
      6L * 42 + 1)
    // min/max over a defaulted column: answered correctly (either from a
    // declined pushdown's row scan or an exact fold) — the value is the law
    val r = spark.sql("SELECT min(b) AS mn, max(b) AS mx FROM graft.cd_pq").head()
    assert((r.getLong(0), r.getLong(1)) === ((1L, 42L)))
    drop("cd_pq")
  }

  test("NOT NULL: rejected without default; publish rejects NULL rows") {
    catalogOn(); drop("cd_nn")
    spark.sql("CREATE TABLE graft.cd_nn (k BIGINT, s STRING NOT NULL)")
    spark.sql("INSERT INTO graft.cd_nn VALUES (1, 'x')")
    // a NULL into the NOT NULL column fails (Spark's ANSI assertion or the
    // publish-side backstop — either way loudly, never silently stored)
    val e = intercept[Exception](
      spark.sql("INSERT INTO graft.cd_nn VALUES (2, CAST(NULL AS STRING))"))
    assert(e.getMessage != null)
    assert(spark.table("graft.cd_nn").count() === 1L)
    // direct publish path: the backstop rejects
    val schema = MemTables.get("cd_nn").get.schema
    val bad = intercept[IllegalArgumentException] {
      MemTables.commit("cd_nn", truncate = false, schema,
        Seq(MemTables.RowsPayload(Array(
          org.apache.spark.sql.catalyst.InternalRow(5L, null)))))
    }
    assert(bad.getMessage.contains("NOT NULL"), bad.getMessage)
    // ADD COLUMN NOT NULL without a default is rejected (pre-alter rows
    // would read NULL); with a default it lands
    val nn = intercept[Exception](
      spark.sql("ALTER TABLE graft.cd_nn ADD COLUMN c BIGINT NOT NULL"))
    assert(nn.getMessage.toLowerCase.contains("default"), nn.getMessage)
    spark.sql("ALTER TABLE graft.cd_nn ADD COLUMN c BIGINT NOT NULL DEFAULT 3")
    assert(spark.sql("SELECT c FROM graft.cd_nn").head().getLong(0) === 3L)
    drop("cd_nn")
  }

  test("RENAME carries a column's default to the new name") {
    catalogOn(); drop("cd_rn")
    spark.sql("CREATE TABLE graft.cd_rn (k BIGINT)")
    spark.sql("INSERT INTO graft.cd_rn SELECT id FROM range(0, 4)") // v1
    spark.sql("ALTER TABLE graft.cd_rn ADD COLUMN tag STRING DEFAULT 'old'") // v2
    spark.sql("INSERT INTO graft.cd_rn VALUES (100, 'real')") // v3
    spark.sql("ALTER TABLE graft.cd_rn RENAME COLUMN tag TO label") // v4
    // pre-add rows must still read the EXISTS default under the NEW name
    // (a default stranded under 'tag' would silently turn them NULL)
    val rows = spark.sql("SELECT k, label FROM graft.cd_rn ORDER BY k").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq(0L -> "old", 1L -> "old", 2L -> "old", 3L -> "old", 100L -> "real"))
    assert(spark.sql("SELECT count(*) FROM graft.cd_rn WHERE label = 'old'")
      .head().getLong(0) === 4L)
    assert(spark.sql("SELECT count(*) FROM graft.cd_rn WHERE label IS NULL")
      .head().getLong(0) === 0L)
    drop("cd_rn")
  }

  test("branch stage of a parquet-mode payload enforces NOT NULL") {
    catalogOn(); drop("cd_bnn")
    spark.sql("CREATE TABLE graft.cd_bnn (k BIGINT, s STRING NOT NULL) " +
      "TBLPROPERTIES ('graft.storage'='parquet')")
    spark.sql("INSERT INTO graft.cd_bnn VALUES (1, 'x')")
    spark.sql("CALL graft.create_branch('cd_bnn', 'audit', 1)")
    val st = MemTables.get("cd_bnn").get
    // a FilesPayload whose stats carry NULLs in the NOT NULL column must
    // reject at STAGE — not fast-forward onto main unchecked
    val e = intercept[IllegalArgumentException] {
      MemTables.commitToBranch("cd_bnn", "audit", st.schema,
        Seq(MemTables.FilesPayload(Vector(FileManifest(
          "/nonexistent/never-read.parquet", 2, Nil, 0,
          Map("k" -> MemTables.ColStats(1L, 2L, 0L, 2L),
            "s" -> MemTables.ColStats(null, null, 1L, 2L)))))))
    }
    assert(e.getMessage.contains("NOT NULL"), e.getMessage)
    spark.sql("CALL graft.drop_branch('cd_bnn', 'audit')")
    drop("cd_bnn")
  }

  test("re-added column never inherits a stale default") {
    catalogOn(); drop("cd_reuse")
    spark.sql("CREATE TABLE graft.cd_reuse (k BIGINT)")
    spark.sql("INSERT INTO graft.cd_reuse VALUES (1)") // v1
    spark.sql("ALTER TABLE graft.cd_reuse ADD COLUMN t BIGINT DEFAULT 5") // v2
    assert(spark.sql("SELECT t FROM graft.cd_reuse").head().getLong(0) === 5L)
    spark.sql("ALTER TABLE graft.cd_reuse DROP COLUMN t") // v3
    spark.sql("ALTER TABLE graft.cd_reuse ADD COLUMN t BIGINT") // v4: clean slate
    assert(spark.sql("SELECT t FROM graft.cd_reuse").head().isNullAt(0))
    drop("cd_reuse")
  }
}
