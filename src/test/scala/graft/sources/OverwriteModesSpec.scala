package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Filtered and dynamic OVERWRITE on the mem table (`OVERWRITE_BY_FILTER`
  * / `OVERWRITE_DYNAMIC` — Delta `replaceWhere` and hive dynamic-mode
  * semantics at the connector): one atomic version kills exactly the
  * addressed slice and appends the replacement; everything else survives
  * BY REFERENCE.
  */
class OverwriteModesSpec extends SparkSpec {

  private def catalogOn(): Unit =
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")

  test("replaceWhere: one version replaces the condition's slice; rest by reference") {
    catalogOn()
    val tbl = "graft.ow_filter"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, nk BIGINT) PARTITIONED BY (nk)")
    import spark.implicits._
    (0L until 30L).map(k => (k, k % 3)).toDF("k", "nk").coalesce(1)
      .writeTo(tbl).append() // v1: nk 0,1,2 — one batch each
    val st = MemTables.get("ow_filter").get
    val untouched = st.batches.filter(b =>
      b.removedAt == Long.MaxValue && b.part != Seq(1L))
    assert(untouched.size === 2)

    // DataFrame replaceWhere: nk=1 slice replaced, one version
    Seq((100L, 1L), (101L, 1L)).toDF("k", "nk").coalesce(1)
      .writeTo(tbl).overwrite(col("nk") === 1L) // v2
    assert(st.version === 2L)
    assert(st.opKinds(2L) === "overwrite")
    val got = spark.table(tbl).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val kept = (0L until 30L).filter(_ % 3 != 1).map(k => (k, k % 3)).toSet
    assert(got === kept ++ Set((100L, 1L), (101L, 1L)))
    // the other partitions' batches survive BY REFERENCE (no copy-on-write
    // of unaddressed data)
    untouched.foreach { b =>
      assert(st.batches.exists(_ eq b), "unaddressed batch must survive by reference")
    }
    // time travel: the pre-overwrite snapshot is intact
    assert(spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 1")
      .head().getLong(0) === 30L)

    // SQL static-partition overwrite routes through the same filter path
    Seq((200L, 0L)).toDF("k", "nk").createOrReplaceTempView("ow_src")
    spark.sql(s"INSERT OVERWRITE $tbl PARTITION (nk = 0) SELECT k FROM ow_src") // v3
    assert(st.opKinds(3L) === "overwrite")
    val after = spark.table(tbl).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after === kept.filter(_._2 != 0L) ++ Set((100L, 1L), (101L, 1L), (200L, 0L)))
    spark.sql(s"DROP TABLE $tbl")
  }

  test("replaceWhere on merge-on-read: delete vectors, zero rows copied") {
    catalogOn()
    val tbl = "graft.ow_mor"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v BIGINT)" +
      " TBLPROPERTIES ('graft.delete-mode'='merge-on-read')")
    import spark.implicits._
    (0L until 10L).map(k => (k, k * 10)).toDF("k", "v").coalesce(1)
      .writeTo(tbl).append() // v1
    val st = MemTables.get("ow_mor").get
    val batch1 = st.batches.head
    Seq((3L, 999L), (4L, 999L)).toDF("k", "v").coalesce(1)
      .writeTo(tbl).overwrite(col("k") >= 3L && col("k") <= 4L) // v2
    // the original batch survives by reference with two DV entries —
    // no row was copied
    val b = st.batches.find(_.batchId == batch1.batchId).get
    assert(b.removedAt === Long.MaxValue)
    assert((b.rows eq batch1.rows) && b.dv.values.toSet === Set(2L))
    assert(b.dv.keySet === Set(3, 4))
    assert(spark.table(tbl).collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      ((0L until 10L).filterNot(k => k == 3 || k == 4).map(k => (k, k * 10)).toSet ++
        Set((3L, 999L), (4L, 999L))))
    spark.sql(s"DROP TABLE $tbl")
  }

  test("replaceWhere is one honest change-feed version: slice deletes + inserts") {
    catalogOn()
    val tbl = "graft.ow_cdc"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, nk BIGINT) PARTITIONED BY (nk)" +
      " TBLPROPERTIES ('graft.delete-mode'='merge-on-read')")
    import spark.implicits._
    Seq((1L, 0L), (2L, 1L), (3L, 1L)).toDF("k", "nk").coalesce(1)
      .writeTo(tbl).append() // v1
    Seq((20L, 1L)).toDF("k", "nk").coalesce(1)
      .writeTo(tbl).overwrite(col("nk") === 1L) // v2
    val events = spark.read.format("graft.sources.MemChangesSource")
      .option("table", "ow_cdc").option("from", "1").option("to", "2").load()
      .collect().map(r => (r.getString(2), r.getLong(0), r.getLong(3))).sorted.toSeq
    // exactly the slice's row-level deletes plus the replacement insert,
    // all at the overwrite's version — nk=0 emits nothing
    assert(events === Seq(("delete", 2L, 2L), ("delete", 3L, 2L), ("insert", 20L, 2L)))
    spark.sql(s"DROP TABLE $tbl")
  }

  test("TRUNCATE TABLE is one soft-delete version; history stays readable") {
    catalogOn()
    val tbl = "graft.ow_truncate"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT)")
    import spark.implicits._
    Seq(1L, 2L, 3L).toDF("k").coalesce(1).writeTo(tbl).append() // v1
    spark.sql(s"TRUNCATE TABLE $tbl") // v2
    val st = MemTables.get("ow_truncate").get
    assert(st.version === 2L && st.opKinds(2L) === "overwrite")
    assert(spark.table(tbl).count() === 0L)
    // soft delete: the pre-truncate snapshot is an exact replay
    assert(spark.sql(s"SELECT k FROM $tbl VERSION AS OF 1")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
    // the table stays writable afterwards
    Seq(9L).toDF("k").writeTo(tbl).append()
    assert(spark.table(tbl).collect().map(_.getLong(0)).toSeq === Seq(9L))
    spark.sql(s"DROP TABLE $tbl")
  }

  test("dynamic overwrite replaces exactly the partitions present in the data") {
    catalogOn()
    val tbl = "graft.ow_dyn"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, nk BIGINT) PARTITIONED BY (nk)")
    import spark.implicits._
    (0L until 30L).map(k => (k, k % 3)).toDF("k", "nk").coalesce(1)
      .writeTo(tbl).append() // v1
    val st = MemTables.get("ow_dyn").get
    val nk0 = st.batches.find(b => b.removedAt == Long.MaxValue && b.part == Seq(0L)).get
    Seq((300L, 1L), (301L, 2L)).toDF("k", "nk").coalesce(1)
      .writeTo(tbl).overwritePartitions() // v2: replaces nk 1 and 2 WHOLE
    assert(st.opKinds(2L) === "overwrite")
    val got = spark.table(tbl).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got ===
      (0L until 30L).filter(_ % 3 == 0).map(k => (k, 0L)).toSet ++
        Set((300L, 1L), (301L, 2L)))
    // the untouched partition survives by reference — the kill is
    // batch-granular (partition purity), no row was evaluated
    assert(st.batches.exists(_ eq nk0))
    // unpartitioned: dynamic degenerates to a full replace (the hive rule)
    val u = "graft.ow_dyn_unpart"
    spark.sql(s"DROP TABLE IF EXISTS $u")
    spark.sql(s"CREATE TABLE $u (k BIGINT)")
    Seq(1L, 2L).toDF("k").writeTo(u).append()
    Seq(9L).toDF("k").writeTo(u).overwritePartitions()
    assert(spark.table(u).collect().map(_.getLong(0)).toSeq === Seq(9L))
    Seq(tbl, u).foreach(t => spark.sql(s"DROP TABLE $t"))
  }
}
