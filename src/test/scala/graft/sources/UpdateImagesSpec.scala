package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Change-feed UPDATE pre/post-images (`option("updateImages", "true")`
  * on [[MemChangesSource]] — the Delta-CDF `update_preimage` /
  * `update_postimage` shape): the delta DML path records the pre→post
  * linkage, and the feed surfaces image pairs instead of delete+insert;
  * the default stays the delete+insert log, so existing consumers see
  * byte-identical feeds.
  */
class UpdateImagesSpec extends SparkSpec {

  private def feed(key: String, from: Long, to: Long, images: Boolean) =
    spark.read.format("graft.sources.MemChangesSource")
      .option("table", key).option("from", from.toString).option("to", to.toString)
      .option("updateImages", images.toString).load()
      .collect()
      .map(r => (r.getString(2), r.getLong(0), r.getLong(1), r.getLong(3)))
      .sorted.toSeq // (_change_type, k, v, _commit_version)

  test("delta UPDATE surfaces as pre/post image pairs; default feed unchanged") {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")
    val tbl = "graft.img_upd"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v BIGINT)" +
      " TBLPROPERTIES ('graft.delete-mode'='merge-on-read')")
    import spark.implicits._
    Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v").coalesce(1)
      .writeTo(tbl).append() // v1
    spark.sql(s"UPDATE $tbl SET v = v + 1 WHERE k >= 2") // v2: delta path

    assert(feed("img_upd", 1L, 2L, images = true) === Seq(
      ("update_postimage", 2L, 21L, 2L), ("update_postimage", 3L, 31L, 2L),
      ("update_preimage", 2L, 20L, 2L), ("update_preimage", 3L, 30L, 2L)))
    // default: the same rows as delete+insert — existing consumers intact
    assert(feed("img_upd", 1L, 2L, images = false) === Seq(
      ("delete", 2L, 20L, 2L), ("delete", 3L, 30L, 2L),
      ("insert", 2L, 21L, 2L), ("insert", 3L, 31L, 2L)))
    // the table itself reads identically either way
    assert(spark.table(tbl).collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 10L), (2L, 21L), (3L, 31L)))
    spark.sql(s"DROP TABLE $tbl")
  }

  test("mixed MERGE: images for updates, plain events for inserts and deletes") {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")
    val tbl = "graft.img_merge"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v BIGINT)" +
      " TBLPROPERTIES ('graft.delete-mode'='merge-on-read')")
    import spark.implicits._
    Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v").coalesce(1)
      .writeTo(tbl).append() // v1
    Seq((1L, 11L), (3L, 0L), (4L, 40L)).toDF("k", "v")
      .createOrReplaceTempView("img_merge_src")
    spark.sql(
      s"""MERGE INTO $tbl t USING img_merge_src s ON t.k = s.k
         |WHEN MATCHED AND s.v = 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin) // v2
    assert(feed("img_merge", 1L, 2L, images = true) === Seq(
      ("delete", 3L, 30L, 2L), // merge-DELETE stays a plain delete
      ("insert", 4L, 40L, 2L), // not-matched INSERT stays a plain insert
      ("update_postimage", 1L, 11L, 2L),
      ("update_preimage", 1L, 10L, 2L)))
    spark.sql(s"DROP TABLE $tbl")
  }

  test("copy-on-write UPDATE has no row linkage: images mode keeps the group log") {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")
    val tbl = "graft.img_cow"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v BIGINT)") // copy-on-write
    import spark.implicits._
    Seq((1L, 10L), (2L, 20L)).toDF("k", "v").coalesce(1).writeTo(tbl).append()
    spark.sql(s"UPDATE $tbl SET v = 99 WHERE k = 2") // group rewrite
    val types = feed("img_cow", 1L, 2L, images = true).map(_._1).distinct.sorted
    // a whole-group rewrite has no per-row pairing to report: the feed
    // stays the batch remove + reinsert log in either mode
    assert(types === Seq("delete", "insert"))
    spark.sql(s"DROP TABLE $tbl")
  }
}
