package graft.sources

import graft.SparkSpec

/** `MERGE INTO ... WITH SCHEMA EVOLUTION` — Spark resolves the source's
  * extra columns by ALTERing the target before planning the row-level
  * operation, so the connector's AddColumn evolution surface carries it.
  */
class MergeEvolutionSpec extends SparkSpec {

  test("MERGE WITH SCHEMA EVOLUTION adds source columns and merges") {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")
    val tbl = "graft.merge_evo"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v BIGINT)")
    import spark.implicits._
    Seq((1L, 10L), (2L, 20L)).toDF("k", "v").coalesce(1).writeTo(tbl).append()
    Seq((2L, 21L, "b"), (3L, 30L, "c")).toDF("k", "v", "note")
      .createOrReplaceTempView("merge_evo_src")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $tbl t
         |USING merge_evo_src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = spark.table(tbl).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2)))
      .sortBy(_._1).toSeq
    assert(got === Seq((1L, 10L, null), (2L, 21L, "b"), (3L, 30L, "c")))

    // the evolution is an ordinary ALTER in the ledger (own version slot,
    // 'alter' kind) followed by the merge's rewrite — full provenance
    val kinds = spark.sql(s"CALL graft.table_history('merge_evo')")
      .collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(kinds.take(3) === Seq((0L, "create"), (1L, "append"), (2L, "alter")))
    // time travel BEFORE the evolution binds the old two-column schema
    val before = spark.sql(s"SELECT * FROM $tbl VERSION AS OF 1")
    assert(before.schema.fieldNames.toSeq === Seq("k", "v"))
    assert(before.collect().map(_.getLong(1)).sorted.toSeq === Seq(10L, 20L))
    spark.sql(s"DROP TABLE $tbl")
  }

  test("MERGE without the clause never evolves: extra source columns are ignored") {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")
    val tbl = "graft.merge_noevo"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v BIGINT)")
    import spark.implicits._
    Seq((1L, 10L)).toDF("k", "v").coalesce(1).writeTo(tbl).append()
    Seq((1L, 11L, "x")).toDF("k", "v", "note")
      .createOrReplaceTempView("merge_noevo_src")
    // the star expands to the TARGET's columns: the merge applies, the
    // source's extra column is dropped, the schema is untouched
    spark.sql(
      s"""MERGE INTO $tbl t USING merge_noevo_src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.table(tbl).schema.fieldNames.toSeq === Seq("k", "v"))
    assert(spark.table(tbl).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 11L)))
    spark.sql(s"DROP TABLE $tbl")
  }
}
