package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Roundtrips.schemaDriftMerge]] — the mergeSchema read really unions the
  * two generations' schemas and null-fills only the old generation's rows.
  */
class RoundtripsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("schema_drift_merge: v1 rows null-fill the added column, v2 rows carry it") {
    val got = Roundtrips.schemaDriftMerge.fn(spark, dir).cache()
    // even suppkeys were written with the v1 schema (no n_items): every row
    // is a v1 row and the new column aggregates to NULL; odd suppkeys are
    // all v2: zero v1 rows and a real n_items total
    val bad = got.filter(
      (col("l_suppkey") % 2 === 0 &&
        (col("n_items_v2").isNotNull || col("n_rows_v1") =!= col("n_rows"))) ||
        (col("l_suppkey") % 2 === 1 &&
          (col("n_items_v2").isNull || col("n_rows_v1") =!= 0)))
      .count()
    assert(bad === 0L)
    // v2 n_items totals equal the base-table lineitem counts
    val expected = graft.core.Tables.lineitem(spark, dir)
      .filter(col("l_suppkey") % 2 === 1)
      .groupBy("l_suppkey").agg(count(lit(1)).as("expected"))
    val mismatch = got.join(expected, "l_suppkey")
      .filter(col("n_items_v2") =!= col("expected")).count()
    assert(mismatch === 0L)
    got.unpersist()
  }
}
