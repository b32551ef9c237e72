package graft.sources

import graft.core.{Num, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink round trips beyond the reference's CSV+parquet surface: ORC
  * and JSON-lines. The oracle recomputes the final aggregate straight from
  * the base tables, so the round trip must be lossless (values travel as
  * exact integer cents — no float-text ambiguity in any format).
  */
object Roundtrips {

  private def monthlySupplierRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey"), date_format(col("l_shipdate"), "yyyy-MM").as("month"))
      .agg(sum(Num.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("rev_cents"))

  private val roundtripOracle =
    """SELECT l_suppkey,
      |  CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) AS BIGINT) AS rev_cents,
      |  CAST(count(DISTINCT strftime(l_shipdate, '%Y-%m')) AS BIGINT) AS n_months
      |FROM lineitem
      |GROUP BY l_suppkey""".stripMargin

  private def readback(df: DataFrame): DataFrame =
    df.groupBy(col("l_suppkey"))
      .agg(
        sum(col("rev_cents")).as("rev_cents"),
        countDistinct(col("month")).as("n_months"))

  val orcRoundtrip: QueryDef = QueryDef("orc_roundtrip", roundtripOracle) { (spark, dir) =>
    val path = graft.rentals.Scratch.dir("graft_orc_roundtrip")
    monthlySupplierRevenue(spark, dir).write.mode("overwrite").orc(path)
    readback(spark.read.orc(path))
  }

  val jsonlRoundtrip: QueryDef = QueryDef("jsonl_roundtrip", roundtripOracle) { (spark, dir) =>
    val path = graft.rentals.Scratch.dir("graft_jsonl_roundtrip")
    monthlySupplierRevenue(spark, dir).write.mode("overwrite").json(path)
    // JSON streams/files always get an explicit schema — no inference pass
    val schema = "l_suppkey BIGINT, month STRING, rev_cents BIGINT"
    readback(spark.read.schema(schema).json(path))
  }

  val all: Seq[QueryDef] = Seq(orcRoundtrip, jsonlRoundtrip)
}
