package graft.ops

import graft.core.{QueryDef, Tables}
import graft.functions.ZOrder2
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * A single-column sort clusters files for that column only — a predicate on
  * any other column still reads every file. Sorting by the Morton interleave
  * of (rank-normalized) coordinates clusters files in BOTH dimensions at
  * once, so plain per-file/row-group min-max statistics prune for predicates
  * on either column. At 100 TB, where the scan is the cost, this is the
  * difference between reading 1/N of the table and reading all of it —
  * paid once at write time, with zero read-side code.
  */
object Layout {

  /** Oracle-checked exercise of the interleave arithmetic itself: Morton
    * code of (price-cents, quantity) bucketed to a histogram. The DuckDB
    * oracle replays the same five spread steps as staged CTEs — bit-exact
    * cross-engine.
    */
  val zorderHist: QueryDef = {
    // s0..s5 CTE chain: one spread step per stage, both coordinates
    val stages = ZOrder2.SpreadMasks.zipWithIndex.map { case ((mask, shift), i) =>
      s"""s${i + 1} AS (
         |  SELECT (sx | (sx << $shift)) & $mask AS sx,
         |         (sy | (sy << $shift)) & $mask AS sy, x, y
         |  FROM s$i)""".stripMargin
    }.mkString(",\n")
    QueryDef(
      "zorder_hist",
      s"""WITH base AS (
         |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS x,
         |         CAST(round(l_quantity) AS BIGINT) AS y
         |  FROM lineitem),
         |s0 AS (SELECT x & 4294967295 AS sx, y & 4294967295 AS sy, x, y FROM base),
         |$stages
         |SELECT (sx | (sy << 1)) >> 32 AS zbucket,
         |       CAST(count(*) AS BIGINT) AS n,
         |       CAST(min(x) AS BIGINT) AS min_cents,
         |       CAST(max(x) AS BIGINT) AS max_cents
         |FROM s5
         |GROUP BY 1""".stripMargin) { (spark, dir) =>
      Tables.lineitem(spark, dir)
        .select(
          graft.core.Num.cents(col("l_extendedprice")).as("x"),
          round(col("l_quantity")).cast("long").as("y"))
        .select(
          shiftright(ZOrder2.zorder2(col("x"), col("y")), 32).as("zbucket"),
          col("x"))
        .groupBy(col("zbucket"))
        .agg(
          count(lit(1)).as("n"),
          min(col("x")).as("min_cents"),
          max(col("x")).as("max_cents"))
    }
  }

  /** Write `df` as `nFiles` parquet files clustered by the Z-order of two
    * numeric columns. Coordinates are min-max normalized to 16 bits first —
    * interleaving raw values would let the wider-ranged column dominate the
    * high bits and the narrow column would never cluster. (Production-scale
    * variant: normalize by approxQuantile bins instead of global min/max to
    * resist outliers; same layout machinery.)
    */
  def writeZOrdered(
      df: DataFrame, xCol: String, yCol: String, path: String, nFiles: Int): Unit = {
    val b = df.agg(
      min(col(xCol)).cast("double"), max(col(xCol)).cast("double"),
      min(col(yCol)).cast("double"), max(col(yCol)).cast("double")).head()
    val (xmin, xmax, ymin, ymax) =
      (b.getDouble(0), b.getDouble(1), b.getDouble(2), b.getDouble(3))
    def norm(c: String, lo: Double, hi: Double) =
      if (hi == lo) lit(0L)
      else ((col(c).cast("double") - lit(lo)) / lit(hi - lo) * lit(65535.0))
        .cast("long")
    val z = ZOrder2.zorder2(norm(xCol, xmin, xmax), norm(yCol, ymin, ymax))
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  val all: Seq[QueryDef] = Seq(zorderHist)
}
