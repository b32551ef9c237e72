package graft.ops

import graft.core.{Num, QueryDef, Tables}
import graft.functions.{BloomBuildAggregator, BloomFilter}
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Explicit runtime join filtering (sideways information passing): build a
  * Bloom filter over the (filtered) build side's join keys, probe it on the
  * big side BEFORE the join shuffle. The filter is bounded model state (an
  * m-bit blob, like k-means centroids or the mixture totals) — at 100 TB the
  * blob broadcasts where the key set itself could not, and every pruned row
  * is shuffle bytes that never leave the scan stage. Results stay exact:
  * false positives just ride through the exact join; false negatives are
  * structurally impossible.
  */
object RuntimeFilter {

  /** Build the key Bloom filter with one distributive aggregate (map-side
    * partial bitsets, OR-merge reduce — no key shuffle) and collect the
    * single blob. 2^23 bits = 1 MiB handles ~10^6 keys at ~1% fpp with k=5;
    * size up with the build side (fpp ≈ load^k, see
    * [[BloomFilter.loadFactor]]).
    */
  def bloomOf(
      df: DataFrame,
      keyCol: String,
      numBits: Int = 1 << 23,
      numHashes: Int = 5): Array[Byte] = {
    val agg = udaf(new BloomBuildAggregator(numBits, numHashes), Encoders.LONG)
    df.select(agg(col(keyCol))).head().getAs[Array[Byte]](0)
  }

  /** Probe-side pruning filter as a Column: the blob rides as a Literal, so
    * the codegen'd probe inlines into the scan's WholeStageCodegen.
    */
  def prune(blob: Array[Byte], key: String): org.apache.spark.sql.Column =
    BloomFilter.mightContainCol(lit(blob), col(key))

  /** Selective orders window joined to lineitem, with the lineitem side
    * Bloom-pruned before the shuffle. The oracle is the plain join — the
    * hash match proves pruning changed nothing (exactness), while the plan
    * carries the filter at the scan (see PLANS.md).
    */
  val bloomPruneJoin: QueryDef = QueryDef(
    "bloom_prune_join",
    s"""SELECT CAST(date_trunc('month', o.o_orderdate) AS DATE) AS order_month,
       |  CAST(count(*) AS BIGINT) AS n_items,
       |  ${Num.sqlCentsToDouble(s"SUM(${Num.sqlCents("l.l_extendedprice")})")} AS revenue
       |FROM lineitem l
       |JOIN orders o ON o.o_orderkey = l.l_orderkey
       |WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
       |  AND o.o_orderdate <  TIMESTAMP '1995-07-01 00:00:00'
       |GROUP BY 1""".stripMargin) { (spark, dir) =>
    val ordersF = Tables.orders(spark, dir)
      .filter(
        col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1995-07-01 00:00:00")))
      .select(col("o_orderkey"), col("o_orderdate"))
    val blob = bloomOf(ordersF, "o_orderkey")
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_extendedprice"))
      .filter(prune(blob, "l_orderkey"))
      .join(ordersF, col("o_orderkey") === col("l_orderkey"))
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("order_month"))
      .agg(
        count(lit(1)).as("n_items"),
        Num.centsToDouble(sum(Num.cents(col("l_extendedprice")))).as("revenue"))
  }

  val all: Seq[QueryDef] = Seq(bloomPruneJoin)
}
