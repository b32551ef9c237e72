package graft.ops

import graft.core.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable sketch summaries — the constant-memory answers to frequency and
  * membership questions at 100 TB, where exact state would be unbounded:
  *
  *  - Count-Min (built with Spark's distributed `count_min_sketch`
  *    aggregate): point-frequency estimates with ε·n additive error, never
  *    under-counting. The sketch is a few KB regardless of input size and
  *    merges associatively across partitions.
  *  - Bloom filter (`DataFrameStat.bloomFilter`): set membership with no
  *    false negatives and a bounded false-positive rate — the classic
  *    pre-join filter for sparse matches.
  *
  * The sketch estimates themselves use Spark-internal hash constants no other
  * engine reproduces, so the oracle instead checks the sketch's *contract*:
  * the query outputs the exact frequencies (DuckDB-reproducible) plus a
  * boolean asserting `exact ≤ estimate ≤ exact + ε·n` — fixed-seed sketch
  * over fixed data, so the flag is deterministic. SketchesSpec additionally
  * bounds the error in-process.
  */
object Sketches {

  /** Exact order-line counts per probe supplier (s_suppkey ≤ 10) with the
    * Count-Min over/under-count guarantee checked against the estimate.
    */
  val cmsSupplierFreq: QueryDef = QueryDef(
    "cms_supplier_freq",
    """SELECT s.s_suppkey AS l_suppkey,
      |       CAST(count(l.l_suppkey) AS BIGINT) AS exact_n,
      |       TRUE AS cms_within_bound
      |FROM supplier s LEFT JOIN lineitem l ON l.l_suppkey = s.s_suppkey
      |WHERE s.s_suppkey <= 10
      |GROUP BY 1""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val l = Tables.lineitem(spark, dir)
    val eps = 0.001
    val sketchBytes = l
      .agg(expr(s"count_min_sketch(l_suppkey, ${eps}d, 0.99d, 42)").as("cms"))
      .head().getAs[Array[Byte]]("cms")
    val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(sketchBytes))
    val slack = math.ceil(eps * cms.totalCount()).toLong
    val probes = Tables.supplier(spark, dir)
      .filter(col("s_suppkey") <= 10)
      .select(col("s_suppkey").cast("long")).as[Long].collect().sorted
    val estimates = probes.toSeq.map(k => (k, cms.estimateCount(k)))
      .toDF("l_suppkey", "estimated")
    val exact = l.filter(col("l_suppkey") <= 10)
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("exact_n"))
    estimates.join(exact, Seq("l_suppkey"), "left")
      .na.fill(0L, Seq("exact_n"))
      .select(
        col("l_suppkey"),
        col("exact_n"),
        (col("estimated") >= col("exact_n") &&
          col("estimated") <= col("exact_n") + lit(slack)).as("cms_within_bound"))
  }

  val all: Seq[QueryDef] = Seq(cmsSupplierFreq)
}
