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
  * Both use Spark-internal hash constants, so the query is rows-only
  * (deterministic across runs); SketchesSpec bounds the error against exact
  * counts.
  */
object Sketches {

  /** Estimated vs exact order counts per supplier for a fixed probe set. */
  val cmsSupplierFreq: QueryDef = QueryDef.noOracle("cms_supplier_freq") { (spark, dir) =>
    import spark.implicits._
    val l = Tables.lineitem(spark, dir)
    val sketchBytes = l
      .agg(expr("count_min_sketch(l_suppkey, 0.001d, 0.99d, 42)").as("cms"))
      .head().getAs[Array[Byte]]("cms")
    val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(sketchBytes))
    val probes = l.select(col("l_suppkey")).distinct()
      .orderBy(col("l_suppkey")).limit(10)
      .collect().map(_.getLong(0))
    val exact = l.filter(col("l_suppkey").isin(probes: _*))
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    probes.toSeq
      .map(k => (k, cms.estimateCount(k), exact.getOrElse(k, 0L)))
      .toDF("l_suppkey", "estimated", "exact")
  }

  val all: Seq[QueryDef] = Seq(cmsSupplierFreq)
}
