package graft.ops

import graft.SparkSpec
import graft.functions.BloomFilter
import org.apache.spark.sql.functions._

/** Bloom runtime filter: no false negatives ever, measured false-positive
  * rate, distributive build, and end-to-end join equivalence.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("bloom: every inserted key hits; absent keys mostly miss (fpp sane)") {
    val blob = BloomFilter.empty(1 << 16, 5)
    val present = (0L until 2000L).map(_ * 7919L + 13L)
    present.foreach(BloomFilter.add(blob, _))
    assert(present.forall(BloomFilter.mightContain(blob, _)), "false negative!")
    val absent = (0L until 20000L).map(_ * 104729L + 7L).filterNot(present.toSet)
    val fp = absent.count(BloomFilter.mightContain(blob, _)).toDouble / absent.size
    // load ~ 2000*5/65536 ~ 0.14 -> fpp ~ 0.14^5 ~ 6e-5; allow slack
    assert(fp < 0.01, s"fp rate $fp; load ${BloomFilter.loadFactor(blob)}")
  }

  test("bloom build is distributive: merge of partial blobs == sequential build") {
    val a = BloomFilter.empty(1 << 12, 4)
    val b = BloomFilter.empty(1 << 12, 4)
    val whole = BloomFilter.empty(1 << 12, 4)
    (1L to 500L).foreach { k => BloomFilter.add(a, k); BloomFilter.add(whole, k) }
    (501L to 1000L).foreach { k => BloomFilter.add(b, k); BloomFilter.add(whole, k) }
    assert(BloomFilter.merge(a, b).toSeq === whole.toSeq)
  }

  test("distributed aggregator build equals local build; null keys ignored") {
    import spark.implicits._
    val keys = (1L to 3000L).map(k => Option(k * 31L)) :+ Option.empty[Long]
    val df = keys.toDF("k").repartition(8)
    val blob = RuntimeFilter.bloomOf(df, "k", numBits = 1 << 14, numHashes = 5)
    val local = BloomFilter.empty(1 << 14, 5)
    keys.flatten.foreach(BloomFilter.add(local, _))
    assert(blob.toSeq === local.toSeq)
  }

  test("pruned join equals the plain join on sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val pruned = RuntimeFilter.bloomPruneJoin.fn(spark, sf)
      .collect().map(r => r.getDate(0).toString -> ((r.getLong(1), r.getDouble(2)))).toMap
    val ordersF = graft.core.Tables.orders(spark, sf)
      .filter(
        col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1995-07-01 00:00:00")))
    val plain = graft.core.Tables.lineitem(spark, sf)
      .join(ordersF, col("o_orderkey") === col("l_orderkey"))
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("order_month"))
      .agg(
        count(lit(1)).as("n_items"),
        graft.core.Num.centsToDouble(
          sum(graft.core.Num.cents(col("l_extendedprice")))).as("revenue"))
      .collect().map(r => r.getDate(0).toString -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(pruned.nonEmpty)
    assert(pruned === plain)
  }

  test("probe expression stays codegen-compatible (no eval fallback in the plan)") {
    val blob = BloomFilter.empty(1 << 10, 3)
    (1L to 10L).foreach(BloomFilter.add(blob, _))
    // a Range source (not a local relation, which the optimizer would
    // constant-fold through the filter) so the probe must codegen
    val df = spark.range(1L, 101L).toDF("k")
      .filter(BloomFilter.mightContainCol(lit(blob), col("k")))
    val kept = df.collect().map(_.getLong(0))
    assert((1L to 10L).forall(kept.contains), "false negative through the expression path")
    // codegen smoke: the filter compiles into a WholeStageCodegen stage
    // (rendered as the `*(n)` prefix in the plan string)
    val stages = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(stages.exists(_.toString.contains("bloom_might_contain")),
      df.queryExecution.executedPlan.toString)
  }
}
