package graft.ops

import graft.SparkSpec
import graft.functions.{ScoredId, TopKAggregator}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class AggregatesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(res.passed, res.status.toString)
  }

  test("topk aggregator equals the window row_number formulation") {
    val agg = Relational.topkAggregatorSuppliers.fn(spark, sf)
      .select("n_name", "s_suppkey", "rnk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val win = Relational.topkSuppliersPerNation.fn(spark, sf)
      .select("n_name", "s_suppkey", "rnk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(agg === win)
  }

  test("topk aggregator: pure merge semantics match a plain sort (property)") {
    val k = 3
    val agg = new TopKAggregator(k)
    val gen = Gen.listOf(Gen.zip(Gen.chooseNum(-1000L, 1000L), Gen.chooseNum(0L, 50L)))
    checkProp(Prop.forAll(gen) { xs =>
      val items = xs.map { case (s, i) => ScoredId(s, i) }
      // arbitrary split into two partitions, reduced then merged
      val (l, r) = items.splitAt(items.length / 2)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      val expected = items.sortBy(e => (-e.score, e.id)).take(k)
      merged == expected
    })
  }

  test("salted two-stage aggregation equals the direct group-by") {
    val salted = Relational.aggSaltedTwoStage.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val direct = graft.core.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(
        graft.core.Num.centsToDouble(
          sum(graft.core.Num.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))).as("revenue"),
        count(lit(1)).as("n_rows"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted === direct)
  }

  test("approx_percentile within-2%-of-exact contract flag holds everywhere") {
    val rows = Relational.aggApproxPercentile.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("exact_p50") > 0)
      assert(r.getAs[Boolean]("approx_within_2pct"), r.toString)
    }
  }

  test("approx_count_distinct within-10%-of-exact contract flag holds everywhere") {
    val rows = Relational.aggApproxDistinct.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_parts") > 0)
      assert(r.getAs[Boolean]("hll_within_10pct"), r.toString)
    }
  }
}
