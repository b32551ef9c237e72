package graft.ops

import graft.SparkSpec
import graft.rentals.RentalsDemo
import graft.vector.Similarity

/** Physical-plan shape assertions — the 100 TB contract: pushdown reaches the
  * scan, dimension joins broadcast, no accidental cartesian products, window
  * stages don't double-shuffle.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("scan_filter_project: predicates and projection reach the parquet scan") {
    val p = plan(Relational.scanFilterProject.fn(spark, sf))
    assert(p.contains("PushedFilters: ["), s"no pushed filters in:\n$p")
    assert(p.contains("GreaterThanOrEqual") || p.contains("IsNotNull"), p)
    // projection pruning: the scan must not read all 11 lineitem columns
    assert(p.contains("ReadSchema"), p)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_returnflag"), s"scan reads unneeded column: $readSchema")
  }

  test("join_region_revenue: all three dim joins are broadcast, fact side never shuffles before agg") {
    val p = plan(Relational.joinRegionRevenue.fn(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size === 3, p)
    assert(!p.contains("SortMergeJoin"), s"unexpected sort-merge join:\n$p")
  }

  test("agg_pricing_summary: partial (map-side) aggregation before the exchange") {
    val p = plan(Relational.aggPricingSummary.fn(spark, sf))
    assert(p.contains("HashAggregate"), p)
    assert(p.toLowerCase.contains("partial_"), s"no partial aggregation:\n$p")
  }

  test("knn brute force: query side broadcasts; no cartesian product node") {
    val p = plan(Similarity.knnBrute.fn(spark, sf))
    assert(!p.contains("CartesianProduct"), s"cartesian product in plan:\n$p")
    assert(p.contains("Broadcast"), p)
  }

  test("rentals pipeline: exactly the two window exchanges + one aggregate exchange") {
    val p = plan(RentalsDemo.pipeline(spark, sf))
    // dedup collapses into the aggregate's partitioning; windows add two more
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 4, s"too many shuffles ($exchanges):\n$p")
  }
}
