package graft.ops

import graft.SparkSpec
import graft.rentals.RentalsDemo
import graft.vector.Similarity
import org.apache.spark.sql.functions._

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

  test("partition pruning: StateName filter reaches PartitionFilters on the partitioned sink") {
    graft.rentals.RentalsDemo.partitionedWriteReadback(spark, sf).count() // materialize the sink
    val scan = spark.read.parquet(RentalsDemo.processedParquetPath)
      .filter(col("StateName") === "NATION_12")
    val p = scan.queryExecution.executedPlan.toString
    val scanLine = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("StateName"), s"partition filter not pushed:\n$p")
    assert(!p.contains("Filter (StateName"), s"partition predicate left as a row filter:\n$p")
  }

  test("salted equi-join equals the plain join") {
    import spark.implicits._
    val events = graft.core.Tables.events(spark, sf)
    val dim = Seq(("click", 1.0), ("view", 0.5), ("purchase", 10.0), ("signup", 3.0), ("error", 0.0))
      .toDF("etype", "weight")
    val salted = Skew.saltedEquiJoin(events, dim, col("event_type"), col("etype"), saltFactor = 8)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), first(col("weight")).as("w"))
    val plain = events.join(dim, col("event_type") === col("etype"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), first(col("weight")).as("w"))
    assert(
      salted.collect().map(_.toString).sorted.toSeq ===
        plain.collect().map(_.toString).sorted.toSeq)
  }

  test("binned range join equals the naive range join and plans a hash join, not BNLJ") {
    import spark.implicits._
    val intervals = Seq(
      (0L, 10000000L, "low"),
      (10000000L, 30000000L, "mid"),
      (30000000L, 2000000000L, "high")).toDF("lo", "hi", "band")
    val fact = graft.core.Tables.orders(spark, sf)
      .select(col("o_orderkey"), graft.core.Num.cents(col("o_totalprice")).as("cents"))
    val naive = fact.join(intervals, col("cents") >= col("lo") && col("cents") < col("hi"))
      .select("o_orderkey", "band")
    val binned = RangeJoin.binned(fact, intervals, col("cents"), col("lo"), col("hi"), 1000000L)
      .select("o_orderkey", "band")
    assert(
      binned.collect().map(_.toString).sorted.toSeq ===
        naive.collect().map(_.toString).sorted.toSeq)
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"still a nested-loop join:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
  }

  test("rentals pipeline: exactly the two window exchanges + one aggregate exchange") {
    val p = plan(RentalsDemo.pipeline(spark, sf))
    // dedup collapses into the aggregate's partitioning; windows add two more
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 4, s"too many shuffles ($exchanges):\n$p")
  }

  test("self-join on an aggregate reuses the shuffle (ReusedExchange, single scan cost)") {
    val monthly = graft.core.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(sum(graft.core.Num.cents(col("l_extendedprice"))).as("cents"))
    val joined = monthly.as("a").join(
      monthly.as("b"), col("a.l_returnflag") === col("b.l_returnflag"))
    assert(joined.queryExecution.toRdd.count() > 0)
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange") || p.contains("TableCacheQueryStage"),
      s"identical aggregate subplans were both executed:\n$p")
  }

  test("runtime bloom filter from a selective dim join prunes the fact scan side") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // broadcast would use DPP instead
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // selective filter on the small side of a shuffle join: the optimizer
      // should inject bloom_filter_might_contain on the fact side so most
      // fact rows drop before the exchange
      val supplier = graft.core.Tables.supplier(spark, sf).filter(col("s_suppkey") <= 3)
      val li = graft.core.Tables.lineitem(spark, sf)
      val joined = li.join(supplier, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_suppkey")).agg(count(lit(1)).as("n"))
      val p = joined.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain") && p.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n$p")
      assert(joined.collect().map(_.getLong(1)).sum > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanHelper => H}
    import spark.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      // enough partitions that the median is a tail partition, not the hot one
      "spark.sql.shuffle.partitions" -> "16",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key (~100k rows) + a long tail: the classic skewed fact side
      // incompressible payload: shuffle sizes (the skew detector's input)
      // are post-compression bytes, so a constant string would vanish
      val big = ((1 to 100000).map(_ => 0L) ++ (1L to 100L).flatMap(k => Seq.fill(100)(k)))
        .toDF("k").withColumn("payload", md5(monotonically_increasing_id().cast("string")))
      val small = (0L to 100L).toDF("k2").withColumn("tag", col("k2") * 10)
      val joined = big.join(small, col("k") === col("k2"))
      // drive THIS dataset's own QueryExecution (write()/count() would build
      // a fresh one and leave joined's adaptive plan un-finalized)
      assert(joined.queryExecution.toRdd.count() === 100000L + 100 * 100)
      val helper = new H {}
      val smjs = helper.collect(joined.queryExecution.executedPlan) {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j.isSkewJoin
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j.isSkewJoin
      }
      assert(smjs.contains(true),
        s"no skew-split join in:\n${joined.queryExecution.executedPlan}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("feature_hashing plans with zero exchanges (pure row-local featurization)") {
    val p = plan(graft.text.LanguageModel.featureHashing.fn(spark, sf))
    assert(!p.contains("Exchange"), s"unexpected shuffle in:\n$p")
    assert(p.contains("Scan parquet") || p.contains("FileScan"), p)
  }

  test("sliding_token_windows plans with zero exchanges") {
    val p = plan(graft.text.LanguageModel.slidingTokenWindows.fn(spark, sf))
    assert(!p.contains("Exchange"), s"unexpected shuffle in:\n$p")
  }

  test("rolling_ewma and rolling_median share one bucket exchange between aggregate and window") {
    Seq(Analytics.rollingEwma, Analytics.rollingMedian).foreach { q =>
      val p = plan(q.fn(spark, sf))
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(exchanges === 1, s"${q.name}: expected the single shared bucket exchange, got $exchanges:\n$p")
    }
  }

  test("agg_multi_distinct plans one Expand-based scan, not self-joined subqueries") {
    val p = plan(Analytics.aggMultiDistinct.fn(spark, sf))
    assert(p.contains("Expand"), s"expected Expand in:\n$p")
    assert(!p.contains("Join"), s"multi-distinct must not self-join:\n$p")
    assert("Scan parquet|FileScan".r.findAllIn(p).size === 1, s"single scan expected:\n$p")
  }

  test("embedding_gram_matrix: fixed dimension-pair key space, no self-join") {
    val p = plan(graft.vector.Similarity.embeddingGramMatrix.fn(spark, sf))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    // the only non-broadcast exchange is the (dim_i, dim_j) aggregate
    val dataExchanges = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(dataExchanges === 1, s"expected one pair-keyed exchange:\n$p")
  }
}
