package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** Plan-shape assertions for the two physical-layout gate queries
  * (`join_bucketed_colocated`, `join_skew_aqe_split`) — the gate's oracle
  * proves their VALUES; these prove the mechanism (zero-exchange bucketed
  * join; runtime skew split) actually engaged on the same builders.
  */
class PhysicalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("join_bucketed_colocated: join inputs read bucketed files with no exchange") {
    val df = Physical.bucketedJoin(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    // below the join there must be NO hash exchange: bucketing pre-shuffled
    // both sides at write time (the aggregate above the join still shuffles)
    val belowJoin = plan.split("SortMergeJoin|ShuffledHashJoin").last
    assert("Exchange hashpartitioning".r.findAllIn(belowJoin).isEmpty,
      s"join inputs re-shuffled:\n$plan")
    assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
      s"scan not bucketed:\n$plan")
  }

  test("join_skew_aqe_split: hot partition is split at runtime (isSkewJoin)") {
    val sess = spark.newSession()
    Physical.skewConfs.foreach { case (k, v) => sess.conf.set(k, v) }
    // sf0.001 shuffles are smaller than the gate-tuned thresholds — scale
    // them down again so the detector fires on the ~6k-row fixture too
    sess.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
    sess.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    val df = Physical.skewedRevenueByTag(sess, sf)
    df.queryExecution.toRdd.count()
    val helper = new AdaptiveSparkPlanHelper {}
    val skewFlags = helper.collect(df.queryExecution.executedPlan) {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j.isSkewJoin
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j.isSkewJoin
    }
    assert(skewFlags.contains(true),
      s"no skew-split join in:\n${df.queryExecution.executedPlan}")
  }

  test("skewed join result equals the plain (un-tuned) computation") {
    val tuned = Physical.joinSkewAqeSplit.fn(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val plain = Physical.skewedRevenueByTag(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(tuned === plain)
    assert(tuned.nonEmpty)
  }

  test("bucketed join result equals the plain join on the base tables") {
    val bucketed = Physical.bucketedJoin(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val plain = graft.core.Tables.orders(spark, sf)
      .join(graft.core.Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(graft.core.Num.cents(col("o_totalprice"))).as("total_cents"))
      .collect().map(_.toString).sorted.toSeq
    assert(bucketed === plain)
    assert(bucketed.nonEmpty)
  }
}
