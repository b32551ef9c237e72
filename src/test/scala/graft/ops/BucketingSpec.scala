package graft.ops

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Bucketing = pre-shuffled storage: two tables bucketed on the join key
  * join with NO exchange on either side — the 100 TB answer for a join that
  * repeats every run (pay the shuffle once at write time).
  */
class BucketingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("co-located bucketed join plans without any exchange") {
    withTempDir { dir =>
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        // force a non-broadcast plan so bucketing is what avoids the shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        Tables.orders(spark, sf).write
          .bucketBy(8, "o_custkey").sortBy("o_custkey")
          .option("path", s"$dir/orders_b").mode("overwrite").saveAsTable("orders_b")
        Tables.customer(spark, sf).write
          .bucketBy(8, "c_custkey").sortBy("c_custkey")
          .option("path", s"$dir/customer_b").mode("overwrite").saveAsTable("customer_b")

        val joined = spark.table("orders_b")
          .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
        // neither join input may re-shuffle: bucketing already partitioned them
        val exchangesBeforeAgg = "Exchange hashpartitioning".r
          .findAllIn(plan.split("SortMergeJoin|ShuffledHashJoin").last).size
        assert(exchangesBeforeAgg === 0, s"join inputs re-shuffled:\n$plan")

        // and the result matches the plain (shuffled) join
        val plain = Tables.orders(spark, sf)
          .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"))
        assert(
          joined.collect().map(_.toString).sorted.toSeq ===
            plain.collect().map(_.toString).sorted.toSeq)
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")
      }
    }
  }

  test("native expressions are SQL-callable once registered") {
    // GraftExtensions wires these at session build
    // (spark.sql.extensions=graft.core.GraftExtensions); the shared test
    // session predates that, so register through the same registry path.
    new graft.core.GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "long_dot",
      exprs => graft.functions.LongDotProduct(exprs(0), exprs(1)),
      "built-in")
    registry.createOrReplaceTempFunction(
      "hamming64",
      exprs => graft.functions.HammingDistance64(exprs(0), exprs(1)),
      "built-in")
    val r = spark.sql(
      "SELECT long_dot(array(1L, 2L), array(3L, 4L)) AS d, hamming64(1L, 2L) AS h").head()
    assert(r.getLong(0) === 11L)
    assert(r.getLong(1) === 2L)
  }
}
