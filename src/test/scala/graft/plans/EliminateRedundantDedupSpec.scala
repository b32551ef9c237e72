package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.catalyst.plans.logical.Deduplicate
import org.apache.spark.sql.functions._

class EliminateRedundantDedupSpec extends SparkSpec {

  private def lineitem = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")

  test("dedup on a superset of the grouping columns is eliminated") {
    val df = lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .dropDuplicates(Seq("l_returnflag", "l_linestatus", "n"))
    val analyzed = df.queryExecution.analyzed
    assert(analyzed.collect { case d: Deduplicate => d }.nonEmpty)
    val rewritten = EliminateRedundantDedup(analyzed)
    assert(rewritten.collect { case d: Deduplicate => d }.isEmpty, rewritten.toString)
  }

  test("dedup on exactly the grouping columns is eliminated") {
    val df = lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("q"))
      .dropDuplicates(Seq("l_returnflag", "l_linestatus"))
    val rewritten = EliminateRedundantDedup(df.queryExecution.analyzed)
    assert(rewritten.collect { case d: Deduplicate => d }.isEmpty, rewritten.toString)
  }

  test("dedup on a subset of the grouping columns is KEPT (not a no-op)") {
    val df = lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .dropDuplicates(Seq("l_returnflag")) // rows NOT unique on this alone
    val rewritten = EliminateRedundantDedup(df.queryExecution.analyzed)
    assert(rewritten.collect { case d: Deduplicate => d }.nonEmpty)
  }

  test("dedup over a non-aggregate child is untouched") {
    val df = lineitem.dropDuplicates(Seq("l_orderkey", "l_linenumber"))
    val rewritten = EliminateRedundantDedup(df.queryExecution.analyzed)
    assert(rewritten.collect { case d: Deduplicate => d }.nonEmpty)
  }
}
