package graft.core

import graft.functions.{HammingDistance64, LongDotProduct}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering the engine's native expressions as SQL
  * functions, so `spark.sql("SELECT long_dot(a, b) ...")` works next to the
  * Column API. Install with:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.core.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", name, usage)

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.EliminateRedundantDedup)
    e.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    e.injectFunction((
      FunctionIdentifier("long_dot"),
      info("long_dot", "long_dot(array<bigint>, array<bigint>) - exact integer dot product"),
      (args: Seq[Expression]) => LongDotProduct(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("hamming64"),
      info("hamming64", "hamming64(bigint, bigint) - popcount of xor"),
      (args: Seq[Expression]) => HammingDistance64(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("minhash_sigs"),
      info("minhash_sigs", "minhash_sigs(array<string>, k) - k-wide MinHash signature, one pass"),
      (args: Seq[Expression]) => graft.functions.MinHashSignature(
        args(0), args(1).eval().asInstanceOf[Number].intValue())))
  }
}
