package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine capability: a named DataFrame query over a testdata
  * scale-factor directory, optionally paired with an equivalent DuckDB SQL
  * oracle (driver contract, see SparkEntry). Queries without an oracle (hash-
  * family ops whose constants are Spark-internal) get the driver's weaker
  * rows-only check.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
