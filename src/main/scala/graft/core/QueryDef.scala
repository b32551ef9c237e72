package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine capability: a named DataFrame query over a testdata
  * scale-factor directory, paired with an equivalent DuckDB SQL oracle
  * (driver contract, see SparkEntry). Every registered query carries an
  * oracle — the hash-family ops use portable polynomial constants that are
  * restatable in ANSI SQL, so nothing falls back to a rows-only check.
  * `oracle` stays an Option only because the driver contract permits
  * omission; the registry never exercises None.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
}
