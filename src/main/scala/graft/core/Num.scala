package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic numeric patterns shared by every oracle-checked query.
  *
  * Floating-point SUM over a shuffled dataset is not associative, so a raw
  * `sum(double)` is nondeterministic across partitionings — and therefore can
  * never hash-match a single-threaded DuckDB oracle (or even a re-run of the
  * same Spark job). Every aggregated monetary metric is instead quantized to
  * integer cents first: `cast(round(x * 100) as bigint)`. Integer addition is
  * exact and associative, so the aggregate is bit-stable under any partitioning
  * and any engine. Final division back to a double is a single IEEE-754 op on
  * identical inputs, hence also bit-stable.
  *
  * The same expressions (same shape, same order) are used verbatim in the
  * DuckDB oracle SQL.
  */
object Num {
  /** x (currency, ~2 decimals + float noise) -> exact integer cents. */
  def cents(c: Column): Column = round(c * lit(100)).cast("long")

  /** Exact integer cents -> display double. Single IEEE division: bit-stable. */
  def centsToDouble(c: Column): Column = c.cast("double") / lit(100.0)

  /** Bit-stable ratio of two exact (integer) quantities. */
  def ratio(num: Column, den: Column): Column = num.cast("double") / den.cast("double")

  /** SQL fragments for the DuckDB side of the same patterns. */
  def sqlCents(expr: String): String = s"CAST(round(($expr) * 100) AS BIGINT)"
  def sqlCentsToDouble(expr: String): String = s"CAST($expr AS DOUBLE) / 100.0"

  /** The engine-free multiplicative split/sample hash (Knuth constant,
    * 31-bit key mask so the product stays exact int64 at ANY key
    * magnitude): h in [0, 2^32). EVERY membership decision that must agree
    * across queries and engines (dataset_split, decontaminate_split,
    * corpus_mixture_sample, deterministic/stratified sampling) derives from
    * this ONE definition — the train/test split and the decontamination
    * check are only meaningful because they share it structurally.
    */
  def splitHash(key: Column): Column =
    (key.bitwiseAND(lit(2147483647L)) * lit(2654435761L)) % lit(4294967296L)

  /** Same hash with an additive sub-key (row-level sampling). */
  def splitHash(key: Column, subKey: Column): Column =
    (key.bitwiseAND(lit(2147483647L)) * lit(2654435761L) + subKey) % lit(4294967296L)

  def sqlSplitHash(expr: String): String =
    s"(($expr & 2147483647) * 2654435761) % 4294967296"

  def sqlSplitHash(expr: String, subExpr: String): String =
    s"(($expr & 2147483647) * 2654435761 + $subExpr) % 4294967296"
}
