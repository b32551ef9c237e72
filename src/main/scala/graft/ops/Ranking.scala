package graft.ops

import graft.core.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking.
  *
  * The naive global rank — `row_number() OVER (ORDER BY ...)` with no
  * partition — drags every row through ONE window partition: the exact
  * serialization point that kills a 100 TB job. This operator produces the
  * identical ranking from the pieces a distributed engine already has:
  *
  *   1. range-partition on the sort key (the same exchange a global
  *      `ORDER BY` uses — partition i holds keys strictly below partition
  *      i+1), then sort within partitions;
  *   2. read each row's partition-local position off
  *      `monotonically_increasing_id()` (documented layout: partition id in
  *      the upper bits, a per-partition sequential counter in the low 33 —
  *      taken ABOVE the local sort, so the counter follows the sorted
  *      order);
  *   3. shift by the preceding partitions' row counts — a prefix sum over
  *      one tiny row per partition, broadcast back.
  *
  * Every stage is parallel except the prefix sum over #partitions rows,
  * the same bounded-by-design trick as [[graft.text.Corpus.packed]]. The
  * sort keys must be a TOTAL order (include a unique tiebreak column) —
  * that is what makes rank == row_number and the result deterministic.
  */
object Ranking {

  /** Global 1-based dense position of every row under the total order
    * `sortCols`, as column `rankCol`, without a single-partition window.
    */
  def globalRankBy(df: DataFrame, sortCols: Seq[String], rankCol: String): DataFrame = {
    // explicit partition count: the range exchange is the ONE shuffle this
    // operator does, and every downstream stage (local sort, window, rank
    // arithmetic) inherits its layout — AQE's input-byte coalescing would
    // serialize all of it whenever the keys are narrow (measured locally:
    // the whole sweep ran in one task), so pin it to the configured
    // parallelism, which is what a non-coalesced cluster run plans anyway
    val sorted = df
      .repartitionByRange(graft.core.Par.parallelism(df), sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .withColumn("__mono", monotonically_increasing_id())
      .withColumn("__part", shiftright(col("__mono"), 33))
      .withColumn("__local", col("__mono").bitwiseAND(lit((1L << 33) - 1)))
    // Prefix sum over per-partition counts: <= #shuffle-partitions rows, so
    // one window partition is the INTENDED plan (declared via the
    // constant-but-not-foldable pmod key, as in Corpus.packed). The counts
    // side re-reads the SAME range exchange (ReusedExchange), so the big
    // side shuffles once.
    val wOff = Window.partitionBy(pmod(col("__part"), lit(1L)))
      .orderBy(col("__part")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sorted.groupBy(col("__part"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("__off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
      .select(col("__part"), col("__off"))
    sorted.join(broadcast(offsets), "__part")
      .withColumn(rankCol, col("__off") + col("__local") + lit(1L))
      .drop("__mono", "__part", "__local")
  }

  /** Global running (inclusive prefix) sum of `valueCol` under the total
    * order `sortCols`, without a single-partition window — the distributed
    * sweep-line primitive (running balances, concurrency counting, water-
    * filling). Same plan shape as [[globalRankBy]]: range-partition on the
    * sort key, per-partition local prefix sums in one window, and a
    * broadcast prefix-sum of the ≤#partitions per-partition TOTALS as the
    * cross-partition offset; the totals side re-reads the same range
    * exchange (ReusedExchange), so the data shuffles once.
    */
  def globalRunningSumBy(
      df: DataFrame, sortCols: Seq[String], valueCol: String, outCol: String): DataFrame = {
    // same explicit-count rationale as [[globalRankBy]]
    val sorted = df
      .repartitionByRange(graft.core.Par.parallelism(df), sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .withColumn("__mono", monotonically_increasing_id())
      .withColumn("__part", shiftright(col("__mono"), 33))
    val wLocal = Window.partitionBy(col("__part"))
      .orderBy(col("__mono"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wOff = Window.partitionBy(pmod(col("__part"), lit(1L)))
      .orderBy(col("__part")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sorted.groupBy(col("__part"))
      .agg(sum(col(valueCol)).as("__tot"))
      .withColumn("__off", coalesce(sum(col("__tot")).over(wOff), lit(0L)))
      .select(col("__part"), col("__off"))
    sorted
      .withColumn("__localsum", sum(col(valueCol)).over(wLocal))
      .join(broadcast(offsets), "__part")
      .withColumn(outCol, col("__off") + col("__localsum"))
      .drop("__mono", "__part", "__localsum")
  }

  /** Global rank of every document by size — the "order the whole corpus"
    * primitive behind curriculum ordering and deterministic training-data
    * shuffles. The oracle states the single-window spec this must equal.
    */
  val globalRankRanged: QueryDef = QueryDef(
    "global_rank_ranged",
    """SELECT doc_id, n_chars,
      |  CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS global_rank
      |FROM documents""".stripMargin) { (spark, dir) =>
    globalRankBy(
      Tables.documents(spark, dir).select(col("doc_id"), col("n_chars")),
      Seq("n_chars", "doc_id"), "global_rank")
      .select(col("doc_id"), col("n_chars"), col("global_rank"))
  }

  /** Deterministic corpus shuffle: a pseudo-random but engine-independent
    * training order — rank by a salted multiplicative hash of the key (the
    * standard "hash then sort" shuffle every epoch pipeline needs; a new
    * salt is a new permutation). The hash is the engine-portable
    * [[graft.core.Num.splitHash]] (exact int64 at any key magnitude), so
    * the oracle replays it verbatim; built on the same ranged rank, so no
    * single-partition stage.
    */
  val corpusShuffleOrder: QueryDef = QueryDef(
    "corpus_shuffle_order",
    s"""SELECT doc_id,
       |  CAST(row_number() OVER (
       |    ORDER BY ${graft.core.Num.sqlSplitHash("doc_id + 42")}, doc_id) AS BIGINT)
       |    AS shuffle_pos
       |FROM documents""".stripMargin) { (spark, dir) =>
    globalRankBy(
      Tables.documents(spark, dir)
        .select(col("doc_id"), graft.core.Num.splitHash(col("doc_id") + lit(42L)).as("__h")),
      Seq("__h", "doc_id"), "shuffle_pos")
      .select(col("doc_id"), col("shuffle_pos"))
  }

  val all: Seq[QueryDef] = Seq(globalRankRanged, corpusShuffleOrder)
}
