package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join — the scale path for `fact.value BETWEEN dim.lo AND
  * dim.hi` when the interval side is too large to broadcast.
  *
  * Spark plans a pure range predicate as a (broadcast) nested-loop join:
  * every fact row is tested against every interval — O(|fact|·|dim|). The
  * binned rewrite replicates each interval once per fixed-width bin it
  * covers, computes the fact row's bin, and hash-joins on the bin before
  * applying the exact range predicate as a residual filter. Cost becomes
  * O(|fact| + |dim|·spans) with an ordinary shuffled/broadcast equi-join —
  * the standard interval-join decomposition used by large-scale engines.
  *
  * Exactness: binning only *routes* candidate pairs; the residual predicate
  * decides membership, so results equal the naive range join (asserted in
  * PlanSpec).
  */
object RangeJoin {

  def binned(
      fact: DataFrame,
      intervals: DataFrame,
      factValue: Column,
      lo: Column,
      hi: Column, // exclusive upper bound
      binWidth: Long): DataFrame = {
    require(binWidth > 0)
    val factBinned = fact.withColumn("__bin", floor(factValue / lit(binWidth)).cast("long"))
    val dimBinned = intervals
      .withColumn(
        "__bin",
        explode(sequence(
          floor(lo / lit(binWidth)).cast("long"),
          // hi is exclusive: the last covered bin is floor((hi-1)/w)
          floor((hi - lit(1)) / lit(binWidth)).cast("long"))))
    factBinned
      .join(dimBinned, Seq("__bin"))
      .filter(factValue >= lo && factValue < hi)
      .drop("__bin")
  }
}
