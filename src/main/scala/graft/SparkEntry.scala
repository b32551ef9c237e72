package graft

import graft.core.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + BASELINE.md.
  *
  * Every implemented operator from SURVEY.md §2 (plus the LLM-pipeline
  * extension set) registers one named query; SQL-expressible ones carry a
  * DuckDB oracle with hash-stable numerics (see [[graft.core.Num]]).
  */
object SparkEntry {

  private val registry: Seq[QueryDef] =
    rentals.RentalsDemo.queries ++
      ops.Relational.all ++
      ops.Analytics.all ++
      ops.Events.all ++
      ops.Sketches.all ++
      ops.RuntimeFilter.all ++
      ops.Layout.all ++
      ops.Physical.all ++
      ops.Ranking.all ++
      ops.Graph.all ++
      text.TextAnalysis.all ++
      text.Dedup.all ++
      text.Corpus.all ++
      text.LanguageModel.all ++
      vector.Similarity.all ++
      multimodal.Multimodal.all ++
      sources.Roundtrips.all :+
      streaming.Streams.streamingHourly :+
      streaming.Streams.streamingHourlyAppend :+
      streaming.Streams.streamingDedupExact :+
      streaming.Streams.streamStreamJoin :+
      streaming.Streams.streamStaticJoin :+
      streaming.Streams.streamingUserTotals :+
      streaming.Streams.streamingSessionWindows :+
      streaming.Streams.streamingTypeCounts :+
      streaming.Streams.streamingHoppingAppend :+
      streaming.Streams.streamingIncrementalSink :+
      streaming.Streams.streamingTwsTypeStats :+
      streaming.Streams.streamStreamLeftJoin :+
      streaming.Streams.streamStreamFullJoin :+
      streaming.Streams.streamingAsofEnrich :+
      streaming.Streams.streamingStatefulRestart

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full reference pipeline (clean -> dedup -> MoM lag -> state rank)
    * over the rentals-shaped projection of the star schema.
    */
  def entry(spark: SparkSession): DataFrame =
    rentals.RentalsDemo.pipeline(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. EVERY registered query carries an oracle —
    * the hash-family ops (MinHash/SimHash/IVF) use portable polynomial
    * hash constants restatable in SQL, so even those are full hash-match
    * rows, not rows-only checks.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
