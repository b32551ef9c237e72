package graft.ops

import graft.core.{QueryDef, Tables}
import graft.functions.ZOrder2
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * A single-column sort clusters files for that column only — a predicate on
  * any other column still reads every file. Sorting by the Morton interleave
  * of (rank-normalized) coordinates clusters files in BOTH dimensions at
  * once, so plain per-file/row-group min-max statistics prune for predicates
  * on either column. At 100 TB, where the scan is the cost, this is the
  * difference between reading 1/N of the table and reading all of it —
  * paid once at write time, with zero read-side code.
  */
object Layout {

  /** Oracle-checked exercise of the interleave arithmetic itself: Morton
    * code of (price-cents, quantity) bucketed to a histogram. The DuckDB
    * oracle replays the same five spread steps as staged CTEs — bit-exact
    * cross-engine.
    */
  val zorderHist: QueryDef = {
    // s0..s5 CTE chain: one spread step per stage, both coordinates
    val stages = ZOrder2.SpreadMasks.zipWithIndex.map { case ((mask, shift), i) =>
      s"""s${i + 1} AS (
         |  SELECT (sx | (sx << $shift)) & $mask AS sx,
         |         (sy | (sy << $shift)) & $mask AS sy, x, y
         |  FROM s$i)""".stripMargin
    }.mkString(",\n")
    QueryDef(
      "zorder_hist",
      s"""WITH base AS (
         |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS x,
         |         CAST(round(l_quantity) AS BIGINT) AS y
         |  FROM lineitem),
         |s0 AS (SELECT x & 4294967295 AS sx, y & 4294967295 AS sy, x, y FROM base),
         |$stages
         |SELECT (sx | (sy << 1)) >> 32 AS zbucket,
         |       CAST(count(*) AS BIGINT) AS n,
         |       CAST(min(x) AS BIGINT) AS min_cents,
         |       CAST(max(x) AS BIGINT) AS max_cents
         |FROM s5
         |GROUP BY 1""".stripMargin) { (spark, dir) =>
      Tables.lineitem(spark, dir)
        .select(
          graft.core.Num.cents(col("l_extendedprice")).as("x"),
          round(col("l_quantity")).cast("long").as("y"))
        .select(
          shiftright(ZOrder2.zorder2(col("x"), col("y")), 32).as("zbucket"),
          col("x"))
        .groupBy(col("zbucket"))
        .agg(
          count(lit(1)).as("n"),
          min(col("x")).as("min_cents"),
          max(col("x")).as("max_cents"))
    }
  }

  /** Write `df` as `nFiles` parquet files clustered by the Z-order of two
    * numeric columns. Coordinates are rank-normalized through approxQuantile
    * bin boundaries (256 bins) rather than global min/max: with min/max a
    * single outlier compresses the real mass of the data into a couple of
    * cells and the curve stops clustering that dimension; quantile bins give
    * every bin ~equal row mass regardless of the value distribution.
    *
    * Null coordinates land in bin 0 (sort lowest, documented); an empty
    * input (or all-null coordinates) writes the frame unclustered — there is
    * nothing to rank.
    */
  def writeZOrdered(
      df: DataFrame, xCol: String, yCol: String, path: String, nFiles: Int,
      bins: Int = 256): Unit = {
    require(bins > 1 && bins <= 65536, s"bins must be in (1, 65536], got $bins")
    val probs = (1 until bins).map(_.toDouble / bins).toArray
    // one pass computes both columns' boundaries (multi-column
    // approxQuantile already ignores nulls/NaNs) — the input is scanned
    // once here and once by the write, not three times
    val Array(xq, yq) =
      df.stat.approxQuantile(Array(xCol, yCol), probs, 0.001)
    if (xq.isEmpty || yq.isEmpty) {
      // empty frame or a coordinate with no non-null values: no rank order
      // to cluster by — plain write instead of an NPE
      df.write.mode("overwrite").parquet(path)
      return
    }
    // bin = number of boundaries at-or-below the value (0..bins-1), scaled
    // to the 16-bit grid; a null comparison falls through to 0 per
    // boundary, so null coordinates deterministically land in bin 0. The
    // chained when-sum stays inside whole-stage codegen (an `aggregate`
    // lambda over a literal array is CodegenFallback and would re-evaluate
    // the cast per element, interpreted).
    def binOf(c: String, bounds: Array[Double]) = {
      val scale = 65536L / bins
      val v = col(c).cast("double")
      bounds.map(b => when(v >= lit(b), lit(1L)).otherwise(lit(0L)))
        .reduce(_ + _) * lit(scale)
    }
    val z = ZOrder2.zorder2(binOf(xCol, xq), binOf(yCol, yq))
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Small-file compaction — the table-maintenance pass every long-lived
    * dataset needs (streaming ingest and partitioned writes both fragment;
    * at 100 TB a file-per-trigger table turns scans into metadata storms
    * and loses min-max pruning). The gate writes a deliberately fragmented
    * copy of the supplier-month rollup (48 shards of a few hundred rows),
    * then compacts by RANGE-repartitioning on the filter column into 4
    * files — bin-packing AND re-clustering in one pass, so each compacted
    * file covers a disjoint suppkey range and per-file min-max statistics
    * prune again. The oracle recomputes the readback aggregate from the
    * base table, proving the rewrite is content-lossless; the file-count
    * drop and the per-file disjointness are spec-asserted (file counts are
    * not SQL-expressible).
    */
  val compactSmallFiles: QueryDef = QueryDef(
    "compact_small_files",
    """SELECT l_suppkey,
      |  CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) AS BIGINT) AS rev_cents,
      |  CAST(count(DISTINCT strftime(l_shipdate, '%Y-%m')) AS BIGINT) AS n_months
      |FROM lineitem
      |GROUP BY l_suppkey""".stripMargin) { (spark, dir) =>
    val (_, compactedPath) = compactFixture(spark, dir)
    spark.read.parquet(compactedPath)
      .groupBy(col("l_suppkey"))
      .agg(
        sum(col("rev_cents")).as("rev_cents"),
        countDistinct(col("month")).as("n_months"))
  }

  /** Writes the fragmented copy and its compaction; returns both paths so
    * the spec can count files. Kept separate from the QueryDef so the gate
    * and the spec drive the identical rewrite.
    */
  def compactFixture(spark: org.apache.spark.sql.SparkSession, dir: String): (String, String) = {
    val fragmented = graft.rentals.Scratch.dir("graft_compact_fragmented")
    val compacted = graft.rentals.Scratch.dir("graft_compact_done")
    val rollup = Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey"), date_format(col("l_shipdate"), "yyyy-MM").as("month"))
      .agg(sum(graft.core.Num.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("rev_cents"))
    rollup.repartition(48).write.mode("overwrite").parquet(fragmented)
    spark.read.parquet(fragmented)
      .repartitionByRange(4, col("l_suppkey"))
      .write.mode("overwrite").parquet(compacted)
    (fragmented, compacted)
  }

  /** Targeted deletion rewrite — the data-removal (right-to-be-forgotten /
    * opt-out) maintenance pass every training-data pipeline needs: given a
    * KEY LIST of users to erase (here: user_id ≡ 0 mod 13, standing in for
    * a removal-request table), anti-join the events table against it,
    * rewrite, and read the result back. The deletion is key-list-driven
    * (LEFT ANTI against a broadcast removal set — the list is request-sized,
    * never fact-sized), not a predicate filter, because real removal
    * requests arrive as keys. The oracle recomputes the post-delete
    * aggregate from the base table, so the rewrite must have removed
    * exactly the listed users and nothing else; the spec additionally
    * proves zero listed keys survive in the written files.
    */
  val targetedDeleteRewrite: QueryDef = QueryDef(
    "targeted_delete_rewrite",
    """SELECT event_type,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(SUM(COALESCE(CAST(round(value * 100) AS BIGINT), 0)) AS BIGINT) AS total_cents
      |FROM events
      |WHERE user_id IS NULL OR user_id % 13 <> 0
      |GROUP BY 1""".stripMargin) { (spark, dir) =>
    // IS NULL arm: a NULL user_id is never in the removal key list (the
    // %13 filter drops it), so the anti-join KEEPS those rows — the
    // oracle's bare `%13 <> 0` would silently exclude them instead
    spark.read.parquet(deleteRewriteFixture(spark, dir))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(coalesce(graft.core.Num.cents(col("value")), lit(0L))).as("total_cents"))
  }

  /** Performs the key-list anti-join delete + rewrite; returns the output
    * path (shared by the gate query and the no-survivors spec).
    */
  def deleteRewriteFixture(spark: org.apache.spark.sql.SparkSession, dir: String): String = {
    val out = graft.rentals.Scratch.dir("graft_delete_rewrite")
    val events = Tables.events(spark, dir)
    val removalRequests = events
      .select(col("user_id")).distinct()
      .filter(col("user_id") % 13 === 0)
      .withColumnRenamed("user_id", "erase_id")
    events
      // no pinned broadcast: the removal list grows with the user base, so
      // the size-based planner/AQE decides (broadcast while it fits, shuffled
      // anti-join once it doesn't)
      .join(removalRequests, col("user_id") === col("erase_id"), "left_anti")
      .write.mode("overwrite").parquet(out)
    out
  }

  /** Dynamic partition overwrite — the incremental-refresh maintenance pass:
    * a recomputed period replaces ONLY its own hive partitions, leaving the
    * rest of the dataset untouched (at 100 TB, rewriting the whole table for
    * one partition's refresh is the difference between minutes and a day).
    * The gate writes the full per-(event_type, day) rollup partitioned by
    * event_type, then "refreshes" the click partition from a RESTRICTED
    * recomputation (second half of the month only) under
    * `partitionOverwriteMode=dynamic`. The oracle states the expected final
    * state — full-month rows for every other type, second-half rows for
    * clicks — so a static overwrite (which would drop the other types) or a
    * plain append (which would duplicate clicks) both fail the hash.
    */
  val dynamicPartitionRefresh: QueryDef = QueryDef(
    "dynamic_partition_refresh",
    """WITH d AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
      |         CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, day, n FROM d WHERE event_type <> 'click'
      |UNION ALL
      |-- dynamic overwrite replaces NO partitions when the refresh frame is
      |-- empty, so the stale full-month click rows survive in that case —
      |-- the oracle states exactly that semantics
      |SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
      |       CAST(count(*) AS BIGINT) AS n
      |FROM events
      |WHERE event_type = 'click'
      |  AND (date_part('day', ts) >= 16
      |       OR NOT EXISTS (SELECT 1 FROM events
      |                      WHERE event_type = 'click' AND date_part('day', ts) >= 16))
      |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
    val sess = spark.newSession()
    sess.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val out = graft.rentals.Scratch.dir("graft_dyn_partition_refresh")
    val events = Tables.events(sess, dir)
    def rollup(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    // generation 1: full refresh (all partitions written)
    rollup(events).write.mode("overwrite")
      .partitionBy("event_type").parquet(out)
    // generation 2: ONE period's recomputation — dynamic mode replaces only
    // the partitions present in this frame (the click directory)
    rollup(events.filter(col("event_type") === "click" && dayofmonth(col("ts")) >= 16))
      .write.mode("overwrite")
      .partitionBy("event_type").parquet(out)
    sess.read.parquet(out).select(col("event_type"), col("day"), col("n"))
  }

  val all: Seq[QueryDef] =
    Seq(zorderHist, compactSmallFiles, targetedDeleteRewrite, dynamicPartitionRefresh)
}
