package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{DataType, LongType, StructType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated test tables (see /root/repo/TESTDATA.md).
  *
  * One parquet file per table under `\$dir/<name>.parquet`. At 100 TB these
  * would be multi-file partitioned datasets; `spark.read.parquet` handles both
  * identically (FileSourceScanExec with partition/file pruning), so nothing
  * here changes at scale.
  *
  * ==Timestamp ingest normalization==
  *
  * This object is the ONE place that owns "upstream parquet physical type →
  * engine TIMESTAMP". Upstream writers have already shipped the same logical
  * instant three different ways across driver testdata generations, and a
  * real 100 TB lake mixes them freely across files and partitions:
  *
  *  - parquet `TIMESTAMP(NANOS)` — Spark has no nanosecond type; with
  *    `spark.sql.legacy.parquet.nanosAsLong` the column surfaces as a nano
  *    `LongType` and is converted with `timestamp_micros(nanos div 1000)`
  *    (matching DuckDB's own nanos→micros truncation, so oracle comparisons
  *    see identical instants);
  *  - parquet `TIMESTAMP(MICROS)` with `isAdjustedToUTC=false` — surfaces as
  *    `TIMESTAMP_NTZ`; the engine session runs in UTC, so a plain cast to
  *    `TIMESTAMP` preserves the instant while restoring the tz-aware type the
  *    whole operator surface (`unix_micros`, watermarks, window()) expects;
  *  - parquet `TIMESTAMP(MICROS)` with `isAdjustedToUTC=true` — already
  *    `TIMESTAMP`; no-op.
  *
  * Every ingest path — batch ([[load]]) and streaming
  * ([[graft.streaming.Streams.readEventsStream]], which probes the batch
  * schema and reuses [[normalizeTs]]) — goes through this conversion, so an
  * upstream writer changing its physical timestamp encoding is absorbed here
  * and nowhere else.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Timestamp-bearing columns per table (candidates for normalization). */
  private val tsCols: Map[String, Seq[String]] = Map(
    "orders" -> Seq("o_orderdate"),
    "lineitem" -> Seq("l_shipdate"),
    "events" -> Seq("ts"))

  /** Timestamp columns the streaming reader must normalize for a table. */
  def tsColsOf(name: String): Seq[String] = tsCols.getOrElse(name, Nil)

  /** The guarded physical-type → engine-TIMESTAMP conversion for one column,
    * keyed on the OBSERVED type (never on an assumed upstream encoding).
    * Returns None when the column is already engine-typed.
    */
  def tsNormalizeExpr(observed: DataType, c: String): Option[Column] = observed match {
    case LongType         => Some(expr(s"timestamp_micros(`$c` div 1000)")) // TIMESTAMP(NANOS) read as nano longs
    case TimestampNTZType => Some(col(c).cast(TimestampType))               // UTC session ⇒ identical instant
    case _                => None                                           // TIMESTAMP (or non-ts column): no-op
  }

  /** Apply [[tsNormalizeExpr]] to each named column present in `df`. Safe on
    * any frame shape (missing columns skipped), batch or streaming.
    */
  def normalizeTs(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      d.schema.fields.find(_.name == c)
        .flatMap(f => tsNormalizeExpr(f.dataType, c))
        .map(e => d.withColumn(c, e))
        .getOrElse(d)
    }

  /** The RAW (pre-normalization) schema of a table's parquet files — what a
    * streaming file source must declare, since it cannot infer mid-stream.
    * Footer-only read: cheap at any scale.
    */
  def rawSchema(spark: SparkSession, dir: String, name: String): StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet").schema
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(s"$dir/$name.parquet"), tsColsOf(name))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
