package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.TimestampType

/** Upstream-writer type-drift regression: the SAME logical instants stored
  * under the three physical timestamp encodings real parquet writers produce
  * must surface identically through BOTH ingest paths (batch `Tables.events`
  * and streaming `Streams.readEventsStream`).
  *
  * Round-6 post-mortem: the driver regenerated testdata, switching `events.ts`
  * from TIMESTAMP(NANOS)-as-long to TIMESTAMP(MICROS)/NTZ, and the streaming
  * reader's hardcoded nano-long assumption silently collapsed a month of
  * events into ~43 minutes (micros div 1000), breaking 11 gate queries. This
  * spec makes that class of drift a local test failure instead.
  */
class TypeDriftSpec extends SparkSpec {

  /** The canonical instants, second-granular, as engine TIMESTAMP. */
  private def canonical() = {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    Seq(
      (1L, t("2024-01-01 08:30:00"), 10L, "click", 1.0, "{}"),
      (2L, t("2024-01-05 09:15:30"), 11L, "view", 2.0, "{}"),
      (3L, t("2024-01-20 23:59:59"), 10L, "purchase", 3.5, "{}"),
      (4L, t("2024-01-31 00:00:01"), 12L, "click", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** Write the fixture under one physical ts encoding. */
  private def writeAs(encoding: String, dir: String): Unit = {
    val base = canonical()
    val df = encoding match {
      case "nanos_as_long" => base.withColumn("ts", expr("unix_micros(ts) * 1000"))
      case "micros_ntz"    => base.withColumn("ts", col("ts").cast("timestamp_ntz"))
      case "micros_tz"     => base // TimestampType → parquet isAdjustedToUTC=true
    }
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private val encodings = Seq("nanos_as_long", "micros_ntz", "micros_tz")

  test("batch ingest: identical instants and engine TIMESTAMP type under all three encodings") {
    val perEncoding = encodings.map { enc =>
      withTempDir { dir =>
        writeAs(enc, dir.getAbsolutePath)
        val df = Tables.events(spark, dir.getAbsolutePath)
        assert(df.schema("ts").dataType === TimestampType,
          s"$enc: ts must normalize to TIMESTAMP, got ${df.schema("ts").dataType}")
        enc -> df.select(col("event_id"), unix_micros(col("ts")).as("us"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
    }.toMap
    val expected = canonical()
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    perEncoding.foreach { case (enc, got) =>
      assert(got === expected, s"batch instants drifted under $enc")
    }
  }

  test("streaming ingest: identical instants under all three encodings") {
    val expected = canonical()
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    encodings.foreach { enc =>
      withTempDir { dir =>
        writeAs(enc, dir.getAbsolutePath)
        val streamed = graft.streaming.Streams
          .readEventsStream(spark, dir.getAbsolutePath)
          .select(col("event_id"), unix_micros(col("ts")).as("us"))
        val out = graft.streaming.Streams.runAvailableNowToMemory(
          spark, streamed, s"type_drift_$enc", OutputMode.Append())
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(out === expected, s"streaming instants drifted under $enc")
      }
    }
  }

  test("batch and streaming ingest agree row-for-row on the driver testdata") {
    val sf = "/root/testdata/sf0.001"
    val batch = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = graft.streaming.Streams.readEventsStream(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    val out = graft.streaming.Streams.runAvailableNowToMemory(
      spark, streamed, "type_drift_sf", OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === batch)
  }
}
