package graft.ops

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join: each click gets the latest purchase at-or-before it") {
    withTempDir { dir =>
      import spark.implicits._
      val events = Seq(
        // (event_id, ts, user_id, event_type, value, props)
        (1L, ts("2024-01-01 09:00:00"), 1L, "click", 0.0, "{}"),
        (2L, ts("2024-01-01 10:00:00"), 1L, "purchase", 5.0, "{}"),
        (3L, ts("2024-01-01 10:30:00"), 1L, "click", 0.0, "{}"),
        (4L, ts("2024-01-01 11:00:00"), 1L, "purchase", 7.0, "{}"),
        (5L, ts("2024-01-01 11:00:00"), 1L, "click", 0.0, "{}"), // equal ts -> 7.0
        (6L, ts("2024-01-01 12:00:00"), 2L, "click", 0.0, "{}") // other user, no purchase
      ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      events.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

      val out = Events.asofJoin.fn(spark, dir.getAbsolutePath)
        .orderBy("event_id")
        .collect()
        .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
        .toMap
      assert(out === Map(
        1L -> None, // click before any purchase
        3L -> Some(500L), // latest purchase at 10:00
        5L -> Some(700L), // purchase at the same instant counts ("at or before")
        6L -> None)) // user with no purchases
    }
  }

  test("asof join with duplicate-ts purchases keeps the max event_id row") {
    withTempDir { dir =>
      import spark.implicits._
      val events = Seq(
        (10L, ts("2024-01-01 10:00:00"), 1L, "purchase", 1.0, "{}"),
        (11L, ts("2024-01-01 10:00:00"), 1L, "purchase", 9.0, "{}"), // survivor
        (12L, ts("2024-01-01 10:30:00"), 1L, "click", 0.0, "{}")
      ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      events.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
      val out = Events.asofJoin.fn(spark, dir.getAbsolutePath).collect()
      assert(out.length === 1)
      assert(out.head.getLong(3) === 900L)
    }
  }
}
