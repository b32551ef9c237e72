package graft.plans

import java.sql.Timestamp

import graft.SparkSpec
import graft.ops.Events
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

class AsofJoinNativeSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("native asof: each click gets the latest purchase at-or-before it") {
    withTempDir { dir =>
      import spark.implicits._
      val events = Seq(
        (1L, ts("2024-01-01 09:00:00"), 1L, "click", 0.0, "{}"),
        (2L, ts("2024-01-01 10:00:00"), 1L, "purchase", 5.0, "{}"),
        (3L, ts("2024-01-01 10:30:00"), 1L, "click", 0.0, "{}"),
        (4L, ts("2024-01-01 11:00:00"), 1L, "purchase", 7.0, "{}"),
        (5L, ts("2024-01-01 11:00:00"), 1L, "click", 0.0, "{}"), // equal ts -> 7.0
        (6L, ts("2024-01-01 12:00:00"), 2L, "click", 0.0, "{}") // other user, no purchase
      ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      events.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

      val out = Events.asofJoinNative.fn(spark, dir.getAbsolutePath)
        .collect()
        .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
        .toMap
      assert(out === Map(
        1L -> None,
        3L -> Some(500L),
        5L -> Some(700L),
        6L -> None))
    }
  }

  test("native asof: null left time matches nothing; null right time never matches") {
    import spark.implicits._
    val left = Seq(
      (1L, Option(ts("2024-01-01 10:00:00"))),
      (2L, Option.empty[Timestamp])
    ).toDF("id", "t")
    val right = Seq(
      (1L, Option(ts("2024-01-01 09:00:00")), "ok"),
      (1L, Option.empty[Timestamp], "nullts"),
      (2L, Option(ts("2024-01-01 09:00:00")), "neverLeft")
    ).toDF("rid", "rt", "tag").withColumn("key", lit(1L))
    val l2 = left.withColumn("key", lit(1L))
    val out = AsofJoinNative.asof(l2, right.filter(col("rid") === col("key")),
      Seq("key" -> "key"), "t", "rt")
      .select(col("id"), col("tag"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out === Map(1L -> Some("ok"), 2L -> None))
  }

  test("native asof matches the composed window form on the real events table") {
    val sf = "/root/testdata/sf0.01"
    val native = Events.asofJoinNative.fn(spark, sf).collect()
      .map(r => (r.getLong(0), Option(r.get(3)))).toMap
    val composed = Events.asofJoin.fn(spark, sf).collect()
      .map(r => (r.getLong(0), Option(r.get(3)))).toMap
    assert(native.nonEmpty)
    assert(native === composed)
  }

  test("physical plan: AsofJoinExec with one hash exchange per side, no window/union") {
    val sf = "/root/testdata/sf0.001"
    val df = Events.asofJoinNative.fn(spark, sf)
    df.write.mode("overwrite").format("noop").save() // finalize AQE plan
    val plan = df.queryExecution.executedPlan
    val asofs = collect(plan) { case e: AsofJoinExec => e }
    assert(asofs.nonEmpty, plan.toString)
    val shuffles = collect(plan) { case s: ShuffleExchangeExec => s }
    // one exchange per input, shared with the purchase-side dedup window
    assert(shuffles.size == 2, plan.toString)
    val windows = collect(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    // only the purchase-side dedup window; the asof itself adds none
    assert(windows.size <= 1, plan.toString)
  }

  test("native asof widens mismatched key/time types instead of comparing raw bytes") {
    import spark.implicits._
    // int keys + int times on the left, long on the right — without the
    // builder's Cast alignment the long ordering would read garbage
    val left = Seq((1, 10), (1, 30), (2, 25)).toDF("k", "t")
    val right = Seq((1L, 5L, "a"), (1L, 20L, "b"), (2L, 40L, "late")).toDF("rk", "rt", "tag")
    val out = AsofJoinNative.asof(left, right, Seq("k" -> "rk"), "t", "rt")
      .select(col("k"), col("t"), col("tag"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> Option(r.getString(2))).toMap
    assert(out === Map((1, 10) -> Some("a"), (1, 30) -> Some("b"), (2, 25) -> None))
  }

  test("native asof rejects keys with no common type") {
    import spark.implicits._
    val left = Seq(("x", 1L)).toDF("k", "t")
    val right = Seq((java.sql.Date.valueOf("2024-01-01"), 1L, "v")).toDF("rk", "rt", "tag")
    val e = intercept[IllegalArgumentException] {
      AsofJoinNative.asof(left, right, Seq("k" -> "rk"), "t", "rt")
    }
    assert(e.getMessage.contains("incompatible"))
  }

  test("native asof null keys follow SQL equality: never match on either side") {
    import spark.implicits._
    val left = Seq(
      (Option(1L), 10L, "has-key"),
      (Option.empty[Long], 10L, "null-key")
    ).toDF("k", "t", "side")
    val right = Seq(
      (Option(1L), 5L, "match"),
      (Option.empty[Long], 1L, "null-right") // would sort first; must be skipped
    ).toDF("rk", "rt", "tag")
    val out = AsofJoinNative.asof(left, right, Seq("k" -> "rk"), "t", "rt")
      .select(col("side"), col("tag"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out === Map("has-key" -> Some("match"), "null-key" -> None))
  }

  test("native asof with an empty right side keeps every left row with nulls") {
    import spark.implicits._
    val left = Seq((1L, 10L), (2L, 20L)).toDF("k", "t")
    val right = Seq.empty[(Long, Long, String)].toDF("rk", "rt", "payload")
    val out = AsofJoinNative.asof(left, right, Seq("k" -> "rk"), "t", "rt").collect()
    assert(out.length === 2)
    assert(out.forall(_.isNullAt(3)))
  }

  test("forward asof: each left row gets the earliest right at-or-after; ties match") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 35L, "c"), (2L, 5L, "other"))
      .toDF("k", "t", "who")
    val right = Seq((1L, 20L, "at20"), (1L, 30L, "at30"), (1L, 9L, "dead"))
      .toDF("rk", "rt", "tag")
    val out = AsofJoinNative.asof(left, right, Seq("k" -> "rk"), "t", "rt",
      direction = "forward")
      .select(col("who"), col("tag"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    // t=10 -> earliest >= 10 is 20; t=20 -> equal matches; t=35 -> none left
    assert(out === Map(
      "a" -> Some("at20"), "b" -> Some("at20"), "c" -> None, "other" -> None))
  }

  test("forward asof null semantics: null keys/times match nothing, null right skipped") {
    import spark.implicits._
    val left = Seq(
      (Option(1L), Option(10L), "ok"),
      (Option.empty[Long], Option(10L), "null-key"),
      (Option(1L), Option.empty[Long], "null-time")
    ).toDF("k", "t", "side")
    val right = Seq(
      (Option.empty[Long], Option(1L), "null-rk"),
      (Option(1L), Option.empty[Long], "null-rt"),
      (Option(1L), Option(50L), "match")
    ).toDF("rk", "rt", "tag")
    val out = AsofJoinNative.asof(left, right, Seq("k" -> "rk"), "t", "rt",
      direction = "forward")
      .select(col("side"), col("tag"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out === Map("ok" -> Some("match"), "null-key" -> None, "null-time" -> None))
  }

  test("forward asof brute-force equivalence on a grid with duplicate left times") {
    import spark.implicits._
    val left = (1 to 30).flatMap(k => (1 to 20).map(t => (k.toLong, t.toLong * 10)))
      .toDF("k", "t").repartition(7)
    val right = (1 to 30).flatMap(k => (1 to 15).map(t => (k.toLong, t.toLong * 13, k * 1000L + t)))
      .toDF("rk", "rt", "payload").repartition(5)
    val out = AsofJoinNative.asof(left, right, Seq("k" -> "rk"), "t", "rt",
      direction = "forward")
      .select(col("k"), col("t"), col("payload"))
      .collect()
    assert(out.length === 30 * 20)
    out.foreach { r =>
      val (k, t) = (r.getLong(0), r.getLong(1))
      val expected = (1 to 15).map(_ * 13L).filter(_ >= t).headOption.map(rt => k * 1000L + rt / 13)
      assert(Option(r.get(2)) === expected, s"k=$k t=$t")
    }
  }

  test("tolerance gates both directions without disturbing the match choice") {
    import spark.implicits._
    val left = Seq((1L, 100L, "l1"), (1L, 200L, "l2")).toDF("k", "t", "who")
    val right = Seq((1L, 95L, "r95"), (1L, 230L, "r230")).toDF("rk", "rt", "tag")
    // backward, tol 10: l1 matches r95 (gap 5); l2's latest-before is r95 (gap 105) -> null
    val back = AsofJoinNative.asof(left, right, Seq("k" -> "rk"), "t", "rt",
      tolerance = Some(10L))
      .select(col("who"), col("tag"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(back === Map("l1" -> Some("r95"), "l2" -> None))
    // forward, tol 40: l1's earliest-after is r230 (gap 130) -> null; l2 matches (gap 30)
    val fwdOut = AsofJoinNative.asof(left, right, Seq("k" -> "rk"), "t", "rt",
      direction = "forward", tolerance = Some(40L))
      .select(col("who"), col("tag"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(fwdOut === Map("l1" -> None, "l2" -> Some("r230")))
  }

  test("asof builder rejects bad directions, negative tolerance, non-integral time") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 5L, "v")).toDF("rk", "rt", "tag")
    assert(intercept[IllegalArgumentException] {
      AsofJoinNative.asof(left, right, Seq("k" -> "rk"), "t", "rt", direction = "nearest")
    }.getMessage.contains("direction"))
    assert(intercept[IllegalArgumentException] {
      AsofJoinNative.asof(left, right, Seq("k" -> "rk"), "t", "rt", tolerance = Some(-1L))
    }.getMessage.contains("non-negative"))
    val dleft = Seq((1L, 1.5)).toDF("k", "t")
    val dright = Seq((1L, 1.0, "v")).toDF("rk", "rt", "tag")
    assert(intercept[IllegalArgumentException] {
      AsofJoinNative.asof(dleft, dright, Seq("k" -> "rk"), "t", "rt", tolerance = Some(1L))
    }.getMessage.contains("integer-comparable"))
  }

  test("native asof streams grouped duplicates and unsorted partition counts correctly") {
    import spark.implicits._
    // many keys x many times, values chosen so expected answer is computable
    val left = (1 to 50).flatMap(k => (1 to 20).map(t => (k.toLong, t.toLong * 10)))
      .toDF("k", "t").repartition(7)
    val right = (1 to 50).flatMap(k => (1 to 15).map(t => (k.toLong, t.toLong * 13, k * 1000L + t)))
      .toDF("rk", "rt", "payload").repartition(5)
    val out = AsofJoinNative.asof(left, right, Seq("k" -> "rk"), "t", "rt")
      .select(col("k"), col("t"), col("payload"))
      .collect()
    assert(out.length === 50 * 20)
    out.foreach { r =>
      val (k, t) = (r.getLong(0), r.getLong(1))
      val expected = (1 to 15).map(_ * 13L).filter(_ <= t).lastOption.map(rt => k * 1000L + rt / 13)
      assert(Option(r.get(2)) === expected, s"k=$k t=$t")
    }
  }
}
