package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[Ranking.globalRankBy]] — the range-partitioned global rank must equal
  * the single-window `row_number` on any input, including empty frames,
  * duplicate sort keys (broken by the tiebreak column), and frames whose
  * partition count exceeds the row count.
  */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  private def reference(df: org.apache.spark.sql.DataFrame, cols: Seq[String]) =
    df.withColumn(
      "expected",
      row_number().over(Window.orderBy(cols.map(col): _*)).cast("long"))

  test("matches the single-window row_number on a shuffled fixture") {
    val df = Seq(
      (5L, 30L), (1L, 10L), (3L, 10L), (2L, 20L), (4L, 10L),
      (9L, 5L), (7L, 40L), (6L, 5L), (8L, 20L), (10L, 1L))
      .toDF("id", "size")
    val got = Ranking.globalRankBy(df, Seq("size", "id"), "rank")
    val joined = reference(df, Seq("size", "id"))
      .join(got, Seq("id", "size"))
    assert(joined.filter(col("rank") =!= col("expected")).count() === 0)
    assert(got.count() === 10)
    // ranks are exactly 1..n — a permutation, no gaps or dupes
    assert(
      got.agg(min("rank"), max("rank"), countDistinct("rank")).as[(Long, Long, Long)].head()
        === ((1L, 10L, 10L)))
  }

  test("duplicate sort keys resolve through the tiebreak column") {
    val df = Seq.tabulate(50)(i => (i.toLong, 7L)).toDF("id", "size")
    val got = Ranking.globalRankBy(df, Seq("size", "id"), "rank")
      .orderBy("rank").select("id").as[Long].collect()
    assert(got.toSeq === (0L until 50L))
  }

  test("empty input yields an empty ranked frame") {
    val df = Seq.empty[(Long, Long)].toDF("id", "size")
    assert(Ranking.globalRankBy(df, Seq("size", "id"), "rank").count() === 0)
  }

  test("more shuffle partitions than rows (sparse range partitions)") {
    val df = Seq((1L, 2L), (2L, 1L)).toDF("id", "size")
    val got = Ranking.globalRankBy(df, Seq("size", "id"), "rank")
      .orderBy("rank").select("id").as[Long].collect()
    assert(got.toSeq === Seq(2L, 1L))
  }

  test("globalRunningSumBy equals a single-window running sum on a signed stream") {
    import spark.implicits._
    val rows = (1L to 500L).map(i => (i, if (i % 3 == 0) -1L else 1L))
    val df = rows.toDF("pos", "delta").repartition(7)
    val got = Ranking.globalRunningSumBy(df, Seq("pos"), "delta", "cum")
      .orderBy("pos").select("pos", "cum").as[(Long, Long)].collect()
    var acc = 0L
    val expected = rows.sortBy(_._1).map { case (p, d) => acc += d; (p, acc) }
    assert(got.toSeq === expected)
  }

  test("peak_concurrency matches a direct sweep over the sessionized intervals") {
    val dir = "/root/testdata/sf0.001"
    val r = Events.peakConcurrency.fn(spark, dir).collect().head
    val sessions = Events.sessionizeEvents.fn(spark, dir)
      .select("user_id", "session_seq", "session_start", "session_end")
      .collect()
      .map(x => (x.getTimestamp(2), x.getTimestamp(3), x.getLong(0), x.getLong(1)))
    // direct sweep: starts before ends at equal instants, ties by (user, seq)
    val boundaries = sessions.flatMap { case (s, e, u, q) =>
      Seq((s, 0, 1L, u, q), (e, 1, -1L, u, q))
    }.sortBy(b => (b._1.getTime / 1000, b._1.getNanos, b._2, b._4, b._5))
    var acc = 0L; var peak = 0L; var peakTs: java.sql.Timestamp = null
    boundaries.foreach { b =>
      acc += b._3
      if (acc > peak) { peak = acc; peakTs = b._1 }
    }
    assert(r.getAs[Long]("peak_concurrency") === peak)
    assert(r.getAs[java.sql.Timestamp]("peak_ts") === peakTs)
    assert(r.getAs[Long]("n_sessions") === sessions.length.toLong)
    assert(acc === 0L, "sweep returns to zero")
  }
}
