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
}
