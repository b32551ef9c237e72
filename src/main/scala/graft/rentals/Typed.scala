package graft.rentals

import java.sql.Date

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Typed view of the canonical long shape (`SURVEY.md §1`: optional
  * `Dataset[ZoriRow]` for the processed model). Field names/types mirror
  * `Schemas.longSchema`; the typed facade gives compile-time field checks to
  * downstream Scala consumers while every transform still runs on the same
  * Catalyst plan (case-class `Encoder`s are schema projections, not a
  * different execution path).
  */
final case class ZoriRow(
    RegionID: Int,
    RegionName: String,
    StateName: String,
    month: Date,
    median_rent: Option[Double])

object Typed {

  /** Long-shape DataFrame -> typed Dataset. */
  def asZori(df: DataFrame): Dataset[ZoriRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.as[ZoriRow]
  }

  /** Typed equivalents of the cleaning stages — same semantics as
    * [[Transforms.cleanNulls]]/[[Transforms.deduplicate]], expressed against
    * the typed fields (filters/keys checked at compile time).
    */
  def cleanNulls(ds: Dataset[ZoriRow]): Dataset[ZoriRow] =
    ds.filter(_.median_rent.isDefined)

  /** Spark's string sort order: unsigned UTF-8 byte comparison (UTF8String),
    * which differs from Scala's UTF-16 code-unit `Ordering[String]` for
    * supplementary-plane characters.
    */
  private val utf8Order: Ordering[String] = new Ordering[String] {
    override def compare(a: String, b: String): Int = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = (x(i) & 0xFF) - (y(i) & 0xFF)
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
    }
  }

  def deduplicate(ds: Dataset[ZoriRow]): Dataset[ZoriRow] = {
    // Same deterministic-survivor semantics as [[Transforms.deduplicate]]:
    // the minimum under the name-sorted tiebreak order (RegionName,
    // StateName, median_rent) with nulls first, per (RegionID, month).
    // Ordering details match Spark's sort exactly: strings compare as
    // unsigned UTF-8 bytes (not UTF-16 code units) and -0.0 == 0.0 (Spark
    // normalizes signed zero before sorting). groupByKey + reduceGroups
    // keeps the facades identical on ANY input, not just on fixtures whose
    // duplicates are full-row copies.
    val spark = ds.sparkSession
    import spark.implicits._
    implicit val optStr: Ordering[Option[String]] = Ordering.Option(utf8Order)
    implicit val optDouble: Ordering[Option[Double]] =
      Ordering.Option(Ordering.Double.TotalOrdering)
    val rowOrd: Ordering[ZoriRow] =
      Ordering.by((r: ZoriRow) =>
        (Option(r.RegionName), Option(r.StateName),
          r.median_rent.map(v => if (v == 0.0) 0.0 else v)))
    ds.groupByKey(r => (r.RegionID, Option(r.month).map(_.toString)))
      .reduceGroups((a: ZoriRow, b: ZoriRow) => rowOrd.min(a, b))
      .map(_._2)
  }

  /** Typed aggregation example: mean rent per state via groupByKey. */
  def meanRentByState(spark: SparkSession, ds: Dataset[ZoriRow]): DataFrame = {
    import spark.implicits._
    ds.flatMap(r => r.median_rent.map(v => (r.StateName, v)))
      .groupByKey(_._1)
      .agg(
        org.apache.spark.sql.expressions.scalalang.typed.avg[(String, Double)](_._2).name("mean_rent"),
        org.apache.spark.sql.expressions.scalalang.typed.count[(String, Double)](_._1).name("n"))
      .toDF("StateName", "mean_rent", "n")
  }
}
