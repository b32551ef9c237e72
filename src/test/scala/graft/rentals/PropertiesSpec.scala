package graft.rentals

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties for the pipeline algebra (SURVEY.md §5). */
class PropertiesSpec extends SparkSpec {

  def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(res.passed, res.status.toString)
  }

  test("unpivot arity: rows == regions x month-columns for any wide frame") {
    val genMonths = Gen.chooseNum(1, 8)
    val genRegions = Gen.chooseNum(1, 6)
    checkProp(Prop.forAll(genMonths, genRegions) { (nMonths, nRegions) =>
      val months = (1 to nMonths).map(m => f"2024-$m%02d")
      val schema = org.apache.spark.sql.types.StructType(
        (Seq("RegionID", "RegionName", "StateName") ++ months).map(c =>
          org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.StringType)))
      val rows = (1 to nRegions).map { r =>
        Row.fromSeq(Seq(r.toString, s"R$r", "ST") ++ months.map(m => "100.0"))
      }
      val out = mkDf(schema, rows).transform(Transforms.enforceSchema).transform(Transforms.unpivotMonthly)
      out.count() == nMonths.toLong * nRegions
    })
  }

  test("MoM algebra: round(((b - a) / a) * 100, 2) for any positive rent pair") {
    val genRent = Gen.chooseNum(1, 500000).map(_ / 100.0)
    checkProp(Prop.forAll(genRent, genRent) { (a, b) =>
      val rows = Seq(
        Row(1, "R", "ST", java.sql.Date.valueOf("2024-01-01"), a),
        Row(1, "R", "ST", java.sql.Date.valueOf("2024-02-01"), b))
      val out = Transforms.addMomChange(mkDf(Fixtures.longSchema, rows))
        .orderBy("month").select("rent_change_mom").collect()
      val expected = BigDecimal(((b - a) / a) * 100)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      out(0).isNullAt(0) && out(1).getDouble(0) == expected
    })
  }

  test("clean ∘ dedup is idempotent and order-insensitive on the fixture") {
    val df = mkDf(Fixtures.longSchema, Fixtures.longRows)
    val once = Transforms.deduplicate(Transforms.cleanNulls(df))
    val twice = Transforms.deduplicate(Transforms.cleanNulls(once))
    assert(once.count() === twice.count())
    val swapped = Transforms.cleanNulls(Transforms.deduplicate(df))
    // dedup-then-clean can only differ if a null-rent survivor displaced a
    // non-null duplicate — fixture dupes are identical rows, so counts match
    assert(swapped.count() === once.count())
  }
}
