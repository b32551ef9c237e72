package graft.rentals

import java.sql.Date

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Ports of the reference fixtures (see /root/repo/FIXTURES.md).
  */
object Fixtures {

  /** Wide all-string raw mock (`tests/test_transform.py:33-48`): 2 regions ×
    * 3 month columns, one null rent, plus to-be-dropped SizeRank/RegionType.
    */
  val wideSchema: StructType = StructType(
    Seq("RegionID", "SizeRank", "RegionName", "RegionType", "StateName",
      "2024-01", "2024-02", "2024-03").map(StructField(_, StringType, nullable = true)))

  val wideRows: Seq[Row] = Seq(
    Row("102001", "1", "New York", "msa", "NY", "3450.0", "3475.0", "3520.0"),
    Row("394913", "2", "San Francisco", "msa", "CA", "3150.0", "3200.0", null))

  /** Long-format 19-row fixture (`tests/conftest.py:52-88`): 3 regions × 6
    * months (18) + 1 exact duplicate (SF 2024-02); nulls at NY 2024-01 and
    * Austin 2024-03.
    */
  val longSchema: StructType = Schemas.longSchema

  private def d(m: Int) = Date.valueOf(f"2024-$m%02d-01")

  val longRows: Seq[Row] = {
    val regions = Seq(
      (102001, "New York", "NY"),
      (394913, "San Francisco", "CA"),
      (394514, "Austin", "TX"))
    val base = for {
      ((id, name, st), ri) <- regions.zipWithIndex
      m <- 1 to 6
    } yield {
      val rent: java.lang.Double =
        if (id == 102001 && m == 1) null // engineered null (NY 2024-01)
        else if (id == 394514 && m == 3) null // engineered null (Austin 2024-03)
        else 2000.0 + ri * 500 + m * 10
      Row(id, name, st, d(m), rent)
    }
    // exact-duplicate row: SF 2024-02 (`tests/conftest.py:75`)
    base :+ Row(394913, "San Francisco", "CA", d(2), 2000.0 + 1 * 500 + 2 * 10)
  }

  /** MoM golden input (`tests/test_transform.py:90-108`): one region, rents
    * 2000 -> 2100 -> 2079 => mom null, 5.0, -1.0.
    */
  val momRows: Seq[Row] = Seq(
    Row(1, "R", "ST", d(1), 2000.0),
    Row(1, "R", "ST", d(2), 2100.0),
    Row(1, "R", "ST", d(3), 2079.0))

  /** Rank golden input (`tests/test_transform.py:111-127`): one state/month;
    * desc-rent ranks New York=1, Albany=2, Buffalo=3.
    */
  val rankRows: Seq[Row] = Seq(
    Row(3, "Buffalo", "NY", d(1), 1500.0),
    Row(1, "New York", "NY", d(1), 3500.0),
    Row(2, "Albany", "NY", d(1), 1800.0))

  /** DQ micro-frame schema (`tests/test_data_quality.py:22-33`). */
  val dqSchema: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = true),
    StructField("region", StringType, nullable = true),
    StructField("rent", DoubleType, nullable = true)))

  def dqRows(rents: Seq[java.lang.Double]): Seq[Row] =
    rents.zipWithIndex.map { case (r, i) => Row(i + 1, s"r$i", r) }
}
