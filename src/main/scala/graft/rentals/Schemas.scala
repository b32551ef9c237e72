package graft.rentals

import org.apache.spark.sql.types._

/** Schema synthesis for the wide (raw) rental-index shape.
  *
  * Re-design of the reference's explicit-schema discipline
  * (`jobs/io_utils.py:13-53`): fixed descriptor columns get declared types, a
  * column whose *name* is a date (`^\d{4}-\d{2}(-\d{2})?$`) is a monthly
  * measure (`DoubleType`), anything else falls back to `StringType`. Schema
  * inference is never used — at 100 TB an `inferSchema` pass is a full extra
  * scan of the data; a header-only read is O(1).
  */
object Schemas {
  /** `jobs/io_utils.py:21` / `jobs/transform.py:14` */
  val dateColPattern = "^\\d{4}-\\d{2}(-\\d{2})?$".r

  def isDateCol(name: String): Boolean = dateColPattern.matches(name)

  /** `_FIXED_FIELDS`, `jobs/io_utils.py:23-29`. */
  val fixedFields: Seq[(String, DataType)] = Seq(
    "RegionID" -> IntegerType,
    "SizeRank" -> IntegerType,
    "RegionName" -> StringType,
    "RegionType" -> StringType,
    "StateName" -> StringType)

  private val fixedMap: Map[String, DataType] = fixedFields.toMap

  /** Typing rule of `_build_zori_schema` (`jobs/io_utils.py:46-52`). */
  def typeFor(name: String): DataType =
    fixedMap.getOrElse(name, if (isDateCol(name)) DoubleType else StringType)

  /** Header names -> typed StructType (`jobs/io_utils.py:32-53`). */
  def buildWideSchema(columns: Seq[String]): StructType =
    StructType(columns.map(c => StructField(c, typeFor(c), nullable = true)))

  /** Canonical long (processed) shape (`tests/conftest.py:36-44`). */
  val longSchema: StructType = StructType(Seq(
    StructField("RegionID", IntegerType, nullable = false),
    StructField("RegionName", StringType, nullable = true),
    StructField("StateName", StringType, nullable = true),
    StructField("month", DateType, nullable = true),
    StructField("median_rent", DoubleType, nullable = true)))
}
