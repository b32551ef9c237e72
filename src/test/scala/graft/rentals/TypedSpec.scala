package graft.rentals

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TypedSpec extends SparkSpec {

  private def long19 = mkDf(Fixtures.longSchema, Fixtures.longRows)

  test("typed facade round-trips the long shape with identical clean/dedup semantics") {
    val ds = Typed.asZori(long19)
    assert(ds.count() === 19)
    val typedOut = Typed.deduplicate(Typed.cleanNulls(ds))
    val untypedOut = long19.transform(Transforms.cleanNulls).transform(Transforms.deduplicate)
    assert(typedOut.count() === untypedOut.count())
    assert(
      typedOut.toDF().collect().map(_.toString).sorted.toSeq ===
        untypedOut.collect().map(_.toString).sorted.toSeq)
  }

  test("typed and untyped dedup pick the SAME survivor when duplicate keys differ in value") {
    import spark.implicits._
    // three rows per key with different rents — an arbitrary-survivor dedup
    // would make the two facades diverge; both must keep the tiebreak minimum
    val rows = Seq(
      ZoriRow(1, "r1", "CA", java.sql.Date.valueOf("2024-01-01"), Some(3000.0)),
      ZoriRow(1, "r1", "CA", java.sql.Date.valueOf("2024-01-01"), Some(1000.0)),
      ZoriRow(1, "r1", "CA", java.sql.Date.valueOf("2024-01-01"), Some(2000.0)),
      ZoriRow(1, "r0", "CA", java.sql.Date.valueOf("2024-02-01"), Some(700.0)),
      ZoriRow(1, "r9", "CA", java.sql.Date.valueOf("2024-02-01"), Some(600.0)))
    val ds = rows.toDS().repartition(4)
    val typed = Typed.deduplicate(ds).collect().map(_.toString).sorted.toSeq
    val untyped = Transforms.deduplicate(ds.toDF()).as[ZoriRow]
      .collect().map(_.toString).sorted.toSeq
    assert(typed === untyped)
    assert(typed.length === 2)
    // Feb survivor: minimum by (RegionName, ...) => r0/700, not r9/600
    assert(typed.exists(_.contains("r0")))
  }

  test("typed groupByKey aggregation matches the untyped aggregate") {
    val ds = Typed.cleanNulls(Typed.asZori(long19))
    val typed = Typed.meanRentByState(spark, ds).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val untyped = ds.toDF().groupBy(col("StateName"))
      .agg(avg(col("median_rent")).as("mean_rent"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(typed.keySet === untyped.keySet)
    typed.foreach { case (k, (m, n)) =>
      assert(n === untyped(k)._2)
      assert(math.abs(m - untyped(k)._1) < 1e-9)
    }
  }
}
