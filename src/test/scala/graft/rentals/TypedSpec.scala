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
