package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract meta-guards: keep the SparkEntry surface consistent as
  * queries are added in later rounds.
  */
class SparkEntrySpec extends SparkSpec {

  test("every oracle key has a query; names are unique and well-formed") {
    val qs = SparkEntry.queries
    val os = SparkEntry.oracleSql
    assert(os.keySet.subsetOf(qs.keySet), os.keySet -- qs.keySet)
    assert(qs.keySet.forall(_.matches("[a-z0-9_]+")), qs.keySet.filterNot(_.matches("[a-z0-9_]+")))
    // rows-only queries are a deliberate, documented set (hash-family ops)
    val rowsOnly = qs.keySet -- os.keySet
    assert(rowsOnly === Set.empty[String], rowsOnly)
  }

  test("entry smoke: >0 rows on sf0.001 (t1 contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle SQL references only base tables or self-written scratch") {
    val allowed = graft.core.Tables.names.toSet
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val lower = sql.toLowerCase
      assert(!lower.contains("/root/testdata"), s"$name hardcodes a testdata path")
      assert(
        allowed.exists(t => lower.contains(t)) || lower.contains("target/scratch"),
        s"$name references no known table")
    }
  }
}
