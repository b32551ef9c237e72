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
    // every registered query must carry a DuckDB oracle — the portable
    // hash family (round 2) removed the last excuse for a rows-only check
    val rowsOnly = qs.keySet -- os.keySet
    assert(rowsOnly === Set.empty[String], rowsOnly)
  }

  test("entry smoke: >0 rows on sf0.001 (t1 contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("no gate query emits a top-level array/map column (driver comparator contract)") {
    // The driver's pandas-based comparator sorts rows with sort_values, which
    // throws on array/map cells (round 4: feature_hashing, inverted_index,
    // sliding_token_windows all erred this way). Nested collections must be
    // CSV-serialized on both engine and oracle sides before the gate.
    import org.apache.spark.sql.types.{ArrayType, MapType}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val bad = fn(spark, "/root/testdata/sf0.001").schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] || f.dataType.isInstanceOf[MapType] =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
      bad
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  test("every oracle SQL references only base tables or self-written scratch") {
    val allowed = graft.core.Tables.names.toSet
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val lower = sql.toLowerCase
      assert(!lower.contains("/root/testdata"), s"$name hardcodes a testdata path")
      assert(
        allowed.exists(t => lower.contains(t)) || lower.contains("target/scratch") ||
          // generated-source queries (the DSv2 connector) replay from range()
          lower.contains("from range("),
        s"$name references no known table")
    }
  }
}
