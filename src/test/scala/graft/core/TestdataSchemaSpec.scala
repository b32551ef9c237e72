package graft.core

import graft.SparkSpec

/** Driver-testdata schema SENTINEL: one precise failure per drifted column
  * instead of dozens of cryptic downstream reds.
  *
  * The driver regenerates /root/testdata between rounds, and physical
  * encodings have already drifted once (round 6: `events.ts` switched from
  * TIMESTAMP(NANOS)-as-long to TIMESTAMP(MICROS)/NTZ, breaking 11 queries
  * whose root cause took a round to land). `Tables.normalizeTs` +
  * `TypeDriftSpec` absorb TIMESTAMP drift; this spec watches EVERYTHING
  * else: if any table's engine-visible (post-load) column set or type
  * changes, the failure message names the exact table/column/type diff —
  * the round's first `sbt test` then reports the drift directly.
  *
  * On a legitimate regeneration, update the expectation here and audit the
  * operators reading the changed column (money columns feed `Num.cents`;
  * ids feed joins; `embedding` feeds the integer-quantized dot products).
  */
class TestdataSchemaSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // engine-visible schema AFTER Tables.load normalization, as name:type
  private val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq(
      "n_nationkey" -> "int", "n_name" -> "string", "n_regionkey" -> "int"),
    "customer" -> Seq(
      "c_custkey" -> "bigint", "c_name" -> "string", "c_nationkey" -> "int",
      "c_acctbal" -> "double", "c_mktsegment" -> "string"),
    "supplier" -> Seq(
      "s_suppkey" -> "bigint", "s_name" -> "string", "s_nationkey" -> "int",
      "s_acctbal" -> "double"),
    "part" -> Seq(
      "p_partkey" -> "bigint", "p_name" -> "string", "p_brand" -> "string",
      "p_type" -> "string", "p_size" -> "int", "p_retailprice" -> "double"),
    "orders" -> Seq(
      "o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp", "o_orderpriority" -> "string"),
    "lineitem" -> Seq(
      "l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp"),
    "events" -> Seq(
      "event_id" -> "bigint", "ts" -> "timestamp", "user_id" -> "bigint",
      "event_type" -> "string", "value" -> "double", "props" -> "string"),
    "documents" -> Seq(
      "doc_id" -> "bigint", "text" -> "string", "lang" -> "string",
      "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq(
      "vec_id" -> "bigint", "embedding" -> "array<float>", "label" -> "int"))

  test("every driver table surfaces the expected engine schema (drift sentinel)") {
    val diffs = Tables.names.flatMap { t =>
      val got = Tables.load(spark, sf, t).schema.fields
        .map(f => f.name -> f.dataType.simpleString).toSeq
      val want = expected(t)
      if (got == want) Nil
      else Seq(
        s"$t:\n  expected ${want.map { case (n, d) => s"$n:$d" }.mkString(", ")}" +
          s"\n  got      ${got.map { case (n, d) => s"$n:$d" }.mkString(", ")}")
    }
    assert(diffs.isEmpty,
      "DRIVER TESTDATA SCHEMA DRIFTED — audit consumers of the changed " +
        "columns, then update TestdataSchemaSpec:\n" + diffs.mkString("\n"))
  }

  test("normalized timestamp columns land in a plausible instant range (unit sentinel)") {
    // tsNormalizeExpr assumes an observed int64 ts column is NANOSECONDS
    // (div 1000 → micros). If the driver ever regenerates with epoch-micros
    // or -millis int64, the engine-visible schema is IDENTICAL — the drift
    // sentinel above cannot see it — but every instant is scaled 1000x.
    // Pin the UNIT by bounds: all normalized instants must fall in
    // [1990, 2035). A micros-as-nanos misread lands in 1970; a
    // nanos-as-micros misread lands thousands of years out — both trip loudly.
    import org.apache.spark.sql.functions.{col, max, min, year}
    val lo = 1990
    val hi = 2035
    val bad = Seq("orders" -> "o_orderdate", "lineitem" -> "l_shipdate", "events" -> "ts")
      .flatMap { case (t, c) =>
        val r = Tables.load(spark, sf, t)
          .agg(year(min(col(c))).as("lo"), year(max(col(c))).as("hi"))
          .head()
        if (r.getInt(0) >= lo && r.getInt(1) < hi) Nil
        else Seq(s"$t.$c spans years [${r.getInt(0)}, ${r.getInt(1)}] — " +
          "physical timestamp UNIT likely drifted (see Tables.tsNormalizeExpr)")
      }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
