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
}
