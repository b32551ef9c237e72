package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.sources.{EqualNullSafe, EqualTo, Filter, In}

/** Per-batch bloom registers ([[BatchBloom]], `'graft.bloom-columns'`):
  * point-predicate skipping on UNCLUSTERED high-cardinality keys, where
  * every batch's min/max spans the domain and bounds alone prune
  * nothing. No false negatives — "absent" is a proof, so planning may
  * skip; false positives only keep.
  */
class BloomSkippingSpec extends SparkSpec {

  private def catalogOn(): Unit =
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")

  private def drop(names: String*): Unit =
    names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS graft.$n"))

  private def planned(key: String, fs: Filter*): Int = {
    val st = MemTables.get(key).get
    val b = new MemScanBuilder(key, st.schema, None)
    val residual = b.pushFilters(fs.toArray)
    assert(residual.toSeq === fs.toSeq, "every filter must stay a residual")
    b.build().asInstanceOf[MemScan].planInputPartitions().length
  }

  /** Four single-task appends, each spanning the full [0, 10000) domain
    * (min/max useless) but holding a DISJOINT residue class mod 8 — the
    * adversarial layout for bounds, the home game for blooms.
    */
  private def loadResidues(tbl: String): Unit = {
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try for (r <- 0 to 3)
      spark.sql(s"INSERT INTO graft.$tbl " +
        s"SELECT /*+ COALESCE(1) */ id * 8 + $r FROM range(0, 1250)")
    finally spark.conf.set("spark.sql.shuffle.partitions", "2")
  }

  test("point predicates prune unclustered batches; absence proves zero") {
    catalogOn(); drop("bl_res")
    spark.sql("CREATE TABLE graft.bl_res (k BIGINT) " +
      "TBLPROPERTIES ('graft.bloom-columns'='k')")
    loadResidues("bl_res")
    val total = MemTables.get("bl_res").get.batches
      .count(_.removedAt == Long.MaxValue)
    assert(total >= 4, s"expected >= 4 live batches, got $total")
    // every batch's bounds span the domain — bounds alone keep all
    MemTables.get("bl_res").get.batches.foreach { b =>
      assert(b.stats("k").bloom.isDefined, "opt-in column carries a register")
    }
    // k = 17 (residue 1): only that residue's batches survive (+FPs)
    assert(planned("bl_res", EqualTo("k", 17L)) <= total / 2,
      "bloom must prune residue-disjoint batches")
    assert(planned("bl_res", EqualTo("k", 17L)) >= 1)
    // k ≡ 5 mod 8 exists NOWHERE: bloom-proven absence plans zero
    assert(planned("bl_res", EqualTo("k", 13L)) === 0)
    assert(planned("bl_res", EqualNullSafe("k", 13L)) === 0)
    // IN over two residues keeps at most their batches
    assert(planned("bl_res", In("k", Array[Any](17L, 18L))) <= total)
    assert(planned("bl_res", In("k", Array[Any](13L, 21L))) <=
      planned("bl_res", EqualTo("k", 21L)))
    // correctness: the scan returns exactly the right rows either way
    assert(spark.sql("SELECT count(*) FROM graft.bl_res WHERE k = 17")
      .head().getLong(0) === 1L)
    assert(spark.sql("SELECT count(*) FROM graft.bl_res WHERE k = 13")
      .head().getLong(0) === 0L)
    drop("bl_res")
  }

  test("no property, no register: planning stays conservative") {
    catalogOn(); drop("bl_off")
    spark.sql("CREATE TABLE graft.bl_off (k BIGINT)")
    loadResidues("bl_off")
    val total = MemTables.get("bl_off").get.batches
      .count(_.removedAt == Long.MaxValue)
    MemTables.get("bl_off").get.batches.foreach(b =>
      assert(b.stats("k").bloom.isEmpty))
    // in-bounds equality keeps everything without a register
    assert(planned("bl_off", EqualTo("k", 17L)) === total)
    drop("bl_off")
  }

  test("registers survive the file plane and metadata recovery") {
    catalogOn(); drop("bl_pq")
    spark.sql("CREATE TABLE graft.bl_pq (k BIGINT) TBLPROPERTIES (" +
      "'graft.storage'='parquet', 'graft.bloom-columns'='k')")
    loadResidues("bl_pq")
    val total = MemTables.get("bl_pq").get.batches
      .count(_.removedAt == Long.MaxValue)
    assert(planned("bl_pq", EqualTo("k", 13L)) === 0)
    // the registers ride the durable metadata plane
    spark.sql("CALL graft.unload_table('bl_pq')")
    assert(spark.sql("SELECT count(*) FROM graft.bl_pq WHERE k = 17")
      .head().getLong(0) === 1L)
    assert(planned("bl_pq", EqualTo("k", 13L)) === 0,
      "recovered manifests keep their blooms")
    assert(planned("bl_pq", EqualTo("k", 17L)) <= total / 2)
    drop("bl_pq")

    // string keys hash canonically too
    drop("bl_str")
    spark.sql("CREATE TABLE graft.bl_str (s STRING) " +
      "TBLPROPERTIES ('graft.bloom-columns'='s')")
    spark.sql("INSERT INTO graft.bl_str SELECT concat('a', id) FROM range(0, 100)")
    spark.sql("INSERT INTO graft.bl_str SELECT concat('b', id) FROM range(0, 100)")
    assert(planned("bl_str", EqualTo("s", "zzz")) === 0)
    assert(planned("bl_str", EqualTo("s", "a5")) >= 1)
    assert(spark.sql("SELECT count(*) FROM graft.bl_str WHERE s = 'a5'")
      .head().getLong(0) === 1L)
    drop("bl_str")

    // unknown bloom column rejected at CREATE
    intercept[Exception](spark.sql(
      "CREATE TABLE graft.bl_bad (k BIGINT) TBLPROPERTIES ('graft.bloom-columns'='nope')"))
  }

  test("string bounds skip in BINARY (UTF-8) order, not UTF-16") {
    catalogOn(); drop("bl_utf8")
    spark.sql("CREATE TABLE graft.bl_utf8 (c STRING)")
    // U+1F600 (4-byte UTF-8, surrogate pair in UTF-16): binary order puts
    // it ABOVE U+E000 (0xF0.. > 0xEE..), UTF-16 code-unit order below
    // (0xD83D < 0xE000). A UTF-16 comparison of the batch bounds would
    // prune this batch for `c > ''` and the row would silently
    // vanish — residual filters never see a skipped batch.
    spark.sql("INSERT INTO graft.bl_utf8 VALUES ('😀')")
    spark.sql("INSERT INTO graft.bl_utf8 VALUES ('a')") // second batch
    assert(spark.sql("SELECT count(*) FROM graft.bl_utf8 WHERE c > ''")
      .head().getLong(0) === 1L)
    assert(spark.sql("SELECT count(*) FROM graft.bl_utf8 WHERE c < ''")
      .head().getLong(0) === 1L)
    // DELETE range evaluation rides the same comparator
    spark.sql("DELETE FROM graft.bl_utf8 WHERE c > ''")
    assert(spark.sql("SELECT c FROM graft.bl_utf8").collect()
      .map(_.getString(0)).toSeq === Seq("a"))
    drop("bl_utf8")
  }
}
