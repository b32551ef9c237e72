package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.sources._

/** Time-based partition transforms ([[MemTables.TimePart]] — years/months/
  * days/hours) and width truncation ([[MemTables.TruncatePart]]): the
  * transform algebra, planning-time pruning of RAW source-column range
  * predicates (the monotone-transform contract — no derived partition
  * column in the query), the clustered write distribution resolving
  * through the FunctionCatalog, dynamic overwrite at month granularity,
  * and the storage-partitioned join of two co-time-partitioned tables.
  */
class TimePartitionSpec extends SparkSpec {

  private def catalogOn(): Unit = {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
  }

  private def drop(names: String*): Unit =
    names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS graft.$n"))

  private def scans(pl: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] = pl match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      scans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
    case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => Seq(b)
    case other => other.children.flatMap(scans)
  }

  private def memScan(df: org.apache.spark.sql.DataFrame) =
    scans(df.queryExecution.executedPlan)
      .filter(_.toString.contains("GraftMemScan")).head

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
      case e: org.apache.spark.sql.execution.exchange.Exchange =>
        1 + e.children.map(walk).sum
      case other => other.children.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  private def liveBatches(key: String) =
    MemTables.get(key).get.batches.filter(_.removedAt == Long.MaxValue)

  test("transform ordinals: epoch-relative, floor semantics pre-1970") {
    // DATE internal = days since epoch
    assert(MemTables.timeOrdinalOf("days", Integer.valueOf(0)) === Some(0))
    assert(MemTables.timeOrdinalOf("months", Integer.valueOf(31)) === Some(1)) // 1970-02-01
    assert(MemTables.timeOrdinalOf("years", Integer.valueOf(365)) === Some(1)) // 1971-01-01
    assert(MemTables.timeOrdinalOf("years", Integer.valueOf(-1)) === Some(-1)) // 1969-12-31
    assert(MemTables.timeOrdinalOf("months", Integer.valueOf(-1)) === Some(-1))
    // TIMESTAMP internal = micros since epoch; floorDiv, not toward-zero
    val hour = 3600L * 1000000L
    assert(MemTables.timeOrdinalOf("hours", java.lang.Long.valueOf(hour + 1)) === Some(1))
    assert(MemTables.timeOrdinalOf("hours", java.lang.Long.valueOf(-1L)) === Some(-1))
    assert(MemTables.timeOrdinalOf("days", java.lang.Long.valueOf(-1L)) === Some(-1))
    // truncate: integral floor buckets, string prefixes
    assert(MemTables.truncValueOf(10, java.lang.Long.valueOf(-1L)) ===
      Some(java.lang.Long.valueOf(-10L)))
    assert(MemTables.truncValueOf(10, Integer.valueOf(27)) === Some(Integer.valueOf(20)))
    assert(MemTables.truncValueOf(2,
      org.apache.spark.unsafe.types.UTF8String.fromString("abcd")) ===
      Some(org.apache.spark.unsafe.types.UTF8String.fromString("ab")))
  }

  test("partMayMatch: monotone transform rules on raw-column predicates") {
    import MemTables._
    val mSpec = Seq(TimePart("months", "d"))
    val feb95 = Seq[Any](Integer.valueOf(301)) // 1995-02
    def d(s: String): java.sql.Date = java.sql.Date.valueOf(s)
    // equality prunes to the literal's month
    assert(partMayMatch(EqualTo("d", d("1995-02-14")), mSpec, feb95))
    assert(!partMayMatch(EqualTo("d", d("1995-03-01")), mSpec, feb95))
    // ranges: tuple >= T(v) for >, tuple <= T(v) for < — boundary months kept
    assert(partMayMatch(GreaterThan("d", d("1995-02-27")), mSpec, feb95))
    assert(!partMayMatch(GreaterThan("d", d("1995-03-01")), mSpec, feb95))
    assert(partMayMatch(LessThan("d", d("1995-02-01")), mSpec, feb95))
    assert(!partMayMatch(LessThanOrEqual("d", d("1995-01-31")), mSpec, feb95))
    assert(partMayMatch(
      And(GreaterThanOrEqual("d", d("1995-01-10")), LessThan("d", d("1995-02-03"))),
      mSpec, feb95))
    assert(!partMayMatch(
      And(GreaterThanOrEqual("d", d("1995-03-10")), LessThan("d", d("1995-04-03"))),
      mSpec, feb95))
    assert(partMayMatch(In("d", Array(d("1995-01-01"), d("1995-02-02"))), mSpec, feb95))
    assert(!partMayMatch(In("d", Array(d("1995-01-01"), d("1995-04-02"))), mSpec, feb95))
    // NULL tuple: only null-shaped filters keep it
    val nullTuple = Seq[Any](null)
    assert(partMayMatch(IsNull("d"), mSpec, nullTuple))
    assert(!partMayMatch(IsNotNull("d"), mSpec, nullTuple))
    assert(!partMayMatch(EqualTo("d", d("1995-02-14")), mSpec, nullTuple))
    assert(partMayMatch(EqualNullSafe("d", null), mSpec, nullTuple))
    assert(!partMayMatch(EqualNullSafe("d", null), mSpec, feb95))
    // truncate over strings: prefix ordering
    val tSpec = Seq(TruncatePart(2, "s"))
    val ab = Seq[Any](org.apache.spark.unsafe.types.UTF8String.fromString("ab"))
    assert(partMayMatch(EqualTo("s", "abyss"), tSpec, ab))
    assert(!partMayMatch(EqualTo("s", "acorn"), tSpec, ab))
    assert(partMayMatch(GreaterThan("s", "abc"), tSpec, ab))
    assert(!partMayMatch(GreaterThan("s", "ac"), tSpec, ab))
    assert(!partMayMatch(LessThan("s", "aa"), tSpec, ab))
    // unknown shapes keep the batch (conservative)
    assert(partMayMatch(StringContains("s", "zz"), tSpec, ab))
  }

  test("months table: partition purity and raw-predicate range pruning") {
    catalogOn(); drop("tp_m")
    spark.sql("CREATE TABLE graft.tp_m (k BIGINT, d DATE) PARTITIONED BY (months(d))")
    // four months of data in one unclustered append — the publish split
    // must still produce partition-pure batches
    spark.sql("""INSERT INTO graft.tp_m
      SELECT id, date_add(DATE'1995-01-01', CAST(id AS INT)) FROM range(0, 120)""")
    val spec = MemTables.get("tp_m").get.partitioning
    assert(spec === Seq(MemTables.TimePart("months", "d")))
    val live = liveBatches("tp_m")
    assert(live.map(_.part).distinct.size === 4) // Jan..Apr 1995
    live.foreach { b =>
      b.rows.foreach(r => assert(MemTables.partTupleOf(spec, b.schema, r) === b.part))
    }
    // a RAW range predicate on the source column plans only the touched
    // months — the monotone-transform pruning contract
    val feb = spark.table("graft.tp_m")
      .where("d BETWEEN DATE'1995-02-03' AND DATE'1995-03-20'")
    assert(feb.count() === 46L) // ids 33 (Feb 3) .. 78 (Mar 20)
    assert(memScan(feb).inputRDD.getNumPartitions === 2, memScan(feb).toString)
    // equality on the source column plans one month
    val one = spark.table("graft.tp_m").where("d = DATE'1995-04-10'")
    assert(one.count() === 1L)
    assert(memScan(one).inputRDD.getNumPartitions === 1)
    drop("tp_m")
  }

  test("hours table over TIMESTAMP: range pruning and SQL-callable fn") {
    catalogOn(); drop("tp_h")
    spark.sql("CREATE TABLE graft.tp_h (k BIGINT, ts TIMESTAMP) PARTITIONED BY (hours(ts))")
    spark.sql("""INSERT INTO graft.tp_h
      SELECT id, timestampadd(MINUTE, CAST(id * 10 AS INT), TIMESTAMP'2024-05-01 00:00:00')
      FROM range(0, 36)""") // 6 hours, 6 rows each
    assert(liveBatches("tp_h").map(_.part).distinct.size === 6)
    val win = spark.table("graft.tp_h")
      .where("ts >= TIMESTAMP'2024-05-01 02:30:00' AND ts < TIMESTAMP'2024-05-01 04:00:00'")
    assert(win.count() === 9L) // 02:30..03:50
    assert(memScan(win).inputRDD.getNumPartitions === 2, memScan(win).toString)
    // the transform is directly callable and matches the layout ordinal
    val ord = spark.sql(
      "SELECT graft.hours(TIMESTAMP'2024-05-01 03:59:00') AS h").head().getInt(0)
    assert(liveBatches("tp_h").map(_.part.head.asInstanceOf[Int]).contains(ord))
    drop("tp_h")
  }

  test("truncate table: integral floor buckets prune ranges; strings prefix") {
    catalogOn(); drop("tp_tr", "tp_ts")
    spark.sql("CREATE TABLE graft.tp_tr (k BIGINT, v BIGINT) PARTITIONED BY (truncate(10, v))")
    spark.sql("INSERT INTO graft.tp_tr SELECT id, id FROM range(0, 50)")
    assert(liveBatches("tp_tr").map(_.part).distinct.size === 5)
    val mid = spark.table("graft.tp_tr").where("v >= 23 AND v < 31")
    assert(mid.count() === 8L)
    assert(memScan(mid).inputRDD.getNumPartitions === 2, memScan(mid).toString)

    spark.sql("CREATE TABLE graft.tp_ts (k BIGINT, s STRING) PARTITIONED BY (truncate(1, s))")
    spark.sql("""INSERT INTO graft.tp_ts
      SELECT id, concat(substring('abcde', CAST(id % 5 AS INT) + 1, 1), id) FROM range(0, 50)""")
    assert(liveBatches("tp_ts").map(_.part).distinct.size === 5)
    // string-prefix pruning: equality keeps one prefix batch
    val b = spark.table("graft.tp_ts").where("s = 'b1'")
    assert(b.count() === 1L)
    assert(memScan(b).inputRDD.getNumPartitions === 1, memScan(b).toString)
    drop("tp_tr", "tp_ts")
  }

  test("NULL time values keep a NULL tuple; IS NULL prunes to it") {
    catalogOn(); drop("tp_null")
    spark.sql("CREATE TABLE graft.tp_null (k BIGINT, d DATE) PARTITIONED BY (days(d))")
    spark.sql("INSERT INTO graft.tp_null VALUES (1, DATE'2020-01-01'), (2, NULL), (3, NULL)")
    val nul = spark.table("graft.tp_null").where("d IS NULL")
    assert(nul.count() === 2L)
    assert(memScan(nul).inputRDD.getNumPartitions === 1)
    val notNul = spark.table("graft.tp_null").where("d = DATE'2020-01-01'")
    assert(notNul.count() === 1L)
    assert(memScan(notNul).inputRDD.getNumPartitions === 1)
    drop("tp_null")
  }

  test("dynamic overwrite replaces exactly the incoming months") {
    catalogOn(); drop("tp_dyn")
    spark.sql("CREATE TABLE graft.tp_dyn (k BIGINT, d DATE) PARTITIONED BY (months(d))")
    spark.sql("""INSERT INTO graft.tp_dyn
      SELECT id, date_add(DATE'1995-01-01', CAST(id AS INT)) FROM range(0, 90)""")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // overwrite February only: one row lands in the Feb tuple
      spark.sql("INSERT OVERWRITE graft.tp_dyn VALUES (999, DATE'1995-02-14')")
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    val out = spark.table("graft.tp_dyn")
    assert(out.where("d >= DATE'1995-02-01' AND d < DATE'1995-03-01'").count() === 1L)
    assert(out.where("month(d) = 1").count() === 31L) // January untouched
    assert(out.where("month(d) = 3").count() === 31L) // March untouched (ids 59..89)
    drop("tp_dyn")
  }

  test("storage-partitioned join of two months-partitioned tables: zero exchanges") {
    catalogOn(); drop("tp_j1", "tp_j2")
    for (t <- Seq("tp_j1", "tp_j2")) {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, d DATE) PARTITIONED BY (months(d))")
      spark.sql(s"""INSERT INTO graft.$t
        SELECT id, date_add(DATE'1995-01-01', CAST((id % 120) AS INT)) FROM range(0, 240)""")
    }
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.sql(
        """SELECT count(*) AS c FROM graft.tp_j1 a JOIN graft.tp_j2 b ON a.d = b.d""")
      assert(j.collect()(0).getLong(0) === 480L) // 2 rows per date each side
      assert(exchanges(j.filter("true")) <= 1) // only the count's final agg exchange
      val plain = spark.sql(
        "SELECT a.k, b.k FROM graft.tp_j1 a JOIN graft.tp_j2 b ON a.d = b.d")
      assert(exchanges(plain) === 0, plain.queryExecution.executedPlan.toString)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
    drop("tp_j1", "tp_j2")
  }

  test("create-time validation: wrong types and widths rejected") {
    catalogOn(); drop("tp_bad")
    val e1 = intercept[Exception](spark.sql(
      "CREATE TABLE graft.tp_bad (k BIGINT, d DATE) PARTITIONED BY (hours(d))"))
    assert(e1.getMessage.contains("sub-day"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      "CREATE TABLE graft.tp_bad (k BIGINT, s STRING) PARTITIONED BY (months(s))"))
    assert(e2.getMessage.contains("DATE or TIMESTAMP"), e2.getMessage)
    val e3 = intercept[Exception](spark.sql(
      "CREATE TABLE graft.tp_bad (k BIGINT, d DOUBLE) PARTITIONED BY (truncate(4, d))"))
    assert(e3.getMessage.contains("integral or STRING"), e3.getMessage)
    assert(!spark.catalog.tableExists("graft.tp_bad"))
  }

  test("partition evolution guards protect transform source columns") {
    catalogOn(); drop("tp_guard")
    spark.sql("CREATE TABLE graft.tp_guard (k BIGINT, d DATE) PARTITIONED BY (years(d))")
    val e = intercept[Exception](spark.sql("ALTER TABLE graft.tp_guard DROP COLUMN d"))
    assert(e.getMessage.toLowerCase.contains("partition"), e.getMessage)
    drop("tp_guard")
  }

  test("metadata .partitions table renders time tuples") {
    catalogOn(); drop("tp_meta")
    spark.sql("CREATE TABLE graft.tp_meta (k BIGINT, d DATE) PARTITIONED BY (months(d))")
    spark.sql("""INSERT INTO graft.tp_meta
      SELECT id, date_add(DATE'1995-01-01', CAST(id AS INT)) FROM range(0, 59)""")
    val parts = spark.table("graft.tp_meta.partitions").collect()
    assert(parts.length === 2)
    assert(parts.map(_.getInt(0)).sorted.toSeq === Seq(300, 301)) // months since 1970
    drop("tp_meta")
  }
}
