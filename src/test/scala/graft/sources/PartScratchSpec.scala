package graft.sources

import graft.SparkSpec

/** TEMPORARY scratch spec for iterating on partitioned mem tables — will be
  * folded into RoundtripsSpec once the behavior is pinned.
  */
class PartScratchSpec extends SparkSpec {

  test("scratch: partitioned create, write, prune, SPJ") {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.sql("DROP TABLE IF EXISTS graft.pscr_a")
    spark.sql("DROP TABLE IF EXISTS graft.pscr_b")
    spark.sql("CREATE TABLE graft.pscr_a (k INT, v BIGINT) PARTITIONED BY (k)")
    spark.sql("CREATE TABLE graft.pscr_b (k INT, w STRING) PARTITIONED BY (k)")
    spark.sql("INSERT INTO graft.pscr_a VALUES (1, 10), (2, 20), (3, 30), (1, 11), (2, 21)")
    spark.sql("INSERT INTO graft.pscr_b VALUES (1, 'x'), (2, 'y'), (3, 'z')")

    // partition-pure batches
    val st = MemTables.get("pscr_a").get
    val live = st.batches.filter(_.removedAt == Long.MaxValue)
    println(s"live batches: ${live.map(b => (b.part, b.rows.length))}")
    assert(live.forall(_.part.length == 1))

    // pruning: equality filter plans fewer partitions
    val pruned = spark.sql("SELECT * FROM graft.pscr_a WHERE k = 2")
    println(pruned.queryExecution.executedPlan.toString)
    assert(pruned.collect().map(_.getLong(1)).sorted.toSeq == Seq(20L, 21L))

    // SPJ: co-partitioned join with no shuffle (broadcast off so the join
    // actually exercises the partitioning instead of shipping a build side)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val j = spark.sql(
      "SELECT a.k, a.v, b.w FROM graft.pscr_a a JOIN graft.pscr_b b ON a.k = b.k")
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    println(plan)
    println("rows: " + j.collect().mkString(", "))
    println("HAS SHUFFLE: " + plan.contains("ShuffleExchange"))
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    // write distribution: partitioned INSERT plans a clustered exchange
    val w = spark.sql("INSERT INTO graft.pscr_a VALUES (4, 40)")
    spark.sql("DROP TABLE graft.pscr_a")
    spark.sql("DROP TABLE graft.pscr_b")
  }

  test("scratch: bucket partitioning") {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")
    spark.sql("DROP TABLE IF EXISTS graft.pscr_c")
    spark.sql("CREATE TABLE graft.pscr_c (k BIGINT, v INT) PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO graft.pscr_c SELECT id, CAST(id % 7 AS INT) FROM range(0, 100)")
    val st = MemTables.get("pscr_c").get
    val live = st.batches.filter(_.removedAt == Long.MaxValue)
    println(s"bucket batches: ${live.map(b => (b.part, b.rows.length))}")
    assert(live.map(_.part.head.asInstanceOf[Int]).toSet.subsetOf(Set(0, 1, 2, 3)))
    // bucket pruning: k = 5 keeps only bucketOf(5, 4)
    val q = spark.sql("SELECT v FROM graft.pscr_c WHERE k = 5")
    assert(q.collect().map(_.getInt(0)).toSeq == Seq(5))
    spark.sql("DROP TABLE graft.pscr_c")
  }

  test("scratch: bucket SPJ") {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sql("DROP TABLE IF EXISTS graft.pscr_d")
    spark.sql("DROP TABLE IF EXISTS graft.pscr_e")
    spark.sql("CREATE TABLE graft.pscr_d (k BIGINT, v INT) PARTITIONED BY (bucket(4, k))")
    spark.sql("CREATE TABLE graft.pscr_e (k BIGINT, w INT) PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO graft.pscr_d SELECT id, CAST(id % 7 AS INT) FROM range(0, 50)")
    spark.sql("INSERT INTO graft.pscr_e SELECT id, CAST(id % 3 AS INT) FROM range(0, 50)")
    val j = spark.sql(
      "SELECT d.k, d.v, e.w FROM graft.pscr_d d JOIN graft.pscr_e e ON d.k = e.k")
    assert(j.count() == 50)
    val plan = j.queryExecution.executedPlan.toString
    println("BUCKET SPJ HAS SHUFFLE: " + plan.contains("ShuffleExchange"))
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE graft.pscr_d")
    spark.sql("DROP TABLE graft.pscr_e")
  }

  test("scratch: DML + compaction on partitioned table") {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")
    spark.sql("DROP TABLE IF EXISTS graft.pscr_f")
    spark.sql("CREATE TABLE graft.pscr_f (k INT, v BIGINT) PARTITIONED BY (k)")
    spark.sql("INSERT INTO graft.pscr_f VALUES (1, 10), (2, 20), (3, 30), (1, 11)")
    spark.sql("UPDATE graft.pscr_f SET v = v + 100 WHERE k = 1")
    spark.sql("DELETE FROM graft.pscr_f WHERE k = 3")
    val rows = spark.sql("SELECT k, v FROM graft.pscr_f ORDER BY k, v")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    println(s"after DML: $rows")
    assert(rows == Seq((1, 110L), (1, 111L), (2, 20L)))
    val st = MemTables.get("pscr_f").get
    assert(st.batches.filter(_.removedAt == Long.MaxValue).forall(_.part.length == 1))
    spark.sql("CALL graft.rewrite_data_files('pscr_f', 'k')")
    val rows2 = spark.sql("SELECT k, v FROM graft.pscr_f ORDER BY k, v")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(rows2 == rows)
    val live2 = st.batches.filter(_.removedAt == Long.MaxValue)
    println(s"post-rewrite parts: ${live2.map(b => (b.part, b.rows.length))}")
    assert(live2.forall(_.part.length == 1))
    spark.sql("DROP TABLE graft.pscr_f")
  }
}
