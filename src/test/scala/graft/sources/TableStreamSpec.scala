package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger

/** `spark.readStream.table("graft.t")` — the table-as-stream-source shape
  * ([[MemTableMicroBatchStream]]): initial snapshot once, then appended
  * windows exactly-once across checkpointed restarts, change commits
  * rejected (or skipped whole under `skipChangeCommits`), compactions
  * invisible.
  */
class TableStreamSpec extends SparkSpec {

  private def catalogOn(): Unit =
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.SeqCatalog")

  // memory sink refuses checkpoint recovery; foreachBatch supports it and
  // lets each run collect exactly its own emissions
  private def runOnce(
      tbl: String, checkpoint: String, name: String,
      skipChangeCommits: Boolean = false): Seq[Long] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream
      .option("skipChangeCommits", skipChangeCommits.toString)
      .table(tbl).writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = df.collect().map(_.getLong(0))
        buf.synchronized { buf ++= rows }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    buf.synchronized(buf.sorted.toSeq)
  }

  test("table stream: snapshot once, then appended windows, exactly-once across restarts") {
    catalogOn()
    val tbl = "graft.ts_basic"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT)")
    import spark.implicits._
    Seq(1L, 2L).toDF("k").coalesce(1).writeTo(tbl).append() // v1
    Seq(3L).toDF("k").coalesce(1).writeTo(tbl).append() // v2
    val cp = graft.rentals.Scratch.dir("ts_basic_cp")
    // run 1: the initial snapshot — everything that exists, once
    assert(runOnce(tbl, cp, "ts_basic_run1") === Seq(1L, 2L, 3L))
    // run 2 on the same checkpoint: nothing new, nothing re-emitted
    assert(runOnce(tbl, cp, "ts_basic_run2") === Seq.empty)
    // two more appends; run 3 emits exactly the new windows
    Seq(4L).toDF("k").coalesce(1).writeTo(tbl).append() // v3
    Seq(5L, 6L).toDF("k").coalesce(1).writeTo(tbl).append() // v4
    assert(runOnce(tbl, cp, "ts_basic_run3") === Seq(4L, 5L, 6L))
    spark.sql(s"DROP TABLE $tbl")
  }

  test("table stream: snapshot reads through delete vectors; later deletes reject") {
    catalogOn()
    val tbl = "graft.ts_dv"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT) " +
      "TBLPROPERTIES ('graft.delete-mode'='merge-on-read')")
    import spark.implicits._
    (1L to 6L).toDF("k").coalesce(1).writeTo(tbl).append() // v1
    spark.sql(s"DELETE FROM $tbl WHERE k > 4") // v2: DV kills
    val cp = graft.rentals.Scratch.dir("ts_dv_cp")
    // a delete BEFORE stream start is just part of the snapshot
    assert(runOnce(tbl, cp, "ts_dv_run1") === Seq(1L, 2L, 3L, 4L))
    // a delete INSIDE a later window is a change commit: loud failure
    spark.sql(s"DELETE FROM $tbl WHERE k = 1") // v3
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      runOnce(tbl, cp, "ts_dv_run2"))
    assert(err.getMessage.contains("non-append") ||
      Option(err.getCause).exists(_.getMessage.contains("non-append")), err.getMessage)
    // skipChangeCommits=true skips the delete whole; a following append
    // still streams (fresh checkpoint: the failed run consumed nothing)
    Seq(9L).toDF("k").coalesce(1).writeTo(tbl).append() // v4
    val cp2 = graft.rentals.Scratch.dir("ts_dv_cp2")
    assert(runOnce(tbl, cp2, "ts_dv_run3", skipChangeCommits = true) ===
      Seq(2L, 3L, 4L, 9L)) // snapshot at v4 (post-delete) — one run, one snapshot
    spark.sql(s"DROP TABLE $tbl")
  }

  test("table stream: skipChangeCommits skips the commit whole, appends still flow") {
    catalogOn()
    val tbl = "graft.ts_skip"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT)")
    import spark.implicits._
    Seq(1L).toDF("k").coalesce(1).writeTo(tbl).append() // v1
    val cp = graft.rentals.Scratch.dir("ts_skip_cp")
    assert(runOnce(tbl, cp, "ts_skip_run1", skipChangeCommits = true) === Seq(1L))
    // overwrite (change commit) then append: only the append streams —
    // the overwrite's rows are skipped WHOLE, exactly Delta's contract
    Seq(7L, 8L).toDF("k").createOrReplaceTempView("ts_skip_src")
    spark.sql(s"INSERT OVERWRITE $tbl SELECT * FROM ts_skip_src") // v2
    Seq(9L).toDF("k").coalesce(1).writeTo(tbl).append() // v3
    assert(runOnce(tbl, cp, "ts_skip_run2", skipChangeCommits = true) === Seq(9L))
    spark.sql(s"DROP TABLE $tbl")
  }

  test("table stream: compaction replacements are never re-emitted") {
    catalogOn()
    val tbl = "graft.ts_compact"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT)")
    import spark.implicits._
    Seq(1L).toDF("k").coalesce(1).writeTo(tbl).append() // v1
    Seq(2L).toDF("k").coalesce(1).writeTo(tbl).append() // v2
    val cp = graft.rentals.Scratch.dir("ts_compact_cp")
    assert(runOnce(tbl, cp, "ts_compact_run1") === Seq(1L, 2L))
    spark.sql(s"CALL graft.compact_table('ts_compact')") // v3: physical only
    Seq(3L).toDF("k").coalesce(1).writeTo(tbl).append() // v4
    assert(runOnce(tbl, cp, "ts_compact_run2") === Seq(3L))
    spark.sql(s"DROP TABLE $tbl")
  }

  test("table stream: startingVersion replaces the snapshot with commits-from-v") {
    catalogOn()
    val tbl = "graft.ts_startv"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT)")
    import spark.implicits._
    Seq(1L, 2L).toDF("k").coalesce(1).writeTo(tbl).append() // v1
    Seq(3L).toDF("k").coalesce(1).writeTo(tbl).append() // v2
    Seq(4L).toDF("k").coalesce(1).writeTo(tbl).append() // v3
    def run(startingVersion: Long): Seq[Long] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = spark.readStream
        .option("startingVersion", startingVersion.toString)
        .table(tbl).writeStream
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            val rows = df.collect().map(_.getLong(0))
            buf.synchronized { buf ++= rows }
            ()
        }
        .option("checkpointLocation",
          graft.rentals.Scratch.dir(s"ts_startv_cp_$startingVersion"))
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      buf.synchronized(buf.sorted.toSeq)
    }
    assert(run(2L) === Seq(3L, 4L)) // inclusive: v2 and v3, no snapshot
    assert(run(3L) === Seq(4L))
    // version 0 is CREATE — rejected, not silently a snapshot
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException](run(0L))
    assert(err.getMessage.contains("startingVersion") ||
      Option(err.getCause).exists(_.getMessage.contains("startingVersion")))
    spark.sql(s"DROP TABLE $tbl")
  }

  test("table stream: maxVersionsPerTrigger bounds each micro-batch's window") {
    catalogOn()
    val tbl = "graft.ts_maxv"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT)")
    import spark.implicits._
    for (k <- 1L to 4L) Seq(k).toDF("k").coalesce(1).writeTo(tbl).append() // v1..v4
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    val q = spark.readStream
      .option("startingVersion", "1")
      .option("maxVersionsPerTrigger", "1")
      .table(tbl).writeStream
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val rows = df.collect().map(_.getLong(0)).sorted.toSeq
          batches.synchronized { batches += rows }
          ()
      }
      .option("checkpointLocation", graft.rentals.Scratch.dir("ts_maxv_cp"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = batches.synchronized(batches.filter(_.nonEmpty).toSeq)
    // one version per trigger: four single-row batches, in commit order
    assert(got === Seq(Seq(1L), Seq(2L), Seq(3L), Seq(4L)))
    spark.sql(s"DROP TABLE $tbl")
  }

  test("table stream: a restart across an ALTER binds the new schema; old windows null-fill") {
    catalogOn()
    val tbl = "graft.ts_alter"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT)")
    import spark.implicits._
    Seq(1L).toDF("k").coalesce(1).writeTo(tbl).append() // v1
    val cp = graft.rentals.Scratch.dir("ts_alter_cp")
    assert(runOnce(tbl, cp, "ts_alter_run1") === Seq(1L))
    // evolve, then append under the NEW schema; 'alter' is not a change
    // commit (no data), so the restarted stream consumes both windows
    spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (v BIGINT)") // v2
    Seq((2L, 20L)).toDF("k", "v").coalesce(1).writeTo(tbl).append() // v3
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Option[Long])]
    val q = spark.readStream.table(tbl).writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = df.collect().map(r =>
          (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
        buf.synchronized { buf ++= rows }
        ()
      }
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // only the post-restart window arrives (v1 was consumed pre-alter),
    // bound to the evolved two-column schema
    assert(buf.synchronized(buf.sortBy(_._1).toSeq) === Seq((2L, Some(20L))))
    // a FRESH stream's snapshot reads the pre-alter row through the
    // evolved schema: the added column null-fills (era projection)
    val buf2 = scala.collection.mutable.ArrayBuffer.empty[(Long, Option[Long])]
    val q2 = spark.readStream.table(tbl).writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = df.collect().map(r =>
          (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
        buf2.synchronized { buf2 ++= rows }
        ()
      }
      .option("checkpointLocation", graft.rentals.Scratch.dir("ts_alter_cp2"))
      .trigger(Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    assert(buf2.synchronized(buf2.sortBy(_._1).toSeq) ===
      Seq((1L, None), (2L, Some(20L))))
    spark.sql(s"DROP TABLE $tbl")
  }

  test("table stream: pinned snapshots and branches decline streaming") {
    catalogOn()
    val tbl = "graft.ts_decline"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT)")
    import spark.implicits._
    Seq(1L).toDF("k").coalesce(1).writeTo(tbl).append()
    val scan = new MemScan("ts_decline",
      MemTables.get("ts_decline").get.schema, asOf = Some(1L))
    intercept[UnsupportedOperationException](scan.toMicroBatchStream("/tmp/never"))
    spark.sql(s"DROP TABLE $tbl")
  }
}
