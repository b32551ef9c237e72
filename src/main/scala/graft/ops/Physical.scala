package graft.ops

import graft.core.{Pinned, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout join strategies, gated end-to-end: bucketed co-located
  * joins (pay the shuffle once at write time) and AQE skew-splitting (spread
  * a pathological key at runtime). Both capabilities existed as specs
  * (BucketingSpec, PlanSpec); these QueryDefs put a driver-oracle-checked
  * query behind each so the CAPABILITY — not just the plan shape — is graded
  * every round.
  */
object Physical {

  /** Bucket count for the co-located join fixture. At 100 TB this is sized
    * to (table size / target file size); what matters for the zero-exchange
    * plan is only that both sides agree.
    */
  val BucketCount = 8

  /** Catalog table names + scratch paths are keyed by the corpus dir: the
    * catalog and scratch namespace are JVM-global while the pin is per
    * (session, dir), so un-keyed names would let a second corpus silently
    * clobber the first one's bucketed tables behind a still-valid pin. A
    * SHA-256 prefix, not `String.hashCode` — 31-bit collisions between path
    * strings are constructible, and a collision here reproduces exactly the
    * cross-corpus clobbering the key exists to prevent.
    */
  private def dirKey(dir: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(dir.getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString
  private def ordersTable(dir: String): String = s"graft_orders_bucketed_${dirKey(dir)}"
  private def customerTable(dir: String): String = s"graft_customer_bucketed_${dirKey(dir)}"

  /** Write orders + customer bucketed AND sorted by custkey (once per
    * session+dir — the bench's repeat passes and every later consumer reuse
    * the tables via the catalog). This is the "pay the shuffle at write
    * time" half of the contract: both tables hash-partition rows into
    * [[BucketCount]] buckets on the join key at write, so every later join
    * on that key lines buckets up file-to-file with NO exchange (and with
    * `sortBy`, no sort) on either side — at 100 TB the difference between a
    * nightly full-shuffle and a metadata-only merge join.
    */
  def bucketedFixture(spark: SparkSession, dir: String): Unit =
    Pinned.value(spark, dir, "bucketed_orders_customer") {
      val base = graft.rentals.Scratch.dir(s"graft_bucketed_${dirKey(dir)}")
      Tables.orders(spark, dir).write
        .bucketBy(BucketCount, "o_custkey").sortBy("o_custkey")
        .option("path", s"$base/orders").mode("overwrite").saveAsTable(ordersTable(dir))
      Tables.customer(spark, dir).write
        .bucketBy(BucketCount, "c_custkey").sortBy("c_custkey")
        .option("path", s"$base/customer").mode("overwrite").saveAsTable(customerTable(dir))
      ()
    }

  /** The co-located join itself, built against the bucketed catalog tables.
    * Runs in a child session with auto-broadcast disabled so the bucketed
    * layout — not a broadcast — is what eliminates the exchanges (the plan
    * spec asserts zero exchanges below the join; at real scale customer
    * would not broadcast anyway).
    */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    bucketedFixture(spark, dir)
    val sess = spark.newSession()
    sess.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sess.table(ordersTable(dir))
      .join(sess.table(customerTable(dir)), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(graft.core.Num.cents(col("o_totalprice"))).as("total_cents"))
  }

  /** Orders×customer revenue by market segment over the BUCKETED tables —
    * the co-located-join capability as an oracle-checked gate row. The
    * oracle recomputes from the base tables, proving the bucketed rewrite
    * is content-lossless; the zero-exchange plan shape is spec-asserted
    * (exchange counts are not SQL-expressible).
    */
  val joinBucketedColocated: QueryDef = QueryDef(
    "join_bucketed_colocated",
    """SELECT c_mktsegment,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
      |FROM orders JOIN customer ON c_custkey = o_custkey
      |GROUP BY 1""".stripMargin) { (spark, dir) => bucketedJoin(spark, dir) }

  /** AQE skew-join conf set: thresholds scaled DOWN to gate-scale shuffle
    * sizes (the detector compares post-compression partition bytes; the
    * defaults target multi-GB partitions) — the mechanism under test is
    * identical at any scale.
    */
  val skewConfs: Seq[(String, String)] = Seq(
    "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
    "spark.sql.shuffle.partitions" -> "16",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB",
    "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true")

  /** The shared hot-key scenario both skew gates run: every fourth orderkey
    * collapsed onto ONE hot key (a quarter of the fact table on a single
    * join key — the classic pathological shape: a null-ish default, a bot
    * user, a catch-all category), joined to the DISTINCT key dimension and
    * rolled up by a derived tag. Key-preserving (the dim side is distinct),
    * so the join multiplies nothing and ONE oracle states it relationally
    * for both gates — a tweak to the collapse or the tag formula lands in
    * exactly one place.
    */
  private val hotKeyOracleSql: String =
    """WITH big AS (
      |  SELECT CASE WHEN l_orderkey % 4 = 0 THEN 0 ELSE l_orderkey END AS k,
      |         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      |  FROM lineitem),
      |dim AS (SELECT DISTINCT k AS k2 FROM big),
      |tagged AS (SELECT k2, k2 % 97 AS tag FROM dim)
      |SELECT tag,
      |  CAST(count(*) AS BIGINT) AS n_items,
      |  CAST(sum(cents) AS BIGINT) AS rev_cents
      |FROM big JOIN tagged ON tagged.k2 = big.k
      |GROUP BY 1""".stripMargin

  /** The hot-key fact projection: (k, cents) with the %4 collapse. */
  private def hotKeyFact(sess: SparkSession, dir: String): DataFrame = {
    val hotKey = when(col("l_orderkey") % 4 === 0, lit(0L))
      .otherwise(col("l_orderkey")).cast("long")
    Tables.lineitem(sess, dir)
      .select(hotKey.as("k"), graft.core.Num.cents(col("l_extendedprice")).as("cents"))
  }

  /** The distinct-key dimension with its derived tag. */
  private def hotKeyDim(big: DataFrame): DataFrame =
    big.select(col("k").as("k2")).distinct().withColumn("tag", col("k2") % 97)

  /** The AQE form of the scenario. */
  def skewedRevenueByTag(sess: SparkSession, dir: String): DataFrame = {
    // AQE splits a skewed reduce partition along MAP-output boundaries, so
    // the split granularity is the mapper count. The gate testdata is one
    // single-row-group parquet file = ONE map task = nothing to split along;
    // a 100 TB table is thousands of files/row groups and has the mapper
    // fan-out naturally. The round-robin repartition stands in for that
    // multi-file layout (and is itself the usual first move when a source
    // arrives as one fat file).
    val big = hotKeyFact(sess, dir).repartition(8)
    // The dimension is MATERIALIZED (as a real pipeline's dim table would
    // already be): AQE's skew rule only matches a join whose inputs are
    // direct shuffle reads — a distinct's final aggregate between the sort
    // and the shuffle stage hides the skew from it. The gate query evicts
    // these dim-sized blocks after its result materializes (sessions share
    // one block manager, so nothing else would reclaim them).
    val dim = hotKeyDim(big).localCheckpoint()
    // guide §3.1: shuffled-HASH join skips both sides' sorts — the dim side
    // is distinct keys (hash table per partition stays key-sized), and AQE's
    // OptimizeSkewedJoin splits SHJ partitions exactly as it splits SMJ, so
    // the skew mechanism under test is unchanged (isSkewJoin spec-asserted).
    // An explicit hint because `preferSortMergeJoin=false` alone can never
    // choose SHJ here: the gate pins autoBroadcastJoinThreshold=-1, which
    // also disables the planner's canBuildLocalHashMap size test.
    big.join(dim.hint("SHUFFLE_HASH"), col("k") === col("k2"))
      .groupBy(col("tag"))
      .agg(count(lit(1)).as("n_items"), sum(col("cents")).as("rev_cents"))
  }

  /** The skew-split capability as an oracle-checked gate row: the query runs
    * in a child session with the AQE skew thresholds scaled to gate-size
    * shuffles, so the hot partition (25% of the fact table on one key) is
    * SPLIT across tasks at runtime instead of serializing on one straggler.
    * Correctness is the oracle's (split partitions must merge losslessly);
    * the `isSkewJoin` plan marker is spec-asserted on the same builder.
    */
  val joinSkewAqeSplit: QueryDef = QueryDef(
    "join_skew_aqe_split", hotKeyOracleSql) { (spark, dir) =>
    val sess = spark.newSession()
    skewConfs.foreach { case (k, v) => sess.conf.set(k, v) }
    // materialize the ≤97-row result, then evict the dim checkpoint blocks
    // the builder created (repeat bench passes would otherwise accumulate
    // one dim-sized cached table per invocation in the shared block manager)
    val (df, tracked) = Pinned.withTrackedRdds(sess) {
      skewedRevenueByTag(sess, dir)
    }
    val result = df.localCheckpoint()
    Pinned.unpersistRdds(sess, tracked)
    result
  }

  /** The EXPLICIT salting fallback as an oracle-checked row — for the skew
    * AQE cannot fix (a small side too big to broadcast, or an engine
    * without runtime re-planning): the fact side spreads each hot key over
    * content-derived salt sub-keys, the dim side replicates once per salt,
    * and the join key becomes (key, salt) — hot-key rows land on
    * `saltFactor` reducers instead of one. Result-identity with the plain
    * join is the whole contract, which is exactly what the oracle states
    * (the same hot-key collapse as `join_skew_aqe_split`, joined plainly).
    */
  val joinSaltedHotKey: QueryDef = QueryDef(
    "join_salted_hot_key", hotKeyOracleSql) { (spark, dir) =>
    // child session with auto-broadcast OFF, like the sibling gates: a
    // broadcast of the replicated dim would skip the (key, salt) shuffle
    // the salting exists to spread — the capability would be graded while
    // executing the plan it was built to avoid
    val sess = spark.newSession()
    sess.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val big = hotKeyFact(sess, dir)
    Skew.saltedEquiJoin(big, hotKeyDim(big), col("k"), col("k2"), saltFactor = 8)
      .groupBy(col("tag"))
      .agg(count(lit(1)).as("n_items"), sum(col("cents")).as("rev_cents"))
  }

  val all: Seq[QueryDef] =
    Seq(joinBucketedColocated, joinSkewAqeSplit, joinSaltedHotKey)
}
