package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** Session-scoped derive-once cache of pinned (checkpointed) derivations.
  *
  * A real pipeline derives its shared intermediates (near-dup edge tables,
  * dictionary encodings, trained models) ONCE per corpus and fans them out
  * to every consumer; this object is that contract for the query registry.
  * Each entry is keyed by (session, corpus dir, name); DataFrame entries
  * ([[table]]) are materialized with an eager `localCheckpoint()`, so
  * consumers replay cached blocks instead of re-running the derivation and
  * the lineage is cut (iterative callers stay planner-cheap). [[value]]
  * pins arbitrary derivations (model tuples, driver-side merge lists) whose
  * internals may checkpoint their own tables.
  *
  * Unlike ad-hoc per-object `TrieMap`s, entries are EVICTABLE: every
  * cached-RDD id created during a derivation is recorded at pin time (diff
  * of `getPersistentRDDs` around the derivation, under this object's lock),
  * so [[clear]] can unpersist the actual block-manager storage for a
  * session — a long-lived embedding process can pin per (session, corpus)
  * without leaking storage forever. [[pinnedKeys]] reports which tables a
  * session already paid for, which the bench harness uses to annotate
  * per-query timings (a family member that reads a pinned table measures
  * incremental cost only; the first consumer paid the derivation).
  */
object Pinned {

  private final case class Entry(v: Any, rddIds: Seq[Int])

  private val entries = TrieMap.empty[(SparkSession, String, String), Entry]

  // Access log for the bench harness: every `value`/`table` call records
  // (name, derivedNow) since the last drain, so a timed query run can be
  // annotated with the pinned families it reads and whether IT paid the
  // one-time derivation (first-consumer cost vs incremental cost — without
  // this marker the per-query medians under-state cold cost).
  // keyed by (name, dir), not name alone: identically-named derivations
  // for different corpora are different one-time costs, and merging them
  // would attribute corpus B's derivation to a query that only read A's
  private val touched =
    scala.collection.mutable.LinkedHashMap.empty[(String, String), Boolean]

  /** Drain the pinned-access log: (name, thisWindowDerivedIt), in first-touch
    * order, accumulated since the previous drain. A name appears once per
    * corpus dir it was touched under.
    */
  def drainTouched(): Seq[(String, Boolean)] = synchronized {
    val out = touched.toSeq.map { case ((name, _), derived) => (name, derived) }
    touched.clear()
    out
  }

  /** The pinned value `name` for (spark, dir), deriving it on first request.
    * The derivation's own `localCheckpoint()` blocks are recorded so
    * [[clear]] can free them.
    */
  def value[A](spark: SparkSession, dir: String, name: String)(
      derive: => A): A = synchronized {
    val hit = entries.contains((spark, dir, name))
    touched((name, dir)) = touched.getOrElse((name, dir), false) || !hit
    entries.getOrElseUpdate((spark, dir, name), {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val v = derive
      val ids = (spark.sparkContext.getPersistentRDDs.keySet -- before).toSeq.sorted
      Entry(v, ids)
    }).v.asInstanceOf[A]
  }

  /** The pinned table `name` for (spark, dir), deriving + eagerly
    * checkpointing it on first request and replaying the cached blocks
    * afterwards.
    */
  def table(spark: SparkSession, dir: String, name: String)(
      derive: => DataFrame): DataFrame =
    value(spark, dir, name)(derive.localCheckpoint()) // eager: blocks exist on return

  /** Names of derivations already pinned for (spark, dir), sorted. */
  def pinnedKeys(spark: SparkSession, dir: String): Seq[String] =
    entries.keys.collect { case (s, d, k) if (s eq spark) && d == dir => k }.toSeq.sorted

  /** Ids of every cached RDD currently OWNED by a pinned entry (recorded at
    * pin time). Excluded from [[withTrackedRdds]]'s result: evicting them
    * would break the still-valid pins.
    */
  private def pinnedRddIds: Set[Int] = synchronized {
    entries.values.flatMap(_.rddIds).toSet
  }

  /** Run `body` and also return the ids of persistent RDDs it created (the
    * same diff-of-`getPersistentRDDs` bookkeeping [[value]] uses) — for
    * query-scoped checkpoints that should be freed once their consumer
    * materializes, via [[unpersistRdds]]. Ids that a `Pinned` entry recorded
    * (a derivation pinned INSIDE `body`) are excluded — those blocks belong
    * to the pin's lifetime. NOTE the eviction is destructive, not advisory:
    * `localCheckpoint` truncates lineage, so an evicted block CANNOT
    * recompute — callers must only unpersist after the consumer of the
    * tracked checkpoints has fully materialized, and the gate's sequential
    * execution is what guarantees no other query's blocks land in the diff
    * window.
    */
  def withTrackedRdds[A](spark: SparkSession)(body: => A): (A, Seq[Int]) = {
    // The diff-of-getPersistentRDDs bookkeeping is only sound while NO
    // other query persists RDDs on the same context inside the window —
    // true today because the gate runs queries sequentially and sbt forks
    // tests serially. A future parallel runner would silently land foreign
    // ids in the diff and this eviction would destroy a sibling query's
    // localCheckpoint blocks (no recompute path). Make that assumption a
    // loud failure instead: overlapping trackers on one context throw.
    val n = activeTrackers.computeIfAbsent(spark.sparkContext, _ => new java.util.concurrent.atomic.AtomicInteger)
    if (n.incrementAndGet() > 1) {
      n.decrementAndGet()
      throw new IllegalStateException(
        "Pinned.withTrackedRdds: concurrent tracker detected on the same " +
          "SparkContext — the diff-based RDD tracking assumes sequential " +
          "query execution; a parallel runner needs per-query tagging " +
          "(localProperties) before this eviction is safe")
    }
    try {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val v = body
      val created = spark.sparkContext.getPersistentRDDs.keySet -- before
      (v, (created -- pinnedRddIds).toSeq.sorted)
    } finally n.decrementAndGet()
  }

  private val activeTrackers =
    new java.util.concurrent.ConcurrentHashMap[org.apache.spark.SparkContext, java.util.concurrent.atomic.AtomicInteger]

  /** Unpersist the given cached-RDD ids (non-blocking; missing ids are
    * already gone and skipped).
    */
  def unpersistRdds(spark: SparkSession, ids: Seq[Int]): Unit = {
    val live = spark.sparkContext.getPersistentRDDs
    ids.foreach(id => live.get(id).foreach(_.unpersist(blocking = false)))
  }

  /** Evict every derivation pinned under `spark`: drop the references and
    * unpersist their checkpoint blocks from the block manager.
    */
  def clear(spark: SparkSession): Unit = synchronized {
    entries.keys.filter(_._1 eq spark).toSeq.foreach { k =>
      entries.remove(k).foreach { e =>
        val live = spark.sparkContext.getPersistentRDDs
        e.rddIds.foreach(id => live.get(id).foreach(_.unpersist(blocking = false)))
      }
    }
  }
}
