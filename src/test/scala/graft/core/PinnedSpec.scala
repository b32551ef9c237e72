package graft.core

import graft.SparkSpec

/** The diff-based RDD tracking in [[Pinned.withTrackedRdds]] is only sound
  * under sequential query execution (its eviction destroys localCheckpoint
  * blocks with no recompute path). These specs pin the guard that turns a
  * violated assumption into a loud failure instead of corrupted sibling
  * queries.
  */
class PinnedSpec extends SparkSpec {

  test("withTrackedRdds returns created persistent-RDD ids and the body's value") {
    val (v, ids) = Pinned.withTrackedRdds(spark) {
      val df = spark.range(100).toDF("id").persist()
      df.count() // materialize so the block registers
      df.count()
    }
    assert(v === 100L)
    assert(ids.nonEmpty)
    Pinned.unpersistRdds(spark, ids)
    assert(ids.forall(id => !spark.sparkContext.getPersistentRDDs.contains(id)))
  }

  test("overlapping trackers on one context fail loudly (sequential-execution guard)") {
    val err = intercept[IllegalStateException] {
      Pinned.withTrackedRdds(spark) {
        // a sibling query starting its own tracked window mid-flight is
        // exactly the parallel-runner scenario the diff cannot survive
        Pinned.withTrackedRdds(spark) { 1 }
      }
    }
    assert(err.getMessage.contains("concurrent tracker"))
    // the guard must release its slot on failure: a fresh tracker works
    val (v, _) = Pinned.withTrackedRdds(spark) { 42 }
    assert(v === 42)
  }
}
