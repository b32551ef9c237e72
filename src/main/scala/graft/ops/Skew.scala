package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities.
  *
  * A shuffle join on a key with a few hot values puts a whole hot key in one
  * task. When the small side is still too big to broadcast, salting restores
  * parallelism: the big side spreads each key over `saltFactor` sub-keys
  * (derived from a per-row value — the *result* is independent of the salt),
  * the small side replicates once per salt value, and the join key becomes
  * (key, salt). Shuffle volume: big side unchanged, small side × saltFactor.
  *
  * (First resorts remain `broadcast()` for genuinely small dims and AQE's
  * skew-join splitting — this is the explicit fallback for the cases those
  * can't cover.)
  */
object Skew {

  def saltedEquiJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: Column,
      smallKey: Column,
      saltFactor: Int = 16): DataFrame = {
    require(saltFactor > 1)
    // Content-derived salt (hash of the whole row), not
    // monotonically_increasing_id(): the result set is identical either way,
    // but a content salt is stable under task retry / input re-split, so a
    // recomputed partition shuffles every row to the same reducer as the
    // first attempt. Fully identical rows share a salt — harmless, since
    // salting only needs to spread a hot KEY's rows, which differ elsewhere.
    val salted = big.withColumn(
      "__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(saltFactor.toLong)).cast("int"))
    val replicated = small.withColumn(
      "__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted
      .join(replicated, bigKey === smallKey && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
