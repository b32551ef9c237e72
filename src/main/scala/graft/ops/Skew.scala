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
    val salted = big.withColumn(
      "__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor.toLong)).cast("int"))
    val replicated = small.withColumn(
      "__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted
      .join(replicated, bigKey === smallKey && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
