package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

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

  /** True if the type contains a MapType anywhere (Spark's hash functions
    * reject maps — element order is undefined).
    */
  private def hasMapType(dt: DataType): Boolean = dt match {
    case _: MapType => true
    case ArrayType(et, _) => hasMapType(et)
    case st: StructType => st.fields.exists(f => hasMapType(f.dataType))
    case _ => false
  }

  def saltedEquiJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: Column,
      smallKey: Column,
      saltFactor: Int = 16): DataFrame = {
    require(saltFactor > 1)
    // Content-derived salt (hash of the row's hashable columns), not
    // monotonically_increasing_id(): the result set is identical either way,
    // but a content salt is stable under task retry / input re-split, so a
    // recomputed partition shuffles every row to the same reducer as the
    // first attempt. Known trade-off: rows that are FULLY identical share a
    // salt, so a hot key consisting of exact duplicate rows is not spread —
    // if that is the skew shape, deduplicate-with-count or aggregate first.
    // MapType columns are unhashable in Spark and are excluded from the salt.
    val hashable = big.schema.fields
      .filterNot(f => hasMapType(f.dataType))
      .map(f => col(f.name))
    val salted = big.withColumn(
      "__salt",
      if (hashable.isEmpty)
        pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor.toLong)).cast("int")
      else
        pmod(xxhash64(hashable.toSeq: _*), lit(saltFactor.toLong)).cast("int"))
    val replicated = small.withColumn(
      "__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted
      .join(replicated, bigKey === smallKey && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
