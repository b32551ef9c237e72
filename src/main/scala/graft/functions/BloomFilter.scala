package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ImplicitCastInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.graftbridge.Bridge.AbstractType
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Distributed Bloom-filter runtime join filter — the pre-shuffle pruning
  * pattern for selective joins at scale: aggregate the (filtered) build
  * side's keys into an m-bit filter (map-side partial bitsets OR-merged in
  * one reduce), ship the blob to the probe side, and drop probe rows whose
  * key cannot be in the build side BEFORE they reach the join shuffle. False
  * positives only cost work (the exact join still runs); false negatives are
  * structurally impossible, so results are exact.
  *
  * This is the explicit form of what engines call a runtime filter /
  * sideways information passing: the build side is too big for an IN-list
  * collect, but its key SET compresses to m bits. At 100 TB the blob (say
  * 8 MiB for 10⁸ keys at ~1% fpp) broadcasts where the keys themselves
  * (gigabytes) could not.
  *
  * Blob layout (engine-defined, stable): byte 0 = number of hash probes k,
  * bytes 1-7 reserved, bytes 8.. = the bit array (little-endian bit order
  * within each byte). Bit count must be a power of two. Probes use splitmix64
  * double hashing — public-domain math (Steele et al., "Fast Splittable
  * Pseudorandom Number Generators", OOPSLA'14), same constants as
  * java.util.SplittableRandom.
  */
object BloomFilter {

  /** splitmix64 finalizer — the public-domain 64-bit mixer. */
  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Empty blob: k in byte 0, `numBits` zero bits. */
  def empty(numBits: Int, numHashes: Int): Array[Byte] = {
    // >= 8, not just > 0: 1/2/4 bits yield a ZERO-byte bit array whose
    // mask is -1, sending add()/mightContain() to arbitrary blob offsets
    require(numBits >= 8 && (numBits & (numBits - 1)) == 0,
      s"numBits must be a power of two >= 8: $numBits")
    require(numHashes > 0 && numHashes < 128, s"numHashes out of range: $numHashes")
    val blob = new Array[Byte](8 + numBits / 8)
    blob(0) = numHashes.toByte
    blob
  }

  @inline private def probes(blob: Array[Byte], key: Long): (Int, Long, Long, Int) = {
    val k = blob(0).toInt
    val mMask = ((blob.length - 8).toLong * 8L) - 1L
    val h1 = splitmix64(key)
    val h2 = splitmix64(h1) | 1L // odd => full-period stepping over 2^n bits
    (k, h1, h2, mMask.toInt)
  }

  /** Set the k probe bits for `key` in place. */
  def add(blob: Array[Byte], key: Long): Unit = {
    val (k, h1, h2, mMask) = probes(blob, key)
    var i = 0
    while (i < k) {
      val bit = ((h1 + i.toLong * h2) & mMask).toInt
      blob(8 + (bit >>> 3)) = (blob(8 + (bit >>> 3)) | (1 << (bit & 7))).toByte
      i += 1
    }
  }

  /** Probe: false = the key is definitely absent from the build side. */
  def mightContain(blob: Array[Byte], key: Long): Boolean = {
    val (k, h1, h2, mMask) = probes(blob, key)
    var i = 0
    while (i < k) {
      val bit = ((h1 + i.toLong * h2) & mMask).toInt
      if ((blob(8 + (bit >>> 3)) & (1 << (bit & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** OR-merge `other` into `acc` (same size/k required). */
  def merge(acc: Array[Byte], other: Array[Byte]): Array[Byte] = {
    require(acc.length == other.length && acc(0) == other(0),
      s"bloom merge of incompatible blobs: ${acc.length}/${acc(0)} vs ${other.length}/${other(0)}")
    var i = 8
    while (i < acc.length) { acc(i) = (acc(i) | other(i)).toByte; i += 1 }
    acc
  }

  /** Fraction of set bits — diagnostic for sizing (fpp ≈ load^k). */
  def loadFactor(blob: Array[Byte]): Double = {
    var set = 0L
    var i = 8
    while (i < blob.length) { set += java.lang.Integer.bitCount(blob(i) & 0xFF); i += 1 }
    set.toDouble / ((blob.length - 8).toLong * 8L)
  }

  /** Column wrapper for the codegen'd probe expression. */
  def mightContainCol(blob: Column, key: Column): Column =
    Bridge.column(BloomMightContain(Bridge.expression(blob), Bridge.expression(key)))
}

/** Codegen'd Bloom probe: `might_contain(blob BINARY, key BIGINT) -> BOOLEAN`.
  * The blob is normally a Literal (built by [[BloomBuildAggregator]] and
  * collected as bounded model state, like k-means centroids), so codegen
  * sees a constant byte-array reference and the probe inlines into the
  * scan's WholeStageCodegen — the filter runs at column-scan speed.
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractType] = Seq(BinaryType, LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(blob: Any, key: Any): Any =
    BloomFilter.mightContain(blob.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, k) => s"graft.functions.BloomFilter.mightContain($b, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

/** Typed aggregator building the blob distributively: per-partition bitsets,
  * OR-merged — one reduce, no key shuffle. Null keys are ignored (SQL
  * semantics: NULL never equi-joins, so it needs no bit).
  */
class BloomBuildAggregator(numBits: Int, numHashes: Int)
  extends Aggregator[java.lang.Long, Array[Byte], Array[Byte]] {

  override def zero: Array[Byte] = BloomFilter.empty(numBits, numHashes)

  override def reduce(acc: Array[Byte], key: java.lang.Long): Array[Byte] = {
    if (key != null) BloomFilter.add(acc, key.longValue())
    acc
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    BloomFilter.merge(a, b)

  override def finish(acc: Array[Byte]): Array[Byte] = acc

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
