package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.graftbridge.Bridge.AbstractType
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** k-wide MinHash signature of a string set, in ONE pass over the array.
  *
  * The composable form — k separate `array_min(transform(s, x ->
  * xxhash64(i, x)))` columns — walks the shingle array k times through
  * interpreted `HigherOrderFunction` lambdas and hashes every shingle k
  * times. This expression is the codegen'd hot-path version: each shingle is
  * hashed twice (xxh64 with seeds 0 and 1) and the k hash family members are
  * derived as `g_i = h1 + i*h2` (Kirsch–Mitzenmacher double hashing, the
  * standard MinHash construction), updating all k minima in a single tight
  * loop — O(n·k) adds instead of O(n·k) full string hashes, zero per-row
  * allocation beyond the k-long result, and no interpreted lambda frames.
  *
  * At 100 TB the signature computation dominates MinHash-LSH candidate
  * generation (the banding shuffle carries only (doc_id, band, key)), so this
  * per-row loop is exactly the place a custom `Expression` pays for itself.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(k > 0, s"signature width must be positive, got $k")

  override def inputTypes: Seq[AbstractType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(v: Any): Any =
    MinHashSignature.compute(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSignature.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {

  /** Static entry point shared by interpreted eval and generated code.
    * Null elements are skipped; an empty set yields Long.MaxValue minima
    * (callers filter empty shingle sets anyway).
    */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h1 = XXH64.hashUTF8String(s, 0L)
        // force h2 odd: an even step would cycle through a strict subgroup
        val h2 = XXH64.hashUTF8String(s, 1L) | 1L
        var g = h1
        var j = 0
        while (j < k) {
          if (g < mins(j)) mins(j) = g
          g += h2
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def minhashSigs(c: Column, k: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(c), k))
}
