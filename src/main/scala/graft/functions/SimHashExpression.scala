package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.graftbridge.Bridge.AbstractType
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of a token array in one pass, entirely inside the row —
  * each token's xxhash64 votes ±1 on every bit, the sign of the tally is the
  * signature bit.
  *
  * The composable form (explode tokens → hash → groupBy(doc) with 64
  * conditional sums) pays a generator, a shuffle on doc_id, and 64 aggregate
  * buffers per group. Per-row token arrays make the whole computation local:
  * this expression folds the votes in a 64-int stack array with zero shuffle
  * — at 100 TB that converts SimHash signatures from an aggregation stage
  * into a free map-side column.
  *
  * Two hash families, chosen per call:
  *  - default: `XXH64.hashUTF8String(token, 42)` — the same bytes-and-seed
  *    as Spark's built-in `xxhash64(token)`, so signatures are bit-identical
  *    to the explode/aggregate formulation (spec-asserted); fastest, but
  *    engine-internal, so not oracle-reproducible.
  *  - portable: two polynomial code-point folds combined into a 60-bit hash
  *    (`p31 * 2^30 + p131`, both mod primes < 2^30) — exactly replayable in
  *    any engine with arithmetic (the DuckDB oracle uses
  *    `list_reduce(list_prepend(0, ...))`), making the SimHash query
  *    value-checkable cross-engine. Bits 60..63 are always 0.
  */
case class SimHash64(child: Expression, portable: Boolean = false)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = if (portable) "simhash64p" else "simhash64"

  override def nullSafeEval(v: Any): Any =
    SimHash64.compute(v.asInstanceOf[ArrayData], portable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c, $portable)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  // largest primes below 2^30 — keep p * mult + cp (and p * p in the mixing
  // rounds) inside int64
  final val Mod1 = 1073741789L
  final val Mod2 = 1073741783L

  /** Two quadratic mixing rounds: a plain polynomial fold is linear in the
    * code points (bit 0 is the parity of their sum), which makes SimHash
    * votes correlate heavily across vocabulary-sharing documents. x² mod p
    * is nonlinear in the bits, stays under 2^60 (overflow-safe in ANY
    * engine's int64 — the portability constraint), and restores per-bit
    * balance.
    */
  def mix(x: Long, p: Long): Long = {
    val y = (x * x + 987654321L) % p
    (y * y + 123456789L) % p
  }

  /** 60-bit portable token hash: two polynomial folds over code points.
    * ASCII bytes fold directly off the UTF8String buffer (no String
    * allocation — the common case for this corpus); a multi-byte lead byte
    * falls back to code-point decoding so the result always equals the
    * fold over Unicode code points (what the oracle's `ord()` sees).
    */
  def portableHash(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val n = s.numBytes()
    var p1 = 0L
    var p2 = 0L
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b >= 0) { // single-byte code point
        p1 = (p1 * 31L + b) % Mod1
        p2 = (p2 * 131L + b) % Mod2
        i += 1
      } else {
        // rare multi-byte path: redo the whole token via String code points
        val str = s.toString
        p1 = 0L
        p2 = 0L
        var j = 0
        val m = str.length
        while (j < m) {
          val cp = str.codePointAt(j)
          p1 = (p1 * 31L + cp) % Mod1
          p2 = (p2 * 131L + cp) % Mod2
          j += Character.charCount(cp)
        }
        i = n
      }
    }
    mix(p1, Mod1) * 1073741824L + mix(p2, Mod2) // mixed p1 << 30 | mixed p2
  }

  /** Static entry point shared by interpreted eval and generated code.
    * Token multiplicity counts (every occurrence votes); null tokens skip.
    * Ties (vote sum 0) resolve to bit 0, matching `sum > 0` semantics.
    */
  def compute(arr: ArrayData, portable: Boolean): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = if (portable) portableHash(s) else XXH64.hashUTF8String(s, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  def simhash64(c: Column, portable: Boolean = false): Column =
    Bridge.column(SimHash64(Bridge.expression(c), portable))
}
