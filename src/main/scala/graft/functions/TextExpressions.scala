package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.graftbridge.Bridge.AbstractType
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of a string's code points:
  * `h = fold(h * 31 + codePoint) mod 1e9+7` — the document-fingerprint hash.
  *
  * Identical math to the composable form
  * `aggregate(transform(sequence(1, length(text)), i -> ascii(substr(...))), ...)`
  * and to the DuckDB oracle's `list_reduce(list_prepend(0, ...))`, but
  * evaluated as a single tight loop over the string instead of
  * materializing an index array + per-character interpreted lambda calls —
  * O(len) with zero allocation vs O(len) allocations.
  */
case class PolyHash(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  // declared so SQL misuse (poly_hash(123)) is an AnalysisException, not
  // a ClassCastException out of constant folding
  override def inputTypes: Seq[AbstractType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(v: Any): Any =
    PolyHash.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  final val Mod = 1000000007L
  final val Mult = 31L

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * Mult + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  def polyHash(c: Column): Column = Bridge.column(PolyHash(Bridge.expression(c)))
}
