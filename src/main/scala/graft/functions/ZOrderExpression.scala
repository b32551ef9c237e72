package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ImplicitCastInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.graftbridge.Bridge.AbstractType
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of two non-negative 32-bit coordinates into
  * one 64-bit sort key: bit i of `x` lands at position 2i, bit i of `y` at
  * 2i+1.
  *
  * Sorting data files by this key clusters rows that are close in BOTH
  * dimensions into the same files/row-groups, so plain per-column min/max
  * statistics (parquet footers, file pruning) skip effectively for
  * predicates on EITHER column — the standard multi-dimensional layout
  * technique for 100 TB scan-heavy tables, where a single-column sort only
  * helps its own column.
  *
  * Pure bit arithmetic (five spread steps per coordinate), so any engine can
  * recompute it — the DuckDB oracle reproduces the exact same shifts.
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // declared so int children COERCE to long at analysis (codegen would
  // silently widen while interpreted eval would CCE — same query,
  // different outcome by evaluation mode, without this)
  override def inputTypes: Seq[AbstractType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder2.compute(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.ZOrder2.compute($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {

  /** Spread the low 32 bits of v to the even bit positions of a long. */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)

  def zorder2(x: Column, y: Column): Column =
    Bridge.column(ZOrder2(Bridge.expression(x), Bridge.expression(y)))

  /** The five spread steps as staged SQL (one CTE per step keeps the oracle
    * linear in size; textual nesting would double the expression per step).
    * Produces SQL text `spread_<n> AS (SELECT *, ... )` column chains — used
    * by the layout query's oracle.
    */
  val SpreadMasks: Seq[(Long, Int)] = Seq(
    (281470681808895L, 16), // 0x0000FFFF0000FFFF
    (71777214294589695L, 8), // 0x00FF00FF00FF00FF
    (1085102592571150095L, 4), // 0x0F0F0F0F0F0F0F0F
    (3689348814741910323L, 2), // 0x3333333333333333
    (6148914691236517205L, 1)) // 0x5555555555555555
}
