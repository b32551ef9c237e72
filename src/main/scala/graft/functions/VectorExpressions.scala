package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ImplicitCastInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.graftbridge.Bridge.AbstractType
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expressions for the vector hot path.
  *
  * The composable form — `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, +)` —
  * is correct but interpreted: each row allocates an intermediate product
  * array and walks it through `HigherOrderFunction` lambda plumbing, outside
  * whole-stage codegen. These expressions generate a primitive `long` loop
  * over the two `ArrayData` buffers inside WholeStageCodegen — no per-row
  * allocation, no virtual dispatch per element. Same exact integer result,
  * so swapping them into a query never changes oracle output.
  *
  * (Preference order per the build plan: compose built-ins first; drop to a
  * custom `Expression` with `doGenCode` only where the built-ins can't give
  * the right shape — here, the allocation-free inner loop.)
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // declared, not assumed: the SQL surface (`GraftExtensions`) admits
  // arbitrary arguments, and without inputTypes a type misuse would pass
  // analysis and CCE at runtime (int arrays coerce to long arrays here)
  override def inputTypes: Seq[AbstractType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "long_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Hamming distance between two 64-bit signatures (SimHash verification). */
case class HammingDistance64(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // bigint signatures; declared so SQL misuse (strings) is an analysis
  // error and narrower integrals coerce instead of CCE-ing at eval
  override def inputTypes: Seq[AbstractType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hamming64"

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long]).toLong

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (long) java.lang.Long.bitCount($a ^ $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance64 =
    copy(left = newLeft, right = newRight)
}

/** Intersection size of two SORTED-ASCENDING int arrays by two-pointer
  * merge — the verification kernel of the containment join.
  *
  * `array_intersect` builds a per-row hash set (allocation + hashing per
  * element, outside whole-stage codegen's primitive path); on pre-sorted
  * dictionary ids the merge walk is branch-cheap, allocation-free, and
  * codegen'd. CALLER CONTRACT: both arrays sorted ascending and duplicate-
  * free (dictionary-encoded sets are), else the count is meaningless.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractType] =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType))
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0
    var j = 0
    var acc = 0L
    while (i < nx && j < ny) {
      val xi = x.getInt(i)
      val yj = y.getInt(j)
      if (xi == yj) { acc += 1L; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val acc = ctx.freshName("acc")
      val xi = ctx.freshName("xi")
      val yj = ctx.freshName("yj")
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $acc = 0L;
         |while ($i < $nx && $j < $ny) {
         |  int $xi = $a.getInt($i); int $yj = $b.getInt($j);
         |  if ($xi == $yj) { $acc++; $i++; $j++; }
         |  else if ($xi < $yj) { $i++; } else { $j++; }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Exact integer dot product of two array<bigint> columns (codegen'd). */
  def longDot(a: Column, b: Column): Column =
    Bridge.column(
      LongDotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Popcount of XOR of two bigint columns (codegen'd). */
  def hamming64(a: Column, b: Column): Column =
    Bridge.column(
      HammingDistance64(Bridge.expression(a), Bridge.expression(b)))

  /** |a ∩ b| of two sorted duplicate-free array<int> columns (codegen'd). */
  def sortedIntersectCount(a: Column, b: Column): Column =
    Bridge.column(
      SortedIntersectCount(Bridge.expression(a), Bridge.expression(b)))
}
