package graft.functions

import graft.sources.NdvSketch
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge.AbstractType
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** SQL surface over the engine's [[NdvSketch]] (exact distinct set below
  * 2048 values, HLL above): the storage shape of `count(DISTINCT x)`
  * materialized-view components. `ndv_sketch_agg(x)` aggregates a group's
  * values into a serialized sketch, `ndv_union(a, b)` folds two sketches
  * (the MERGE's component update — set-union semantics, so re-inserting
  * a value already counted is a no-op), `ndv_estimate(a)` reads the
  * distinct count back (EXACT while the group stayed under the sketch's
  * exact-mode ceiling, ±2.3% beyond it). All three are maintenance-path
  * operators (MV refresh / serving), not scan-hot-path expressions —
  * interpreted eval is the right cost tier.
  */
case class NdvSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[NdvSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): NdvSketch = NdvSketch.empty()

  override def update(b: NdvSketch, row: InternalRow): NdvSketch = {
    val v = child.eval(row)
    // NULL never counts toward DISTINCT (SQL count(DISTINCT x) semantics)
    if (v != null) b.addHash(NdvSketch.hashOf(v))
    b
  }

  override def merge(b: NdvSketch, o: NdvSketch): NdvSketch = { b.merge(o); b }
  override def eval(b: NdvSketch): Any = b.toBytes
  override def serialize(b: NdvSketch): Array[Byte] = b.toBytes
  override def deserialize(bytes: Array[Byte]): NdvSketch = NdvSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(n: Int): NdvSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): NdvSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NdvSketchAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "ndv_sketch_agg"
}

/** Set-union of two serialized sketches; NULL-tolerant (NULL ∪ x = x —
  * the MERGE's not-yet-seen side).
  */
case class NdvUnion(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = left.nullable && right.nullable

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null) r
    else if (r == null) l
    else {
      val a = NdvSketch.fromBytes(l.asInstanceOf[Array[Byte]])
      a.merge(NdvSketch.fromBytes(r.asInstanceOf[Array[Byte]]))
      a.toBytes
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NdvUnion =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "ndv_union"
}

/** Distinct-count readback of a serialized sketch. */
case class NdvEstimate(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractType] = Seq(BinaryType)
  override def dataType: DataType = LongType

  override protected def nullSafeEval(v: Any): Any =
    NdvSketch.fromBytes(v.asInstanceOf[Array[Byte]]).estimate

  override protected def withNewChildInternal(newChild: Expression): NdvEstimate =
    copy(child = newChild)
  override def prettyName: String = "ndv_estimate"
}
