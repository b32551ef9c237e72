package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCoercion
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, Cast, Expression, JoinedRow, NamedExpression, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.Bridge

/** Native backward as-of join — the whole-operator custom-Catalyst tier
  * (logical node + planner strategy + physical operator, registered through
  * `SparkSessionExtensions`), used where composing built-ins can't give the
  * right *physical shape*:
  *
  * The composable form (tag + union + `last(_, ignoreNulls)` carry-forward
  * window, see `ops.Events.asofJoin`) is semantically right but pays for
  * generality: the union widens both inputs to a common schema, and
  * `WindowExec` buffers each partition's rows in an (spillable) window frame
  * it doesn't actually need for a running `last`.
  *
  * This operator instead *declares* its needs to the planner — children
  * co-clustered on the join keys (`ClusteredDistribution`) and sorted by
  * (keys, time) (`requiredChildOrdering`) — and then streams the per-key
  * merge with O(1) state: one retained right row per key. Catalyst's
  * `EnsureRequirements` inserts the minimal exchanges/sorts exactly as it
  * does for a sort-merge join, AQE still re-plans partition counts at
  * runtime, and already-partitioned inputs (bucketed tables) join with no
  * shuffle at all — the properties that matter when the left side is 100 TB.
  *
  * Semantics (matches DuckDB `ASOF LEFT JOIN ... ON l.k = r.k AND l.t >= r.t`,
  * or `l.t <= r.t` when `forward`): each left row pairs with the latest
  * right row of the same key at-or-before the left time (backward), or the
  * earliest right row at-or-after it (forward); unmatched left rows keep
  * nulls. An optional `tolerance` (in the time column's native units —
  * micros for timestamps, days for dates, raw for integers) additionally
  * bounds |l.t − r.t|: a match farther away than the tolerance emits nulls,
  * the pandas `merge_asof(tolerance=...)` contract. Null keys follow SQL
  * equality — a left row with any null key gets nulls, a right row with any
  * null key never matches. Right rows with null time never match; a null
  * left time matches nothing. Ties on right time keep the row latest
  * (backward) / earliest (forward) in (key, time) sort order — equal times
  * always match in both directions.
  */
case class AsofJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    forward: Boolean = false,
    tolerance: Option[Long] = None)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans the logical [[AsofJoin]] into [[AsofJoinExec]]. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt, fwd, tol) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, fwd, tol) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    forward: Boolean = false,
    tolerance: Option[Long] = None)
  extends BinaryExecNode {

  // The merge compares right-side rows under orderings built from LEFT-side
  // types; a type mismatch would read garbage field bytes and silently
  // return wrong results. The builder widens both sides to a common type —
  // this guards direct construction of the node.
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    s"asof join key types must match: ${leftKeys.map(_.dataType)} vs ${rightKeys.map(_.dataType)}")
  require(leftTime.dataType == rightTime.dataType,
    s"asof join time types must match: ${leftTime.dataType} vs ${rightTime.dataType}")
  require(tolerance.forall(_ >= 0L), s"asof tolerance must be non-negative: $tolerance")
  require(tolerance.isEmpty || AsofJoinExec.numericTime(leftTime.dataType).isDefined,
    s"asof tolerance needs an integer-comparable time type " +
      s"(timestamp/date/integral), got ${leftTime.dataType}")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val rightWidth = right.output.size
    val fwd = forward
    val tol = tolerance
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), left.output)
      val rTimeProj = UnsafeProjection.create(Seq(rightTime), right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val resultProj = UnsafeProjection.create(output, output)
      val nullRight = InternalRow.fromSeq(Seq.fill[Any](rightWidth)(null))
      val joined = new JoinedRow
      // integer view of the time column, used only when a tolerance is set
      // (construction-time require guarantees the type is supported then)
      val timeNum: InternalRow => Long =
        AsofJoinExec.numericTime(timeType).getOrElse(_ => 0L)

      if (fwd) new Iterator[InternalRow] {
        // rHead: the next not-yet-consumed right row — in forward mode it is
        // also the match candidate, held WITHOUT copy across left rows (the
        // sorter reuses its buffer only on next(), which we never call while
        // rHead is retained).
        private var rHead: InternalRow = _
        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          if (lKey.anyNull) return resultProj(joined(lRow, nullRight))
          val lTimeRow = lTimeProj(lRow).copy()
          if (lTimeRow.isNullAt(0)) return resultProj(joined(lRow, nullRight))
          // Discard right rows that can no longer match this or ANY later
          // left row (left times are non-decreasing within the key): rows of
          // earlier keys, null keys/times (nulls sort first), and same-key
          // rows strictly before the left time. Stop at the first same-key
          // row at-or-after the left time — the forward match candidate.
          var scan = true
          var candidate: InternalRow = null
          while (scan) {
            if (rHead == null) {
              if (rIter.hasNext) rHead = rIter.next() else scan = false
            }
            if (rHead != null) {
              val rKey = rKeyProj(rHead)
              if (rKey.anyNull) {
                rHead = null
              } else {
                val c = keyOrd.compare(rKey, lKey)
                if (c < 0) {
                  rHead = null
                } else if (c > 0) {
                  scan = false // right is ahead; keep for a later left key
                } else {
                  val rTimeRow = rTimeProj(rHead)
                  if (rTimeRow.isNullAt(0)) {
                    rHead = null
                  } else if (timeOrd.compare(rTimeRow, lTimeRow) < 0) {
                    rHead = null // strictly before: dead for all later lefts too
                  } else {
                    candidate = rHead
                    scan = false
                  }
                }
              }
            }
          }
          val ok = candidate != null &&
            tol.forall(t => timeNum(rTimeProj(candidate)) - timeNum(lTimeRow) <= t)
          resultProj(joined(lRow, if (ok) candidate else nullRight))
        }
      }
      else new Iterator[InternalRow] {
        // rHead: the next not-yet-consumed right row. Sorter iterators reuse
        // their row buffer only on next(), so holding the reference between
        // output rows (without copy) is safe; lastRight outlives further
        // next() calls and therefore must be copied.
        private var rHead: InternalRow = _
        private var lastRight: InternalRow = _
        private var lastRightKey: InternalRow = _
        private var lastRightTimeNum: Long = 0L
        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          // SQL equality: a null key matches nothing — emit nulls without
          // touching the scan (null keys sort first, so no right row is lost)
          if (lKey.anyNull) return resultProj(joined(lRow, nullRight))
          if (lastRight != null && keyOrd.compare(lastRightKey, lKey) != 0) {
            lastRight = null
            lastRightKey = null
          }
          val lTimeRow = lTimeProj(lRow).copy()
          if (!lTimeRow.isNullAt(0)) {
            var scan = true
            while (scan) {
              if (rHead == null) {
                if (rIter.hasNext) rHead = rIter.next() else scan = false
              }
              if (rHead != null) {
                val rKey = rKeyProj(rHead)
                if (rKey.anyNull) {
                  rHead = null // null right keys never join (SQL equality)
                } else {
                  val c = keyOrd.compare(rKey, lKey)
                  if (c < 0) {
                    rHead = null // right group entirely before any remaining left key
                  } else if (c > 0) {
                    scan = false // right is ahead; keep for a later left key
                  } else {
                    val rTimeRow = rTimeProj(rHead)
                    if (rTimeRow.isNullAt(0)) {
                      rHead = null // null right time never matches
                    } else if (timeOrd.compare(rTimeRow, lTimeRow) <= 0) {
                      lastRight = rHead.copy()
                      lastRightKey = rKey.copy()
                      if (tol.isDefined) lastRightTimeNum = timeNum(rTimeRow)
                      rHead = null
                    } else {
                      scan = false // right row is in the future for this left row
                    }
                  }
                }
              }
            }
          }
          val within = lastRight != null && !lTimeRow.isNullAt(0) &&
            tol.forall(t => timeNum(lTimeRow) - lastRightTimeNum <= t)
          resultProj(joined(lRow, if (within) lastRight else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsofJoinExec {
  import org.apache.spark.sql.types._

  /** Integer view of a time column for tolerance arithmetic — types whose
    * physical representation is an integral (timestamps are micros, dates
    * days). None = tolerance unsupported for the type.
    */
  def numericTime(t: DataType): Option[InternalRow => Long] = t match {
    case LongType | TimestampType | TimestampNTZType => Some(_.getLong(0))
    case IntegerType | DateType => Some(_.getInt(0).toLong)
    case ShortType => Some(_.getShort(0).toLong)
    case ByteType => Some(_.getByte(0).toLong)
    case _ => None
  }
}

/** DataFrame-level builder for the native as-of join. */
object AsofJoinNative {

  /** As-of left join: every `left` row + the latest `right` row with the
    * same key and `right.timeCol <= left.timeCol` (direction "backward",
    * the default), or the earliest with `right.timeCol >= left.timeCol`
    * (direction "forward"). `tolerance`, when set, bounds |l.t − r.t| in
    * the time column's native units (micros for timestamps, days for
    * dates) — a match farther away emits nulls, pandas
    * `merge_asof(tolerance=...)` style. Right columns are re-aliased
    * fresh, so self-joins (both sides derived from one scan) are
    * unambiguous; pre-rename right columns if names would collide.
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[(String, String)],
      leftTimeCol: String,
      rightTimeCol: String,
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    val forward = direction match {
      case "backward" => false
      case "forward" => true
      case other => throw new IllegalArgumentException(
        s"asof direction must be 'backward' or 'forward', got '$other'")
    }
    val lPlan = left.queryExecution.analyzed
    // Fresh exprIds on the right side: both inputs often derive from the
    // same scan, and a custom node gets no DeduplicateRelations help.
    val rAnalyzed = right.queryExecution.analyzed
    val rAliases: Seq[NamedExpression] =
      rAnalyzed.output.map(a => Alias(a, a.name)())
    val rPlan = Project(rAliases, rAnalyzed)

    def resolve(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in [${plan.output.map(_.name).mkString(", ")}]"))

    // Widen each key/time pair to a tight common type — the physical merge
    // compares right rows under left-typed orderings, so mismatched types
    // (e.g. int key vs long key) would otherwise read garbage bytes.
    def aligned(l: Expression, r: Expression, what: String): (Expression, Expression) =
      if (l.dataType == r.dataType) (l, r)
      else TypeCoercion.findTightestCommonType(l.dataType, r.dataType) match {
        case Some(t) =>
          (if (l.dataType == t) l else Cast(l, t),
            if (r.dataType == t) r else Cast(r, t))
        case None => throw new IllegalArgumentException(
          s"asof join: incompatible $what types ${l.dataType} vs ${r.dataType}")
      }

    val (lk, rk) = keys.map { case (l, r) =>
      aligned(resolve(lPlan, l), resolve(rPlan, r), s"key ($l = $r)")
    }.unzip
    val (lt, rt) =
      aligned(resolve(lPlan, leftTimeCol), resolve(rPlan, rightTimeCol),
        s"time ($leftTimeCol >= $rightTimeCol)")
    tolerance.foreach { t =>
      if (t < 0L) throw new IllegalArgumentException(
        s"asof tolerance must be non-negative, got $t")
      if (AsofJoinExec.numericTime(lt.dataType).isEmpty)
        throw new IllegalArgumentException(
          s"asof tolerance needs an integer-comparable time type " +
            s"(timestamp/date/integral), got ${lt.dataType}")
    }
    Bridge.ofRows(left.sparkSession,
      AsofJoin(lPlan, rPlan, lk, rk, lt, rt, forward, tolerance))
  }
}
