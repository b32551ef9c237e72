package graft.sources

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.SparkContext
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{DataType, StructType}

/** Row-level DML evaluation shipped WHERE THE ROWS ARE — the executor
  * half of `DELETE FROM ... WHERE` and filtered OVERWRITE on FILE-BACKED
  * tables. The driver resolves everything metadata-shaped per candidate
  * batch (filter-column era/tombstone binding, ADD COLUMN defaults,
  * applicable equality-delete keys, the copy-on-write target directory)
  * into one serializable [[DistributedDml.EvalTask]]; a one-file-per-task
  * Spark job then streams each parquet file ONCE to find matches and — on
  * copy-on-write tables — a second time to write the survivor file, stats
  * and sortedness accumulating in the task exactly like an ordinary write
  * task. The driver gets back matched positions + a survivor manifest,
  * never rows: at 100 TB an arbitrary-predicate DELETE costs one pass of
  * the candidate batches ACROSS THE CLUSTER instead of pulling the table
  * through the driver (the round-13 standing scale wart).
  *
  * Semantics are identical to the driver-side evaluator they replace
  * (SQL three-valued logic over era-resolved values; survivors preserve
  * file order, so sorted-layout claims survive) — [[RowPredicate]] IS the
  * shared implementation, used by both paths.
  */
/** Serializable per-batch row-level filter conjunction under SQL
  * THREE-VALUED logic: a row matches only when the conjunction is
  * DEFINITIVELY true — under two-valued eval, `Not(v = 5)` over a NULL v
  * would wrongly read true (inner false → negated true) and delete rows
  * SQL must keep (`v <> 5`, `v NOT IN (...)` are unknown on NULL, not
  * true). Column resolution (era/tombstone binding to a field index, or
  * an ADD COLUMN default / NULL for unresolvable columns) happens at
  * CONSTRUCTION on the driver — so did the filter-shape validation: an
  * unsupported shape throws here, before any job launches or state
  * mutates (the loud-failure contract must not change shape because the
  * walk distributed).
  */
final class RowPredicate(
    filters: Array[Filter], colIndex: Map[String, Int],
    colDefault: Map[String, Any], schema: StructType) extends Serializable {

  filters.foreach(validate)

  private def validate(f: Filter): Unit = f match {
    case And(l, r) => validate(l); validate(r)
    case Or(l, r) => validate(l); validate(r)
    case Not(inner) => validate(inner)
    case EqualTo(_, _) | EqualNullSafe(_, _) | GreaterThan(_, _) |
        GreaterThanOrEqual(_, _) | LessThan(_, _) | LessThanOrEqual(_, _) |
        In(_, _) | IsNull(_) | IsNotNull(_) | AlwaysTrue() | AlwaysFalse() => ()
    case other => throw new UnsupportedOperationException(
      s"unsupported DELETE filter: $other")
  }

  private val types: Array[DataType] = schema.fields.map(_.dataType)

  /** Era/tombstone-resolved value exactly as a scan projects it:
    * unresolvable columns (pre-alter batches, dropped fields, pre-rename
    * names) read NULL — or their ADD COLUMN default where one applies (a
    * `DELETE WHERE c = <default>` must match pre-alter rows exactly as a
    * read shows them); widened columns surface their write-time value
    * ([[MemTables.cmp]] is numeric-promoting, so comparisons against the
    * bound type work).
    */
  private def valueOf(r: InternalRow, col: String): Any = {
    val i = colIndex(col)
    if (i < 0) colDefault.getOrElse(col, null)
    else if (r.isNullAt(i)) null
    else r.get(i, types(i))
  }

  import MemTables.cmp

  /** Kleene evaluation; None = unknown (a NULL operand). */
  private def eval(f: Filter, r: InternalRow): Option[Boolean] = f match {
    case EqualTo(c, v) => cmp(valueOf(r, c), v).map(_ == 0)
    case EqualNullSafe(c, v) =>
      // <=> is never unknown on NULL operands (the shape a static
      // partition-clause overwrite pushes): NULL<=>NULL is TRUE,
      // NULL<=>value is FALSE
      val rv = valueOf(r, c)
      if (rv == null && v == null) Some(true)
      else if (rv == null || v == null) Some(false)
      else cmp(rv, v).map(_ == 0)
    case GreaterThan(c, v) => cmp(valueOf(r, c), v).map(_ > 0)
    case GreaterThanOrEqual(c, v) => cmp(valueOf(r, c), v).map(_ >= 0)
    case LessThan(c, v) => cmp(valueOf(r, c), v).map(_ < 0)
    case LessThanOrEqual(c, v) => cmp(valueOf(r, c), v).map(_ <= 0)
    case In(c, vs) =>
      // true if any element matches; unknown if none match but any
      // comparison was unknown (x IN (1, NULL) is unknown, not false)
      val cs = vs.toSeq.map(v => cmp(valueOf(r, c), v))
      if (cs.exists(_.contains(0))) Some(true)
      else if (cs.exists(_.isEmpty)) None
      else Some(false)
    case IsNull(c) => Some(valueOf(r, c) == null)
    case IsNotNull(c) => Some(valueOf(r, c) != null)
    case And(l, rr) => (eval(l, r), eval(rr, r)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }
    case Or(l, rr) => (eval(l, r), eval(rr, r)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }
    case Not(inner) => eval(inner, r).map(!_) // NOT unknown = unknown
    case AlwaysTrue() => Some(true)
    case AlwaysFalse() => Some(false)
    case other => throw new UnsupportedOperationException(
      s"unsupported DELETE filter: $other")
  }

  def matches(r: InternalRow): Boolean =
    filters.forall(f => eval(f, r).contains(true))
}

/** One equality-delete's membership probe against one batch, key columns
  * already era-resolved to field indexes on the driver: a row is killed
  * when its canonicalized key tuple is in the delete's key set (a NULL or
  * unresolvable key never matches — the same rule
  * [[MemTables.effectiveKills]] applies driver-side).
  */
final case class EqProbe(
    keyIdx: Array[Int], keyTypes: Array[DataType],
    keys: Set[Seq[Any]]) extends Serializable {
  def kills(r: InternalRow): Boolean = {
    val tuple = keyIdx.indices.map { j =>
      if (r.isNullAt(keyIdx(j))) null
      else MemTables.canonKey(r.get(keyIdx(j), keyTypes(j)))
    }
    !tuple.contains(null) && keys.contains(tuple)
  }
}

/** An executor-written copy-on-write survivor file: the manifest the task
  * ships back (path, count, publish-grade stats, sortedness verdict) —
  * the driver builds the replacement batch from this, never from rows.
  */
final case class SurvivorFile(
    path: String, count: Int,
    stats: Map[String, MemTables.ColStats], sorted: Boolean)

object DistributedDml {

  /** Everything one executor task needs to evaluate one file-backed batch:
    * where the rows live, the bound predicate, the batch's already-dead
    * positions (delete-vector entries + equality-delete probes — dead rows
    * never match, mirroring the driver evaluator), and — copy-on-write
    * only — the directory to write the survivor file into (the task mints
    * the file name so a Spark retry writes a FRESH file instead of
    * colliding with the failed attempt's partial one; losers are orphans,
    * `remove_orphan_files`'s department).
    */
  final case class EvalTask(
      batchId: Long, path: String, schema: StructType,
      dvDead: Set[Int], probes: Seq[EqProbe], pred: RowPredicate,
      survivorDir: Option[String], declaredSort: Seq[String],
      bloomCols: Set[String]) extends Serializable

  final case class EvalResult(
      batchId: Long, matched: Array[Int],
      survivor: Option[SurvivorFile]) extends Serializable

  /** One task per candidate file (the same granularity the scan and the
    * distributed compaction use); results keyed by batch id.
    */
  def run(sc: SparkContext, tasks: Seq[EvalTask]): Map[Long, EvalResult] =
    if (tasks.isEmpty) Map.empty
    else sc.parallelize(tasks, tasks.size)
      .map(evalBatch).collect().iterator.map(r => r.batchId -> r).toMap

  /** Pass 1 streams the file to find matched positions; pass 2 (CoW, only
    * when matches exist) streams it again writing survivors — never both
    * in one pass, so an unmatched candidate (bounds kept it, rows didn't)
    * costs a read, not a rewrite. Two bounded passes, zero buffering: the
    * task's memory is the matched-position buffer + writer state.
    */
  private[sources] def evalBatch(t: EvalTask): EvalResult = {
    val matched = new ArrayBuffer[Int]
    val it = ParquetRows.iterator(t.path, t.schema)
    try {
      var pos = 0
      while (it.hasNext) {
        val r = it.next()
        val dead = t.dvDead.contains(pos) || t.probes.exists(_.kills(r))
        if (!dead && t.pred.matches(r)) matched += pos
        pos += 1
      }
    } finally it.close()
    if (matched.isEmpty) return EvalResult(t.batchId, Array.empty, None)
    t.survivorDir match {
      case None => EvalResult(t.batchId, matched.toArray, None) // MoR: positions only
      case Some(dir) =>
        val matchedSet = matched.toSet
        val path = s"$dir/delete-cow-" +
          s"${java.util.UUID.randomUUID().toString.take(12)}.parquet"
        val w = ParquetRows.open(path, t.schema)
        val acc = new StatsAccumulator(t.schema, t.bloomCols)
        val tracker = new SortTracker(t.schema, t.declaredSort)
        var kept = 0
        try {
          val it2 = ParquetRows.iterator(t.path, t.schema)
          try {
            var pos = 0
            while (it2.hasNext) {
              val r = it2.next()
              // survivors = everything but THIS delete's matches (dead
              // rows stay physically present exactly as the driver
              // rewrite keeps them; their kills remain recorded)
              if (!matchedSet.contains(pos)) {
                w.write(r); acc.add(r); tracker.add(r); kept += 1
              }
              pos += 1
            }
          } finally it2.close()
        } catch {
          case e: Throwable =>
            try w.close() catch { case _: Exception => () }
            try ParquetRows.delete(path) catch { case _: Exception => () }
            throw e
        }
        w.close()
        if (kept == 0) { // every row matched: the batch just disappears
          ParquetRows.delete(path)
          EvalResult(t.batchId, matched.toArray, None)
        } else EvalResult(t.batchId, matched.toArray,
          Some(SurvivorFile(path, kept, acc.result(), tracker.sorted)))
    }
  }
}
