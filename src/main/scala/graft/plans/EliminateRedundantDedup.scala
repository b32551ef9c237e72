package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Removes a `Deduplicate(keys, Aggregate(...))` that is provably a no-op.
  *
  * An Aggregate's output rows are unique on the tuple of its grouping
  * columns. If every grouping expression surfaces in the aggregate output
  * (as an attribute or an alias of the grouping expression) and all of those
  * output columns are contained in the dedup keys, then rows are already
  * unique on a *subset* of the keys — hence unique on the keys — and the
  * Deduplicate (a whole extra shuffle at 100 TB) can be dropped.
  *
  * Note the direction: dedup keys must be a *superset* of the grouping
  * outputs. Uniqueness on (a, b) implies uniqueness on (a, b, c), never the
  * reverse.
  *
  * The mechanical `dropDuplicates`-after-`groupBy` pattern shows up in
  * pipelines like the reference's (`run_pipeline` always dedups defensively,
  * `jobs/transform.py:174-181`) where the upstream happens to aggregate —
  * this rule makes the defensive op free. Installed by
  * [[graft.core.GraftExtensions]] via `injectOptimizerRule`.
  */
object EliminateRedundantDedup extends Rule[LogicalPlan] {

  private def groupingOutput(agg: Aggregate): Option[Seq[Attribute]] = {
    def outputFor(g: Expression): Option[Attribute] =
      agg.aggregateExpressions.collectFirst {
        case a: Attribute if a.semanticEquals(g) => a
        case al @ Alias(child, _) if child.semanticEquals(g) => al.toAttribute
      }
    val outs = agg.groupingExpressions.map(outputFor)
    if (outs.forall(_.isDefined)) Some(outs.flatten) else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Deduplicate(keys, agg: Aggregate) if agg.groupingExpressions.nonEmpty =>
      groupingOutput(agg) match {
        case Some(groupCols)
            if groupCols.forall(gc => keys.exists(_.semanticEquals(gc))) =>
          agg
        case _ => Deduplicate(keys, agg)
      }
  }
}
