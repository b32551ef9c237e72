package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule

/** READ-side resolution of graft-catalog VIEWS. OSS Spark 4.1 ships the
  * `ViewCatalog` API but wires neither `CREATE VIEW` nor relation
  * resolution against it (`ResolveSessionCatalog` throws
  * UNSUPPORTED_FEATURE for any non-session catalog), so — exactly like
  * Iceberg's Spark extensions — the engine injects the resolution itself:
  * an `UnresolvedRelation` naming `<graft catalog>.<view>` expands to the
  * stored SQL, re-parsed in place, and the analyzer's fixpoint then
  * resolves the expansion (nested views and time travel underneath both
  * compose for free). DDL rides `CALL graft.create_view/drop_view`
  * ([[graft.sources.CreateViewProcedure]]) — the V2 SQL commands don't
  * exist to intercept.
  */
case class ResolveGraftViews(spark: SparkSession) extends Rule[LogicalPlan] {

  private def isGraftCatalog(name: String): Boolean =
    try spark.sessionState.catalogManager.catalog(name)
      .isInstanceOf[graft.sources.SeqCatalog]
    catch { case _: Exception => false }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation if u.multipartIdentifier.length == 2 &&
          graft.sources.MemViews.views.contains(u.multipartIdentifier(1)) &&
          isGraftCatalog(u.multipartIdentifier.head) =>
        val name = u.multipartIdentifier(1)
        val v = graft.sources.MemViews.views(name)
        SubqueryAlias(name, spark.sessionState.sqlParser.parsePlan(v.sql))
    }
}
