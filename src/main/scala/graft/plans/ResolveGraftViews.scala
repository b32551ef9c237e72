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
          isGraftCatalog(u.multipartIdentifier.head) &&
          (graft.sources.MemViews.views.contains(u.multipartIdentifier(1)) ||
            // a MATERIALIZED view lost to a restart recovers from its
            // store's refresh journal on first READ — not only on
            // refresh (dashboards read; they don't refresh). Cheap on
            // misses: one cached warehouse-directory probe.
            graft.sources.MatViews.getOrRecover(u.multipartIdentifier(1)).isDefined) =>
        val catalog = u.multipartIdentifier.head
        val name = u.multipartIdentifier(1)
        // re-read: a concurrent MV create/drop may have moved the view
        // between the guard and here — leave the relation unresolved
        // (a clean not-found downstream) rather than throw from a rule
        graft.sources.MemViews.views.get(name) match {
          case None => u
          case Some(v) =>
        val reparsed = spark.sessionState.sqlParser.parsePlan(v.sql)
        // Re-bind BARE table names to the CREATOR's context: create_view
        // analyzed the SQL under the creator's current catalog/namespace,
        // and left unqualified here they would re-resolve against the
        // READER's — a different table of the same name, or a confusing
        // not-found. Names bound by the view's own CTEs stay bare
        // (CTESubstitution owns them).
        val cteNames: Set[String] = reparsed.collectWithSubqueries {
          case w: org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith =>
            w.cteRelations.map(_._1)
        }.flatten.toSet
        val parsed = reparsed.transformWithSubqueries {
          case dep: UnresolvedRelation if dep.multipartIdentifier.length == 1 &&
              !cteNames.exists(_.equalsIgnoreCase(dep.multipartIdentifier.head)) =>
            dep.copy(multipartIdentifier =
              (v.currentCatalog +: v.currentNamespace.toSeq) :+
                dep.multipartIdentifier.head)
        }
        // LATE-BINDING DEPENDENCY CHECK (the pinned lifecycle semantics):
        // create_view analyzed the SQL at CALL time, but a dependency
        // dropped or renamed SINCE then would otherwise surface as a raw
        // TABLE_OR_VIEW_NOT_FOUND naming only the inner table — the
        // reader has no idea a view definition is the culprit. Walk the
        // expansion's graft-catalog references and fail with an error
        // that names the VIEW, the missing dependency, and the stored
        // SQL. Dependencies that still exist re-resolve fresh (the
        // late-binding contract: the view tracks the live table).
        // collectWithSubqueries, not foreach: a dependency inside a
        // subquery EXPRESSION (IN/EXISTS/scalar subquery) is invisible to
        // the operator walk, and it deserves the same view-naming error
        // length >= 2, not == 2: a bare name re-qualified under a creator
        // with a non-empty namespace is 3-part — it deserves the same
        // view-naming error as any other graft dependency
        val deps = parsed.collectWithSubqueries {
          case dep: UnresolvedRelation if dep.multipartIdentifier.length >= 2 &&
              isGraftCatalog(dep.multipartIdentifier.head) =>
            dep.multipartIdentifier
        }
        deps.distinct.foreach { parts =>
          val ns = parts.slice(1, parts.length - 1).toArray
          val d = parts.last
          val exists =
            (ns.isEmpty && graft.sources.MemViews.views.contains(d)) || {
              try spark.sessionState.catalogManager.catalog(parts.head)
                .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
                .tableExists(org.apache.spark.sql.connector.catalog.Identifier
                  .of(ns, d))
              catch { case _: Exception => false }
            }
          if (!exists)
            throw new IllegalStateException(
              s"view '$name' references '${parts.mkString(".")}', which no " +
                s"longer exists (dropped or renamed after the view was " +
                s"created). Stored SQL: ${v.sql} — recreate the view " +
                "against the current table name, or drop it")
        }
        // NESTED ANALYSIS, not a bare splice: the analyzer's Substitution
        // batch (CTESubstitution in particular) ran before this resolution
        // rule, so a `WITH` inside the stored SQL would never bind if the
        // parsed tree were left for the outer fixpoint alone. Running the
        // analyzer on the expansion (what Spark's own view resolution and
        // Iceberg's extensions do) gives the view text the full pipeline;
        // the depth guard turns a view cycle (possible via alterView) into
        // a clear error instead of a stack overflow.
        val analyzed = ResolveGraftViews.withViewDepth(name) {
          spark.sessionState.analyzer.execute(parsed)
        }
        SubqueryAlias(name, analyzed)
        }
    }
}

object ResolveGraftViews {
  private val MaxNestedViewDepth = 32
  private val depth = new ThreadLocal[Int] { override def initialValue(): Int = 0 }

  private def withViewDepth[A](name: String)(body: => A): A = {
    if (depth.get() >= MaxNestedViewDepth)
      throw new IllegalStateException(
        s"view nesting exceeds $MaxNestedViewDepth while expanding '$name' — " +
          "likely a view cycle; drop or redefine one of the views involved")
    depth.set(depth.get() + 1)
    try body
    finally depth.set(depth.get() - 1)
  }
}
