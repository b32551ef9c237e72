package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.sources.{MatViews, MemTable, MemTables}

/** AGGREGATE-TO-MATERIALIZED-VIEW query rewrite — the read half of
  * [[MatViews]], and the reason a warehouse keeps MVs at all: a query
  * that re-states a materialized aggregate is answered from the
  * pre-aggregated store (|groups| rows) instead of re-scanning the
  * source (|table| rows). At 100 TB the difference is the whole query.
  *
  * The rule fires ONLY when the answer is provably identical:
  *
  *  - the plan node is `Aggregate` over (optionally `Filter` over) a
  *    CURRENT-version scan of a graft table — never a time-travel pin,
  *    branch, or changes relation (those are different snapshots);
  *  - a registered MV has the same source, its filter and grouping set
  *    are SEMANTICALLY equal (attribute-by-name remap, then
  *    `semanticEquals` — alias/ordering/case noise doesn't matter), and
  *    it is FRESH: `watermark == source.version` with no pending refresh
  *    intent. A stale MV never serves reads silently — the rewrite just
  *    doesn't fire;
  *  - every output item derives from the stored components: group
  *    columns, `count(*)` / `count(x)` / `sum(x)` / `avg(x)` over
  *    maintained argument expressions (an MV maintaining `avg(v)` serves
  *    `sum(v)` and `count(v)` too — components, not outputs, are the
  *    unit of matching), and any scalar expression OVER those (e.g.
  *    `sum(v) / count(*)`). DISTINCT, FILTER clauses, and other
  *    aggregates leave the query on the source.
  *
  * GRAIN: the query's grouping set may be the MV's exactly (served by a
  * `Project` over the store, one row per group) or any PROPER SUBSET of
  * it, including empty — the ROLLUP path: the store is RE-AGGREGATED at
  * the coarser grain (`count` = sum of stored counts, `sum` = sum of
  * stored sums guarded by the summed count, `avg` = recomposed
  * sum-of-sums / sum-of-counts — never avg-of-avgs — and `min`/`max` =
  * min-of-mins / max-of-maxs), |MV groups| rows in instead of |table|.
  * The empty grouping set degenerates correctly: an `Aggregate` with no
  * grouping over an empty store emits the single global row SQL
  * requires. A query grouping FINER than the store grain is never
  * servable and leaves the query on the source.
  *
  * Replacements preserve the original output exactly — names, exprIds,
  * types, and nullability (`coalesce(cnt, 0)` for counts, a
  * zero-count guard for sums, `AssertNotNull` where the source column
  * was non-nullable) — so parents of the rewritten Aggregate never see
  * the substitution. Disable with `spark.graft.mv.rewrite=false`.
  *
  * One documented value deviation: `avg` over an INTEGRAL argument is
  * served as `exact_integer_sum / count`, while Spark's native Average
  * accumulates the sum in DOUBLE — for group sums beyond 2^53 the two
  * can differ in the last bits, and the MV-served answer is the MORE
  * precise one (the native result is already precision-compromised
  * there). Fractional arguments accumulate in double on both paths.
  */
case class RewriteAggToMatView(spark: SparkSession) extends Rule[LogicalPlan] {

  import RewriteAggToMatView._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString("spark.graft.mv.rewrite", "true") != "true") plan
    else {
      // after a restart the registry is empty even when recoverable MVs
      // sit on disk — fault them in (memoized on the warehouse root's
      // mtime: one directory scan per root change, one stat otherwise),
      // or the read-optimization half of every MV dies with the process
      if (MatViews.registry.isEmpty) MatViews.recoverAllFromDisk()
      if (MatViews.registry.isEmpty) plan
      else plan.transformUp {
        case agg: Aggregate =>
          rewrite(agg).getOrElse(agg)
      }
    }
  }

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    for {
      (rels, pooled, qSteps) <- sourceOf(agg.child)
      keys = rels.map(_._1).toSet
      result <- MatViews.registry.values.iterator
        .filter(mv =>
          (mv.srcKey +: mv.joins.map(_.key)).toSet == keys && isFresh(mv))
        .flatMap(mv => tryRewrite(agg, rels, pooled, qSteps, mv))
        .nextOption()
    } yield result
  }

  /** FRESH = servable: no pending refresh intent and EVERY source (the
    * primary plus all joined ones) sits at its recorded watermark under
    * its recorded IDENTITY — not just the version clock: a re-created
    * source restarts its counter, and a coincidental match must not
    * serve. Empty uuid = a pre-uuid journal whose identity the next
    * refresh adopts; treat as unknown-but-allowed, same as refresh does.
    */
  private def isFresh(mv: MatViews.MvState): Boolean = {
    def ok(key: String, uuid: String, wm: Long): Boolean =
      MemTables.get(key).exists(s =>
        wm == s.version && (uuid.isEmpty || uuid == s.tableUuid))
    mv.pending.isEmpty && ok(mv.srcKey, mv.srcTableUuid, mv.watermark) &&
      mv.joins.forall(j => ok(j.key, j.uuid, j.watermark))
  }

  private def stripProjects(n: LogicalPlan): LogicalPlan = n match {
    case Project(items, child) if items.forall(_.isInstanceOf[AttributeReference]) =>
      stripProjects(child)
    case SubqueryAlias(_, child) => stripProjects(child)
    case other => other
  }

  /** CANONICAL source of an aggregate's child: the CURRENT MemTable
    * relations (keyed by catalog key, each table at most once), the
    * POOLED top-region conjunct set — `Filter` conditions and inner-join
    * ON conditions that provably COMMUTE above every outer step — and
    * the ordered OUTER-STEP signature. Inner joins and filters over base
    * relations are one selection over their product, so the top region
    * is invariant to predicate pushdown and join reorder (both of which
    * have already mangled the plan by the time an optimizer rule sees
    * it). Column-pruning Projects are transparent (their references keep
    * the relations' exprIds). Anything else — a subquery, a non-graft
    * leaf, a semi/anti join — declines.
    *
    * Outer steps (LEFT/RIGHT/FULL, the shapes MV maintenance supports)
    * each record their ON conjuncts AND the conjuncts STUCK below them —
    * selections on a null-EXTENDED side do not commute with the join, so
    * they must compare region-by-region against the definition, never
    * pooled into the top (pooling would equate `σ(F) ⟗ D` with
    * `σ(F ⟗ D)`, which differ on extension rows). Hoisting rules per
    * step: a LEFT step hoists its left (preserved) side's conjuncts and
    * requires a bare dim on the right; a RIGHT step hoists dim-side
    * conjuncts (its right child is the preserved dim — a pushed-down
    * WHERE on dim columns commutes back up) and freezes the extended
    * prefix's pool as the step's stuck set; a FULL step freezes the
    * prefix's pool and requires a bare dim.
    */
  private def sourceOf(p: LogicalPlan)
      : Option[(Seq[(String, DataSourceV2Relation)], Seq[Expression], Seq[OuterStep])] = {
    import org.apache.spark.sql.catalyst.plans.{Cross, FullOuter, Inner, LeftOuter, RightOuter}
    import org.apache.spark.sql.catalyst.plans.logical.Join
    // a bare current mem-table relation — modulo the IsNotNull(join key)
    // filter the optimizer infers onto a join child whose unmatched rows
    // are dropped (null keys never match, so the inferred filter is
    // semantics-free given the ON conjuncts it derives from)
    def bareRel(n: LogicalPlan, onRefs: Set[ExprId]): Option[DataSourceV2Relation] =
      stripProjects(n) match {
        case Filter(c, inner2) if conjuncts(c).forall {
            case IsNotNull(a: AttributeReference) => onRefs.contains(a.exprId)
            case _ => false
          } => bareRel(inner2, onRefs)
        case r: DataSourceV2Relation if isCurrentMemTable(r) => Some(r)
        case _ => None
      }
    def relKey(r: DataSourceV2Relation): String =
      r.table.asInstanceOf[MemTable].catalogKey
    def go(n: LogicalPlan)
        : Option[(Seq[(String, DataSourceV2Relation)], Seq[Expression], Seq[OuterStep])] =
      stripProjects(n) match {
        case r: DataSourceV2Relation if isCurrentMemTable(r) =>
          Some((Seq(relKey(r) -> r), Nil, Nil))
        case Filter(cond, inner) =>
          go(inner).map { case (rels, cs, steps) =>
            (rels, cs ++ conjuncts(cond), steps)
          }
        case j: Join if j.joinType == Inner || j.joinType == Cross =>
          for ((lr, lc, ls) <- go(j.left); (rr, rc, rs) <- go(j.right)) yield
            (lr ++ rr, lc ++ rc ++ j.condition.toSeq.flatMap(conjuncts), ls ++ rs)
        case j: Join if j.joinType == LeftOuter =>
          val on = j.condition.toSeq.flatMap(conjuncts)
          val onRefs = on.flatMap(_.references.map(_.exprId)).toSet
          for {
            dim <- bareRel(j.right, onRefs)
            (lr, lc, ls) <- go(j.left)
          } yield (lr :+ (relKey(dim) -> dim), lc,
            ls :+ OuterStep("LEFT", relKey(dim), on, Nil))
        case j: Join if j.joinType == RightOuter =>
          // preserved side is the RIGHT child (the dim): a WHERE conjunct
          // on dim columns pushed below it commutes back to the top; the
          // LEFT child is the null-extended prefix — its entire pool
          // freezes as this step's stuck region
          val on = j.condition.toSeq.flatMap(conjuncts)
          def dimOf(node: LogicalPlan)
              : Option[(DataSourceV2Relation, Seq[Expression])] =
            stripProjects(node) match {
              case Filter(c, inner2) =>
                dimOf(inner2).map { case (r, cs) => (r, conjuncts(c) ++ cs) }
              case r: DataSourceV2Relation if isCurrentMemTable(r) => Some((r, Nil))
              case _ => None
            }
          for {
            (dim, dimConds) <- dimOf(j.right)
            (lr, lc, ls) <- go(j.left)
          } yield (lr :+ (relKey(dim) -> dim), dimConds,
            ls :+ OuterStep("RIGHT", relKey(dim), on, lc))
        case j: Join if j.joinType == FullOuter =>
          // neither side is preserved: the dim must be bare and the
          // prefix's pool freezes as the stuck region
          val on = j.condition.toSeq.flatMap(conjuncts)
          for {
            dim <- bareRel(j.right, Set.empty)
            (lr, lc, ls) <- go(j.left)
          } yield (lr :+ (relKey(dim) -> dim), Nil,
            ls :+ OuterStep("FULL", relKey(dim), on, lc))
        case _ => None
      }
    // self-joins (a key twice) are out of matching scope — names would
    // be ambiguous between the two instances
    go(p).filter { case (rels, _, _) => rels.map(_._1).distinct.size == rels.size }
  }

  private def isCurrentMemTable(r: DataSourceV2Relation): Boolean = r.table match {
    case t: MemTable => t.snapshotPin.isEmpty && !r.isStreaming
    case _ => false
  }

  private def tryRewrite(
      agg: Aggregate,
      rels: Seq[(String, DataSourceV2Relation)],
      pooledCond: Seq[Expression],
      qSteps: Seq[OuterStep],
      mv: MatViews.MvState): Option[LogicalPlan] = {
    val d = analyzedDef(spark, mv).getOrElse(return None)

    // user-relation attribute -> MV-definition attribute, PER TABLE by
    // column name (two joined tables may share a column name — each
    // relation's attrs map only against its own definition counterpart)
    val toDefAttr: Map[ExprId, Attribute] = rels.flatMap { case (key, rel) =>
      val defOut = d.relOutByName.getOrElse(key, Map.empty)
      rel.output.flatMap { a =>
        defOut.get(a.name.toLowerCase(java.util.Locale.ROOT)).map(a.exprId -> _)
      }
    }.toMap
    def toDef(e: Expression): Option[Expression] = {
      var ok = true
      val t = e.transformUp {
        case ar: AttributeReference =>
          toDefAttr.get(ar.exprId) match {
            case Some(defA) => defA
            case None => ok = false; ar
          }
      }
      if (ok) Some(t) else None
    }

    // trivially-TRUE conjuncts (a cross join spelled `ON TRUE`) are
    // dropped from BOTH pools before comparing: the optimizer erases
    // them from the query side while the analysis-only definition keeps
    // them, and an unmatched `true` must not block the serve
    def minusTrue(cs: Seq[Expression]): Seq[Expression] =
      cs.filterNot(c => c.foldable && c.deterministic &&
        (c.eval() == true || c.eval() == java.lang.Boolean.TRUE))

    // OUTER-shape alignment: the query's ordered outer-step signature
    // must equal the definition's — same step count, type, and dim
    // table; each step's ON semantically set-equal in BOTH directions
    // (outer-join ON is not poolable with WHERE, so the containment rule
    // used for selection conjuncts below is not sound here); and each
    // step's STUCK region (conjuncts frozen below a null-extended side)
    // set-equal both directions, after stripping the IsNotNull conjuncts
    // the optimizer infers from the step's ON and the region's own
    // null-intolerant siblings (the analysis-only definition never
    // carries them). An inner query never serves from an outer store (it
    // dropped the null-extension rows the store keeps), and vice versa.
    if (qSteps.size != d.outerSteps.size) return None
    qSteps.zip(d.outerSteps).foreach { case (qs, ds) =>
      if (qs.jt != ds.jt || qs.dimKey != ds.dimKey) return None
      val qOn = qs.on.map(c => toDef(c).getOrElse(return None))
      if (!ds.on.forall(f => qOn.exists(_.semanticEquals(f))) ||
          !qOn.forall(f => ds.on.exists(_.semanticEquals(f)))) return None
      // IsNotNull stripping context is per join type: a RIGHT step's
      // extended prefix DROPS unmatched rows, so the optimizer infers
      // IsNotNull(prefix join key) from the step's ON into the prefix —
      // semantics-free, strip against stuck ∪ ON. A FULL step drops
      // NOTHING on either side: the optimizer never infers such a
      // filter there, so an IsNotNull in a FULL stuck region is
      // user-written and LOAD-BEARING (it excludes rows the store keeps
      // as null-extensions) — strip only what the stuck region's own
      // null-intolerant siblings imply.
      def clean(stuck: Seq[Expression], on: Seq[Expression]): Seq[Expression] = {
        val ctx = if (qs.jt == "FULL") stuck else stuck ++ on
        minusRedundantNotNull(minusTrue(ctx))
          .filterNot(c => on.exists(_.semanticEquals(c)))
      }
      val qStuck = clean(qs.stuck.map(c => toDef(c).getOrElse(return None)), qOn)
      val dStuck = clean(ds.stuck, ds.on)
      if (!dStuck.forall(f => qStuck.exists(_.semanticEquals(f))) ||
          !qStuck.forall(f => dStuck.exists(_.semanticEquals(f)))) return None
    }

    // FILTER containment, on conjunct sets: every definition conjunct
    // (WHERE plus inner-join ON conditions, pooled — the same canonical
    // form the query side arrives in) must appear in the query (else the
    // MV kept rows the query drops), and every query conjunct must
    // either appear in the definition or reference ONLY grouping
    // expressions (then it filters whole groups and is re-applied on the
    // store below). Inferred-redundant `IsNotNull` conjuncts — the
    // optimizer adds them on the query side, analysis-only text keeps
    // them off the definition side — are removed from both before
    // comparing, as are trivially-TRUE conjuncts (minusTrue above).
    val userConj = minusRedundantNotNull(minusTrue(
      pooledCond.map(c => toDef(c).getOrElse(return None))))
    val defConj = minusRedundantNotNull(minusTrue(d.conjuncts))
    if (!defConj.forall(f => userConj.exists(_.semanticEquals(f)))) return None
    val extraConj: Seq[Expression] =
      userConj.filterNot(c => defConj.exists(_.semanticEquals(c)))

    // grouping-set mapping: each user group must match a DISTINCT def
    // group (injective). A full bijection serves 1:1 from the store; a
    // proper subset (empty included) serves by RE-AGGREGATING the store
    // at the coarser grain (the rollup path below). A query grouping
    // FINER than the store grain can never be recovered from it.
    val userGroups = agg.groupingExpressions
    if (userGroups.size > d.groups.size) return None
    val used = scala.collection.mutable.BitSet.empty
    userGroups.foreach { g =>
      val gd = toDef(g).getOrElse(return None)
      val i = d.groups.indexWhere { case (expr, _) => gd.semanticEquals(expr) }
      if (i < 0 || used(i)) return None
      used += i
    }
    val isRollup = used.size < d.groups.size

    // the replacement scans the STORE through the same catalog
    val storeRel = storeRelation(rels.head._2, mv).getOrElse(return None)
    val storeAttr: Map[String, AttributeReference] = storeRel.output.map {
      case a: AttributeReference => a.name -> a
    }.toMap
    def storeCol(n: String): Option[AttributeReference] = storeAttr.get(n)

    def defGroupStoreAttr(ed: Expression): Option[AttributeReference] =
      d.groups.collectFirst {
        case (expr, out) if ed.semanticEquals(expr) => out
      }.flatMap(storeCol)

    // rewrite a definition-side expression so it references only store
    // columns: grouping subtrees map to their store column, literals and
    // scalar glue stay, anything else (a non-grouping source column) bails
    def overGroups(ed: Expression): Option[Expression] =
      defGroupStoreAttr(ed).map(a => a: Expression).orElse(ed match {
        case _: AttributeReference => None
        case l: Literal => Some(l)
        case other =>
          val kids = other.children.map(overGroups)
          if (kids.exists(_.isEmpty)) None else Some(other.withNewChildren(kids.map(_.get)))
      })

    // the group-only extra conjuncts become a post-filter on the store:
    // a predicate over grouping expressions selects whole groups, so it
    // commutes with the aggregation
    val extraFilters: Seq[Expression] = extraConj.map { c =>
      if (!c.deterministic) return None
      overGroups(c).getOrElse(return None)
    }

    def groupReplacement(e: Expression): Option[Expression] = {
      val ed = toDef(e).getOrElse(return None)
      defGroupStoreAttr(ed).map { a =>
        if (!e.nullable && a.nullable) AssertNotNull(a) else a
      }
    }

    def aggReplacement(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.isDefined) return None
      def findComp(arg: Expression): Option[Comp] = for {
        argD <- toDef(arg)
        c <- d.comps.find(_.arg.semanticEquals(argD))
      } yield c
      // EXACT grain reads components straight off the store row; ROLLUP
      // re-aggregates them across the store's finer groups. Counts fold
      // by addition, sums by addition guarded on the summed count (the
      // stored component is 0 — never NULL — when its group had no
      // non-null input, so a plain Sum is exact and the guard alone
      // restores SQL's NULL-on-empty), avg recomposes from the folded
      // components, min/max fold by min/max (Min/Max ignore the NULL a
      // zero-input group stored, exactly right).
      def foldedCnt(ca: Expression): Expression =
        Coalesce(Seq(Sum(ca).toAggregateExpression(), Literal(0L)))
      val replacement = ae.aggregateFunction match {
        case c: Count => c.children match {
          case Seq(l: Literal) if l.value != null =>
            storeCol(MatViews.RowCountCol).map(n =>
              if (isRollup) foldedCnt(n) else Coalesce(Seq(n, Literal(0L))))
          case Seq(arg) => findComp(arg).flatMap(_.cntCol)
            .flatMap(storeCol).map(c0 =>
              if (isRollup) foldedCnt(c0) else Coalesce(Seq(c0, Literal(0L))))
          case _ => None
        }
        case s: Sum => findComp(s.child).flatMap(c => (c.sumCol, c.cntCol) match {
          case (Some(sum), Some(cnt)) =>
            for (sa <- storeCol(sum); ca <- storeCol(cnt)) yield
              if (isRollup)
                If(EqualTo(foldedCnt(ca), Literal(0L)),
                  Literal(null, sa.dataType),
                  Sum(sa).toAggregateExpression())
              else If(EqualTo(ca, Literal(0L)), Literal(null, sa.dataType), sa)
          case _ => None
        })
        case a: Average => findComp(a.child).flatMap(c => (c.sumCol, c.cntCol) match {
          case (Some(sum), Some(cnt)) =>
            for (sa <- storeCol(sum); ca <- storeCol(cnt)) yield
              if (isRollup)
                If(EqualTo(foldedCnt(ca), Literal(0L)), Literal(null, DoubleType),
                  Divide(Cast(Sum(sa).toAggregateExpression(), DoubleType),
                    Cast(Sum(ca).toAggregateExpression(), DoubleType)))
              else If(EqualTo(ca, Literal(0L)), Literal(null, DoubleType),
                Divide(Cast(sa, DoubleType), Cast(ca, DoubleType)))
          case _ => None
        })
        case m: Min =>
          findComp(m.child).flatMap(_.minCol).flatMap(storeCol).map(a =>
            if (isRollup) Min(a).toAggregateExpression() else a: Expression)
        case m: Max =>
          findComp(m.child).flatMap(_.maxCol).flatMap(storeCol).map(a =>
            if (isRollup) Max(a).toAggregateExpression() else a: Expression)
        case _ => None
      }
      // type-identity safety net: never swap in a differently-typed value
      replacement.filter(_.dataType == ae.dataType)
    }

    // rewrite each output item top-down: grouping subtrees first (so
    // `year(d)` maps as a unit), aggregates atomically, scalar glue kept
    def rewriteExpr(e: Expression): Option[Expression] =
      groupReplacement(e).orElse(e match {
        case ae: AggregateExpression => aggReplacement(ae)
        case _: AttributeReference => None // non-grouping source column
        case _: Literal => Some(e)
        case other =>
          val kids = other.children.map(rewriteExpr)
          if (kids.exists(_.isEmpty)) None
          else Some(other.withNewChildren(kids.map(_.get)))
      })

    val outputs: Seq[NamedExpression] = agg.aggregateExpressions.map { ne =>
      val rewritten = ne match {
        case al: Alias => rewriteExpr(al.child)
        case ar: AttributeReference => rewriteExpr(ar)
        case _ => None
      }
      rewritten match {
        case Some(r) => ne match {
          case al: Alias =>
            Alias(r, al.name)(exprId = al.exprId, qualifier = al.qualifier,
              explicitMetadata = al.explicitMetadata)
          case ar: AttributeReference =>
            Alias(r, ar.name)(exprId = ar.exprId, qualifier = ar.qualifier)
          case _ => return None
        }
        case None => return None
      }
    }
    // group-only extra conjuncts sit BELOW any rollup re-aggregation:
    // they reference the STORE grain's group columns (possibly ones the
    // user's coarser grain dropped), selecting whole finer groups —
    // which is exactly filtering the source rows before aggregating
    val child: LogicalPlan =
      if (extraFilters.isEmpty) storeRel
      else Filter(extraFilters.reduce(And), storeRel)
    if (!isRollup) Some(Project(outputs, child))
    else {
      // the coarser grain's grouping keys: the store columns the user's
      // grouping expressions mapped to (plain attributes — the outputs
      // reference them, AssertNotNull-wrapped where needed)
      val groupingAttrs: Seq[Expression] = userGroups.map { g =>
        toDef(g).flatMap(defGroupStoreAttr).getOrElse(return None): Expression
      }
      Some(Aggregate(groupingAttrs, outputs, child))
    }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** Drop `IsNotNull(a)` conjuncts that are IMPLIED by a sibling
    * null-intolerant conjunct referencing `a` — the optimizer infers
    * them on the query side (`InferFiltersFromConstraints`) while the
    * analysis-only definition text never carries them. Only a
    * whitelisted null-intolerant shape justifies the drop (`a <=> x` or
    * an OR would NOT imply non-null), so a genuinely load-bearing
    * IS NOT NULL always survives to the set comparison.
    */
  private def minusRedundantNotNull(cs: Seq[Expression]): Seq[Expression] =
    cs.filterNot {
      case IsNotNull(a: Attribute) => cs.exists {
        case _: IsNotNull => false
        case c => c.references.contains(a) && nullIntolerant(c)
      }
      case _ => false
    }

  private def nullIntolerant(e: Expression): Boolean = e match {
    case _: EqualNullSafe => false // true even on NULL input
    case _: AttributeReference | _: Literal => true
    case _: BinaryComparison | _: BinaryArithmetic | _: Not | _: Cast |
        _: UnaryMinus | _: In =>
      e.children.forall(nullIntolerant)
    case _ => false
  }

  private def storeRelation(
      rel: DataSourceV2Relation, mv: MatViews.MvState): Option[DataSourceV2Relation] =
    rel.catalog.collect { case tc: TableCatalog =>
      val ident = Identifier.of(Array.empty, mv.storeKey)
      try Some(DataSourceV2Relation.create(tc.loadTable(ident), rel.catalog, Some(ident)))
      catch { case _: Exception => None }
    }.flatten
}

object RewriteAggToMatView {

  /** One maintained COMPONENT: an argument expression (analyzed against
    * the definition's relation) with its stored sum/count/min/max column
    * names.
    */
  private final case class Comp(
      arg: Expression, sumCol: Option[String], cntCol: Option[String],
      minCol: Option[String] = None, maxCol: Option[String] = None)

  /** One OUTER step in the canonical join signature: its type
    * (LEFT/RIGHT/FULL), the dim table it adds, its ON conjuncts (kept
    * OUT of the poolable selection — outer-join ON is not
    * interchangeable with WHERE), and the conjuncts STUCK below its
    * null-extended side (selections there do not commute with the join,
    * so they compare region-by-region, never pooled to the top).
    */
  private final case class OuterStep(
      jt: String, dimKey: String,
      on: Seq[Expression], stuck: Seq[Expression])

  private final case class AnalyzedDef(
      // table key -> (lowercased column name -> analyzed attribute):
      // attribute remap is PER TABLE, so joined tables sharing a column
      // name never cross-bind
      relOutByName: Map[String, Map[String, Attribute]],
      // pooled WHERE + inner-join ON conjuncts that commute above every
      // outer step, constant-folded — the same canonical
      // selection-over-product form the query side takes
      conjuncts: Seq[Expression],
      groups: Seq[(Expression, String)], // (analyzed expr, store column)
      comps: Seq[Comp],
      // the ordered outer-step signature — empty for pure inner/cross
      // definitions
      outerSteps: Seq[OuterStep] = Nil)

  // keyed by MV name; an entry is valid only for (definition SQL, source
  // table identity) — a drop/re-create of either the MV or its source
  // must not reuse attributes analyzed against the old schema. Drops
  // also evict explicitly ([[invalidate]]) so dead names don't linger.
  private val defCache = TrieMap.empty[String, (String, String, Option[AnalyzedDef])]

  /** Evict a cached definition analysis (called by MV drop/forget). */
  private[graft] def invalidate(name: String): Unit = {
    defCache.remove(name)
    ()
  }

  private def analyzedDef(spark: SparkSession, mv: MatViews.MvState): Option[AnalyzedDef] =
    defCache.get(mv.name) match {
      case Some((sql, uuid, d)) if sql == mv.definitionSql && uuid == mv.srcTableUuid => d
      case _ =>
        val d = try analyzeDef(spark, mv) catch { case _: Exception => None }
        defCache.put(mv.name, (mv.definitionSql, mv.srcTableUuid, d))
        d
    }

  /** Fold constant subtrees (the query side arrives optimizer-folded —
    * `cast(5 as bigint)` is `5L` there — while the definition is only
    * analyzed, so both sides must meet at the folded form).
    */
  private def fold(e: Expression): Expression = e.transformUp {
    case f if f.foldable && !f.isInstanceOf[Literal] => Literal.create(f.eval(), f.dataType)
  }

  private def analyzeDef(spark: SparkSession, mv: MatViews.MvState): Option[AnalyzedDef] = {
    val parsed = spark.sessionState.sqlParser.parsePlan(mv.definitionSql)
    val analyzed = spark.sessionState.analyzer.execute(parsed)
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case SubqueryAlias(_, c) => strip(c)
      case other => other
    }
    strip(analyzed) match {
      case agg: Aggregate =>
        // canonicalize the analyzed FROM exactly like the rule's query
        // side: relations + pooled WHERE/inner-ON conjuncts that commute
        // above every outer step, inner join shape erased; outer steps
        // (LEFT/RIGHT/FULL, anywhere in the left-deep chain — the shapes
        // create() validates) record their ON separately, and a
        // RIGHT/FULL step freezes the extended prefix's pool as its
        // stuck region. The definition is analyzed-only: no inferred
        // filters, every dim side is the bare relation.
        import org.apache.spark.sql.catalyst.plans.{Cross, FullOuter, Inner, LeftOuter, RightOuter}
        import org.apache.spark.sql.catalyst.plans.logical.Join
        def splitConj(e: Expression): Seq[Expression] = e match {
          case And(l, r) => splitConj(l) ++ splitConj(r)
          case other => Seq(other)
        }
        def stripP(n: LogicalPlan): LogicalPlan = n match {
          case SubqueryAlias(_, c) => stripP(c)
          case Project(items, c) if items.forall(_.isInstanceOf[AttributeReference]) =>
            stripP(c)
          case other => other
        }
        def bareDim(n: LogicalPlan): Option[(String, DataSourceV2Relation)] =
          stripP(n) match {
            case r: DataSourceV2Relation => r.table match {
              case t: MemTable if t.snapshotPin.isEmpty => Some(t.catalogKey -> r)
              case _ => None
            }
            case _ => None
          }
        def walk(n: LogicalPlan)
            : Option[(Seq[(String, DataSourceV2Relation)], Seq[Expression], Seq[OuterStep])] =
          stripP(n) match {
            case r: DataSourceV2Relation => r.table match {
              case t: MemTable if t.snapshotPin.isEmpty =>
                Some((Seq(t.catalogKey -> r), Nil, Nil))
              case _ => None
            }
            case Filter(c, inner) =>
              walk(inner).map { case (rs, cs, ss) => (rs, cs ++ splitConj(c), ss) }
            case j: Join if j.joinType == Inner || j.joinType == Cross =>
              for ((lr, lc, ls) <- walk(j.left); (rr, rc, rs) <- walk(j.right)) yield
                (lr ++ rr, lc ++ rc ++ j.condition.toSeq.flatMap(splitConj), ls ++ rs)
            case j: Join if j.joinType == LeftOuter =>
              val on = j.condition.toSeq.flatMap(splitConj)
              for ((lr, lc, ls) <- walk(j.left); dim <- bareDim(j.right)) yield
                (lr :+ dim, lc, ls :+ OuterStep("LEFT", dim._1, on, Nil))
            case j: Join if j.joinType == RightOuter =>
              val on = j.condition.toSeq.flatMap(splitConj)
              for ((lr, lc, ls) <- walk(j.left); dim <- bareDim(j.right)) yield
                (lr :+ dim, Nil, ls :+ OuterStep("RIGHT", dim._1, on, lc))
            case j: Join if j.joinType == FullOuter =>
              val on = j.condition.toSeq.flatMap(splitConj)
              for ((lr, lc, ls) <- walk(j.left); dim <- bareDim(j.right)) yield
                (lr :+ dim, Nil, ls :+ OuterStep("FULL", dim._1, on, lc))
            case _ => None
          }
        val (rels, rawConj, rawSteps) = walk(agg.child).getOrElse(return None)
        val expected = (mv.srcKey +: mv.joins.map(_.key)).toSet
        if (rels.map(_._1).toSet != expected ||
            rels.map(_._1).distinct.size != rels.size) return None
        val relOut: Map[String, Map[String, Attribute]] = rels.map { case (k, r) =>
          k -> r.output.map(a => a.name.toLowerCase(java.util.Locale.ROOT) -> a).toMap
        }.toMap
        // group expressions pair with store columns BY OUTPUT NAME from
        // the SELECT list — never positionally against groupingExpressions,
        // whose order is the GROUP BY clause's and may differ from the
        // SELECT order create() recorded (a positional zip would swap
        // store columns between groups)
        val groupExprByOut: Map[String, Expression] =
          agg.aggregateExpressions.collect {
            case al @ Alias(child, _)
                if !child.exists(_.isInstanceOf[AggregateExpression]) =>
              al.name -> fold(child)
            case ar: AttributeReference => ar.name -> (ar: Expression)
          }.toMap
        val groups: Seq[(Expression, String)] =
          mv.groups.flatMap(g => groupExprByOut.get(g.out).map(e => (e, g.out)))
        if (groups.size != mv.groups.size) return None
        // per-output-name aggregate arguments, from the analyzed tree
        val argByOut: Map[String, Expression] = agg.aggregateExpressions.collect {
          case al @ Alias(ae: AggregateExpression, _) =>
            ae.aggregateFunction match {
              case c: Count if c.children.sizeIs == 1 => Some(al.name -> fold(c.children.head))
              case s: Sum => Some(al.name -> fold(s.child))
              case a: Average => Some(al.name -> fold(a.child))
              case m: Min => Some(al.name -> fold(m.child))
              case m: Max => Some(al.name -> fold(m.child))
              case _ => None
            }
        }.flatten.toMap
        var comps = Vector.empty[Comp]
        def addComp(arg: Expression, sum: Option[String] = None,
            cnt: Option[String] = None, min: Option[String] = None,
            max: Option[String] = None): Unit =
          comps.indexWhere(_.arg.semanticEquals(arg)) match {
            case -1 => comps :+= Comp(arg, sum, cnt, min, max)
            case i => comps = comps.updated(i, Comp(arg,
              comps(i).sumCol.orElse(sum), comps(i).cntCol.orElse(cnt),
              comps(i).minCol.orElse(min), comps(i).maxCol.orElse(max)))
          }
        mv.aggs.foreach {
          case MatViews.AggSpec("countstar", _, _) =>
          case MatViews.AggSpec("cntd", _, _) =>
            // count(DISTINCT x): the stored component is an NDV sketch —
            // never served by the rewrite (sketch serving is documented
            // approximate, and aggReplacement rejects distinct aggregates
            // anyway); the MV's OTHER components stay servable
          case MatViews.AggSpec("count", _, out) =>
            argByOut.get(out).foreach(addComp(_, cnt = Some(s"__mv_cnt_$out")))
          case MatViews.AggSpec("min", _, out) =>
            argByOut.get(out).foreach(addComp(_, min = Some(s"__mv_min_$out")))
          case MatViews.AggSpec("max", _, out) =>
            argByOut.get(out).foreach(addComp(_, max = Some(s"__mv_max_$out")))
          case MatViews.AggSpec(_, _, out) => // sum | avg
            argByOut.get(out).foreach(
              addComp(_, sum = Some(s"__mv_sum_$out"), cnt = Some(s"__mv_cnt_$out")))
        }
        Some(AnalyzedDef(relOut, rawConj.map(fold), groups, comps,
          rawSteps.map(s =>
            s.copy(on = s.on.map(fold), stuck = s.stuck.map(fold)))))
      case _ => None
    }
  }
}
