package graft.mv

import graft.sources.TableReader
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

import scala.util.control.NonFatal

/** Catalyst optimizer rule substituting a FRESH materialized view for a
  * matching aggregate — the query side of [[MaterializedView]]: a
  * grouped sum/count over a 100 TB catalog table becomes a scan of the
  * (tiny) view table, with zero user query changes.
  *
  * Registration: list view dirs in the session conf
  * [[MaterializedView.ViewsConf]] (comma-separated); the rule is
  * injected by [[graft.functions.GraftExtensions]].
  *
  * A rewrite fires only when ALL of:
  *  - the aggregate sits DIRECTLY on a graft catalog-table scan (no
  *    filter/projection in between — exact-match substitution, the
  *    conservative line);
  *  - the grouping columns are exactly the view's group columns, and
  *    every output is a group column, `sum(intCol)`, `count(col)` or
  *    `count(*)` the view maintains (non-distinct, unfiltered);
  *  - the view is FRESH: its refreshed-version marker equals the
  *    source's current version (two metadata reads per candidate — a
  *    stale view silently falls back to the real aggregate, never to
  *    stale answers).
  *
  * The substituted plan preserves the aggregate's output attribute ids
  * (required of any optimizer rewrite); aggregate outputs become
  * nullable-typed reads of the view columns, which is the safe
  * direction. */
class MaterializedViewRewrite(session: SparkSession) extends Rule[LogicalPlan] {

  private def registeredViews: Seq[String] =
    session.conf.getOption(MaterializedView.ViewsConf)
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Nil)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val sessionViews = registeredViews
    // metadata loads are memoized for the LIFE OF ONE apply: a query
    // with several aggregates over the same table probes its registry
    // once, not once per Aggregate node (each load can be a network
    // RPC on a REST/object-store catalog)
    val snapMemo = scala.collection.mutable.Map[
      (graft.txn.TableCatalog, String), Option[graft.txn.TableSnapshot]]()
    def loadMemo(catalog: graft.txn.TableCatalog, dir: String) =
      snapMemo.getOrElseUpdate((catalog, dir), {
        MaterializedViewRewrite.metadataOps.incrementAndGet()
        catalog.load(dir)
      })
    // the aggregate's child may carry a column-pruning Project (pure
    // attribute selection — semantics-neutral for the match)
    // a pinned table (VERSION/TIMESTAMP AS OF, branch/wap refs), a
    // per-read asOfVersion option, or a CDC/tail read mode
    // (changelog/skipDeletes/startingVersion) is NOT a current-state
    // live-row scan — the view must never answer for those
    def usable(rel: DataSourceV2Relation): Option[graft.streaming.GraftTable] =
      rel.table match {
        case t: graft.streaming.GraftTable
            if t.pinned.isEmpty &&
              rel.options.get("asOfVersion") == null &&
              rel.options.get("changelog") == null &&
              rel.options.get("skipDeletes") == null &&
              rel.options.get("startingVersion") == null =>
          Some(t)
        case _ => None
      }
    // A deterministic, subquery-free Filter between aggregate and scan
    // is COMPENSATABLE when it references only the view's group columns
    // (checked later against the candidate spec): filtering the view's
    // rows removes exactly the same whole groups the source filter
    // removes. The returned condition is None for a bare scan.
    def plainFilter(cond: Expression): Boolean =
      cond.deterministic &&
        cond.find(_.isInstanceOf[PlanExpression[_]]).isEmpty
    def attrsOnly(projList: Seq[NamedExpression]): Boolean =
      projList.forall(_.isInstanceOf[AttributeReference])
    def scanOf(child: LogicalPlan)
        : Option[(graft.streaming.GraftTable, Option[Expression])] =
      child match {
        case rel: DataSourceV2Relation => usable(rel).map(_ -> None)
        case Project(p, rel: DataSourceV2Relation) if attrsOnly(p) =>
          usable(rel).map(_ -> None)
        case Filter(cond, rel: DataSourceV2Relation) if plainFilter(cond) =>
          usable(rel).map(_ -> Some(cond))
        case Project(p, Filter(cond, rel: DataSourceV2Relation))
            if attrsOnly(p) && plainFilter(cond) =>
          usable(rel).map(_ -> Some(cond))
        case Filter(cond, Project(p, rel: DataSourceV2Relation))
            if attrsOnly(p) && plainFilter(cond) =>
          usable(rel).map(_ -> Some(cond))
        case _ => None
      }
    plan.transformUp {
      // the ProbedTag marks an Aggregate already evaluated (and MISSED)
      // in this plan: the optimizer's fixed-point batch re-runs the
      // rule until the plan is stable, and without the tag every
      // iteration would re-pay the metadata loads. A miss is sticky by
      // construction (falling back to the real aggregate is always
      // correct); a hit removes the node entirely; a SHAPE change by
      // another rule recreates the node without tags and re-probes.
      case agg @ Aggregate(ges, aes, child, _)
          if scanOf(child).isDefined &&
            agg.getTagValue(MaterializedViewRewrite.ProbedTag).isEmpty =>
        val (tbl, srcFilter) = scanOf(child).get
        (try {
          // fast path: with no session views AND a recent negative
          // probe of this table's registry, skip the metadata load
          // entirely — falling back to the real aggregate is always
          // correct, so the short staleness window only delays when a
          // BRAND-NEW view starts substituting
          if (sessionViews.isEmpty &&
              MaterializedViewRewrite.knownRegistryless(tbl.dir)) None
          else loadMemo(tbl.tableCatalog, tbl.dir).flatMap { srcSnap =>
            // candidate views: the session conf PLUS the source
            // table's own registry property (stamped by
            // create_materialized_view — zero session setup)
            val registered = srcSnap.properties
              .get(MaterializedView.RegisteredProp)
              .toSeq.flatMap(MaterializedView.parseList)
            MaterializedViewRewrite.recordRegistryProbe(
              tbl.dir, registered.nonEmpty)
            val views = (sessionViews ++ registered).distinct
            views.iterator
              .flatMap(mv =>
                tryRewrite(mv, tbl.dir, tbl.tableCatalog, srcSnap, ges, aes,
                  srcFilter, loadMemo))
              .nextOption()
          }
        } catch { case NonFatal(_) => None }) match {
          case Some(rewritten) => rewritten
          case None =>
            agg.setTagValue(MaterializedViewRewrite.ProbedTag, true)
            agg
        }
    }
  }

  /** Integral types whose Spark `sum` equals the view's long-cast sum. */
  private def integral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  private def tryRewrite(
      mvDir: String,
      srcDir: String,
      catalog: graft.txn.TableCatalog,
      srcSnap: graft.txn.TableSnapshot,
      ges: Seq[Expression],
      aes: Seq[NamedExpression],
      srcFilter: Option[Expression],
      loadMemo: (graft.txn.TableCatalog, String) => Option[graft.txn.TableSnapshot]
  ): Option[LogicalPlan] =
    try {
      // the SOURCE table's catalog also resolves the view: the MV
      // procedures create views through the session catalog's format
      val mv = loadMemo(catalog, mvDir).getOrElse(return None)
      if (!mv.properties.get(MaterializedView.SourceProp).contains(srcDir))
        return None
      val spec = MaterializedView.decodeSpec(
        mv.properties(MaterializedView.SpecProp))

      // grouping: exactly the view's group columns (direct
      // substitution), or a STRICT SUBSET of them (rollup
      // compensation — the view's per-group sums/counts re-aggregate)
      val groupNames = ges.map {
        case a: AttributeReference => a.name
        case _ => return None
      }
      if (groupNames.distinct.size != groupNames.size) return None
      val isExact = groupNames.toSet == spec.group.toSet &&
        groupNames.size == spec.group.size
      val isRollup = !isExact && groupNames.toSet.subsetOf(spec.group.toSet)
      if (!isExact && !isRollup) return None

      // filter compensation: a WHERE on view GROUP columns removes
      // whole groups, so applying it to the stored state is exact;
      // anything referencing a non-group column kills the match
      srcFilter.foreach { cond =>
        val refs = cond.references.toSeq.map(_.name)
        if (!refs.forall(spec.group.contains)) return None
      }

      // every output resolves to a view column
      val byFnCol: Map[(String, String), String] =
        spec.aggs.map(a => (a.fn, a.col) -> a.alias).toMap
      // how each query output maps onto stored view columns
      sealed trait OutKind
      case class PassThrough(viewCol: String) extends OutKind // group col or stored count
      case class StoredSum(alias: String) extends OutKind     // null via nn count
      // rollup-only: count(finerGroupCol) = rows whose group value is
      // non-null, re-aggregated from the stored count(*) per group
      case class CountOfGroupCol(groupCol: String, countStar: String) extends OutKind
      val mapped: Seq[(NamedExpression, OutKind)] = aes.map { ne =>
        val kind: OutKind = ne match {
          case a: AttributeReference if groupNames.contains(a.name) =>
            PassThrough(a.name)
          case Alias(a: AttributeReference, _) if groupNames.contains(a.name) =>
            PassThrough(a.name)
          case Alias(ae: AggregateExpression, _)
              if !ae.isDistinct && ae.filter.isEmpty =>
            ae.aggregateFunction match {
              case s: Sum =>
                s.child match {
                  case a: AttributeReference if integral(a) =>
                    StoredSum(byFnCol.getOrElse(("sum", a.name), return None))
                  case _ => return None
                }
              case c: Count =>
                c.children match {
                  // count(*) lowers to count(1); count(NULL) is NOT it
                  // (always 0) and must never map to the row count
                  case Seq(Literal(v, _)) if v != null =>
                    PassThrough(byFnCol.getOrElse(("count", "*"), return None))
                  case Seq(a: AttributeReference) =>
                    byFnCol.get(("count", a.name)) match {
                      case Some(alias) => PassThrough(alias)
                      case None
                          if isRollup && spec.group.contains(a.name) &&
                            !groupNames.contains(a.name) =>
                        // count over a FINER group column: each view row
                        // holds count(*) rows sharing that value, so the
                        // rollup sums the stored counts of non-null rows
                        CountOfGroupCol(a.name,
                          byFnCol.getOrElse(("count", "*"), return None))
                      case None => return None
                    }
                  case _ => return None
                }
              case _ => return None
            }
          case _ => return None
        }
        (ne, kind)
      }

      // freshness: the stored state must reflect the source's CURRENT
      // version — a stale view falls back to the real aggregate
      val refreshed = mv.properties
        .get(MaterializedView.RefreshedVersionProp)
        .flatMap(_.toLongOption).getOrElse(return None)
      if (srcSnap.version != refreshed)
        return None

      // the OPTIMIZED subtree: this rule runs mid-optimization, so an
      // analyzed subtree's analysis-only nodes (SubqueryAlias etc.)
      // would reach physical planning unstripped. Built ONCE per view
      // version (the build itself re-reads metadata and re-optimizes),
      // cached across queries, and re-instantiated with FRESH attribute
      // ids on every use — the same query may substitute the view twice
      // (self-join of two aggregates) and duplicate expr ids across
      // branches would corrupt the join.
      val mvPlan = MaterializedViewRewrite
        .substitutedPlan(session, mvDir, catalog, mv)
        .getOrElse(return None)
      val mvAttr0 = mvPlan.output.map(a => a.name -> a).toMap
      // compensated filter: the source condition re-anchored on the
      // view's own attributes (names match; group columns are stored
      // verbatim)
      val mvBase: LogicalPlan = srcFilter match {
        case None => mvPlan
        case Some(cond) =>
          val mapped = cond.transformUp {
            case a: AttributeReference =>
              mvAttr0.getOrElse(a.name, return None)
          }
          Filter(mapped, mvPlan)
      }
      val mvAttr = mvAttr0
      if (isExact) {
        val projections: Seq[NamedExpression] = mapped.map {
          case (ne, kind) =>
            val target = ne.toAttribute
            // SQL null semantics for substituted sums: the stored total
            // is 0-based; the paired non-null count decides NULL
            val value: Expression = kind match {
              case PassThrough(c) => mvAttr.getOrElse(c, return None)
              case StoredSum(c) =>
                val src = mvAttr.getOrElse(c, return None)
                val nn = mvAttr.getOrElse(
                  MaterializedView.nnCol(c), return None)
                If(GreaterThan(nn, Literal(0L)), src,
                  Literal.create(null, LongType))
              case _: CountOfGroupCol => return None // rollup-only shape
            }
            Alias(value, target.name)(exprId = target.exprId)
        }
        logInfo(s"rewriting aggregate over $srcDir to materialized view $mvDir")
        Some(Project(projections, mvBase))
      } else {
        // ROLLUP COMPENSATION: GROUP BY a strict subset of the view's
        // group columns re-aggregates the (tiny) view — sums sum,
        // counts sum, and NULL sums are decided by the summed non-null
        // counts. Counts coalesce to 0 so even a GROUP BY () over an
        // all-deleted view matches SQL (count 0, sum NULL).
        def reAgg(a: Attribute): Expression =
          Sum(a).toAggregateExpression()
        def reAgg2(e: Expression): Expression =
          Sum(e).toAggregateExpression()
        val projections: Seq[NamedExpression] = mapped.map {
          case (ne, kind) =>
            val target = ne.toAttribute
            val value: Expression = kind match {
              case PassThrough(c) if groupNames.contains(c) =>
                mvAttr.getOrElse(c, return None)
              case PassThrough(c) => // stored count column: counts sum
                Coalesce(Seq(reAgg(mvAttr.getOrElse(c, return None)),
                  Literal(0L)))
              case StoredSum(c) =>
                val stored = mvAttr.getOrElse(c, return None)
                val nn = mvAttr.getOrElse(
                  MaterializedView.nnCol(c), return None)
                If(GreaterThan(
                    Coalesce(Seq(reAgg(nn), Literal(0L))), Literal(0L)),
                  reAgg(stored), Literal.create(null, LongType))
              case CountOfGroupCol(g, countStar) =>
                // per view row: count(*) rows share the group value, so
                // non-null values contribute their whole row count
                val gAttr = mvAttr.getOrElse(g, return None)
                val n = mvAttr.getOrElse(countStar, return None)
                Coalesce(Seq(reAgg2(
                  If(IsNotNull(gAttr), n, Literal(0L))), Literal(0L)))
            }
            Alias(value, target.name)(exprId = target.exprId)
        }
        val groupingExprs: Seq[Expression] =
          groupNames.map(n => mvAttr.getOrElse(n, return None))
        val rolled = Aggregate(groupingExprs, projections, mvBase)
        // the new Aggregate sits over the VIEW's scan: pre-tag it so
        // later fixed-point iterations don't probe the view table's
        // (nonexistent) registry
        rolled.setTagValue(MaterializedViewRewrite.ProbedTag, true)
        logInfo(s"rolling up materialized view $mvDir for a subset " +
          s"grouping over $srcDir")
        Some(rolled)
      }
    } catch { case NonFatal(_) => None }
}


object MaterializedViewRewrite {
  /** Marks an Aggregate node already probed (and missed) for MV
    * substitution in this plan — later fixed-point iterations skip it
    * without metadata IO. */
  private[mv] val ProbedTag =
    org.apache.spark.sql.catalyst.trees.TreeNodeTag[Boolean]("graft.mv.probed")

  /** Rule-initiated metadata operations (snapshot loads + view plan
    * builds) — observable so a spec can pin the per-query IO bound. */
  private[graft] val metadataOps = new java.util.concurrent.atomic.AtomicLong

  /** Substituted view plans keyed by (catalog, dir), valid while the
    * view's (version, committedAtMs) pair is unchanged — committedAtMs
    * disambiguates a drop/recreate that lands on the same version
    * number. Only LEAF plans are cached (a plain table read optimizes
    * to one scan relation); anything else is rebuilt per use. */
  private val planCache = new java.util.concurrent.ConcurrentHashMap[
    (graft.txn.TableCatalog, String), (Long, Long, LogicalPlan)]()
  private val PlanCacheCap = 200

  /** The view's optimized scan plan with FRESH attribute ids. */
  private[mv] def substitutedPlan(
      session: SparkSession,
      mvDir: String,
      catalog: graft.txn.TableCatalog,
      mv: graft.txn.TableSnapshot): Option[LogicalPlan] = {
    val key = (catalog, mvDir)
    val cached = planCache.get(key)
    if (cached != null && cached._1 == mv.version &&
        cached._2 == mv.committedAtMs)
      // fresh attribute ids per USE: the same query may substitute the
      // view twice (self-join of two aggregates), and duplicate ids
      // across branches would corrupt the join. Only whole-plan LEAVES
      // are ever cached, so re-instancing cannot dangle references
      // from parent operators.
      return Some(cached._3 match {
        case m: org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation =>
          m.newInstance().asInstanceOf[LogicalPlan]
        case p => p
      })
    metadataOps.incrementAndGet()
    val p = TableReader.readOption(session, mvDir, catalog = catalog)
      .getOrElse(return None).queryExecution.optimizedPlan
    // a view WITHOUT delete files optimizes to one scan relation —
    // cacheable; a MoR join plan is NOT cached (and needs no
    // re-instancing: every build has fresh ids)
    if (p.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LeafNode]) {
      if (planCache.size > PlanCacheCap) planCache.clear()
      planCache.put(key, (mv.version, mv.committedAtMs, p))
    }
    Some(p)
  }

  /** Negative registry cache: (source dir → (probedAtMs, hasRegistry)).
    * Used ONLY to skip the per-query metadata load when no session
    * views are configured and a recent probe found no registry — the
    * safe direction (fall back to the real aggregate). Freshness checks
    * for ACTUAL substitution never go through this cache. */
  private val registryProbe =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Boolean)]()
  private val ProbeTtlMs = 30000L
  private val ProbeCap = 10000

  private[mv] def knownRegistryless(dir: String): Boolean = {
    val e = registryProbe.get(dir)
    e != null && !e._2 && System.currentTimeMillis() - e._1 < ProbeTtlMs
  }
  private[graft] def recordRegistryProbe(dir: String, has: Boolean): Unit = {
    if (registryProbe.size > ProbeCap) registryProbe.clear()
    registryProbe.put(dir, (System.currentTimeMillis(), has))
  }
}
