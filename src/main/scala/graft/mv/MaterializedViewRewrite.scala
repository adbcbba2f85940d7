package graft.mv

import graft.sources.TableReader
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
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
    def scanOf(child: LogicalPlan): Option[graft.streaming.GraftTable] =
      child match {
        case rel: DataSourceV2Relation => usable(rel)
        case Project(projList, rel: DataSourceV2Relation)
            if projList.forall(_.isInstanceOf[AttributeReference]) =>
          usable(rel)
        case _ => None
      }
    plan.transformUp {
      case agg @ Aggregate(ges, aes, child, _) if scanOf(child).isDefined =>
        val tbl = scanOf(child).get
        (try {
          // fast path: with no session views AND a recent negative
          // probe of this table's registry, skip the metadata load
          // entirely — falling back to the real aggregate is always
          // correct, so the short staleness window only delays when a
          // BRAND-NEW view starts substituting
          if (sessionViews.isEmpty &&
              MaterializedViewRewrite.knownRegistryless(tbl.dir)) None
          else tbl.tableCatalog.load(tbl.dir).flatMap { srcSnap =>
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
                tryRewrite(mv, tbl.dir, tbl.tableCatalog, srcSnap, ges, aes))
              .nextOption()
          }
        } catch { case NonFatal(_) => None }).getOrElse(agg)
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
      aes: Seq[NamedExpression]): Option[LogicalPlan] =
    try {
      // the SOURCE table's catalog also resolves the view: the MV
      // procedures create views through the session catalog's format
      val mv = catalog.load(mvDir).getOrElse(return None)
      if (!mv.properties.get(MaterializedView.SourceProp).contains(srcDir))
        return None
      val spec = MaterializedView.decodeSpec(
        mv.properties(MaterializedView.SpecProp))

      // grouping must be exactly the view's group columns
      val groupNames = ges.map {
        case a: AttributeReference => a.name
        case _ => return None
      }
      if (groupNames.toSet != spec.group.toSet ||
          groupNames.size != spec.group.size) return None

      // every output resolves to a view column
      val byFnCol: Map[(String, String), String] =
        spec.aggs.map(a => (a.fn, a.col) -> a.alias).toMap
      val mapped: Seq[(NamedExpression, String, Boolean)] = aes.map { ne =>
        val (colName, isSum) = ne match {
          case a: AttributeReference if groupNames.contains(a.name) =>
            (a.name, false)
          case Alias(a: AttributeReference, _) if groupNames.contains(a.name) =>
            (a.name, false)
          case Alias(ae: AggregateExpression, _)
              if !ae.isDistinct && ae.filter.isEmpty =>
            ae.aggregateFunction match {
              case s: Sum =>
                s.child match {
                  case a: AttributeReference if integral(a) =>
                    (byFnCol.getOrElse(("sum", a.name), return None), true)
                  case _ => return None
                }
              case c: Count =>
                c.children match {
                  // count(*) lowers to count(1); count(NULL) is NOT it
                  // (always 0) and must never map to the row count
                  case Seq(Literal(v, _)) if v != null =>
                    (byFnCol.getOrElse(("count", "*"), return None), false)
                  case Seq(a: AttributeReference) =>
                    (byFnCol.getOrElse(("count", a.name), return None), false)
                  case _ => return None
                }
              case _ => return None
            }
          case _ => return None
        }
        (ne, colName, isSum)
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
      // would reach physical planning unstripped
      val mvPlan = TableReader.readOption(session, mvDir, catalog = catalog)
        .getOrElse(return None).queryExecution.optimizedPlan
      val mvAttr = mvPlan.output.map(a => a.name -> a).toMap
      val projections: Seq[NamedExpression] = mapped.map {
        case (ne, colName, isSum) =>
          val target = ne.toAttribute
          val src = mvAttr.getOrElse(colName, return None)
          // SQL null semantics for substituted sums: the stored total
          // is 0-based; the paired non-null count decides NULL
          val value: Expression =
            if (isSum) {
              val nn = mvAttr.getOrElse(
                MaterializedView.nnCol(colName), return None)
              If(GreaterThan(nn, Literal(0L)), src,
                Literal.create(null, LongType))
            } else src
          Alias(value, target.name)(exprId = target.exprId)
      }
      logInfo(s"rewriting aggregate over $srcDir to materialized view $mvDir")
      Some(Project(projections, mvPlan))
    } catch { case NonFatal(_) => None }
}


object MaterializedViewRewrite {
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
