package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedRelation, ViewAlreadyExistsException}
import org.apache.spark.sql.catalyst.plans.logical.{CreateView, DropView, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, View, ViewCatalog, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** Analyzer wiring for persisted views over the graft ViewCatalog —
  * OSS Spark ships the [[ViewCatalog]] API but its analyzer routes view
  * DDL only to the session catalog (`ResolveSessionCatalog` raises
  * MISSING_CATALOG_ABILITY.VIEWS for everything else), so the catalog
  * must bring its own resolution, injected as a HINT-stage rule: the
  * Hints batch runs BEFORE the Resolution batch, so the rewrite happens
  * while the identifiers are still unresolved — before the session-
  * catalog rule can reject them. (The same pattern external catalogs
  * use for their view support.)
  *
  * Covered: CREATE [OR REPLACE] VIEW / IF NOT EXISTS, DROP VIEW
  * [IF EXISTS], and SELECT through a view (substituted by re-parsing
  * the stored SQL — the view tracks its tables' data and schema
  * evolution automatically). Unqualified table names inside a view
  * body resolve under the view's stored current catalog/namespace.
  * ALTER VIEW SET/UNSET properties and RENAME go through the
  * ViewCatalog API directly (spec-covered); SHOW VIEWS is session-only
  * in OSS Spark. */
final case class GraftViewSubstitution(spark: SparkSession)
    extends Rule[LogicalPlan] {

  /** The (ViewCatalog, Identifier) a multipart name addresses: an
    * explicit catalog head wins; otherwise the name resolves relative
    * to the CURRENT catalog/namespace when that catalog supports views.
    * Temp views keep their Spark precedence — a 1-part name matching a
    * temp view is never treated as a persisted view. */
  private def viewCatalogAndIdent(parts: Seq[String])
      : Option[(ViewCatalog, Identifier)] = {
    val cm = spark.sessionState.catalogManager
    // temp and global-temp views keep their Spark precedence
    if (spark.sessionState.catalog.isTempView(parts)) return None
    if (parts.length >= 2 && parts.head ==
        spark.sessionState.catalog.globalTempDatabase) return None
    if (parts.length >= 2 && cm.isCatalogRegistered(parts.head))
      cm.catalog(parts.head) match {
        case vc: ViewCatalog =>
          Some((vc, Identifier.of(parts.tail.init.toArray, parts.last)))
        case _ => None
      }
    else cm.currentCatalog match {
      case vc: ViewCatalog =>
        val ns = if (parts.length == 1) cm.currentNamespace
          else parts.init.toArray
        Some((vc, Identifier.of(ns, parts.last)))
      case _ => None
    }
  }

  private def loadedView(parts: Seq[String]): Option[(ViewCatalog, Identifier, View)] =
    viewCatalogAndIdent(parts).flatMap { case (vc, ident) =>
      // ONE load (listing + read) instead of exists-then-load — this
      // runs per UnresolvedRelation per analyzer iteration
      try Some((vc, ident, vc.loadView(ident)))
      catch {
        case _: org.apache.spark.sql.catalyst.analysis.NoSuchViewException =>
          None
      }
    }

  /** Qualify the table names inside a re-parsed view body under the
    * view's stored default catalog/namespace (names that already lead
    * with a registered catalog pass through). */
  private def qualified(body: LogicalPlan, v: View): LogicalPlan = {
    val cm = spark.sessionState.catalogManager
    body.transformUp {
      case u @ UnresolvedRelation(parts, opts, isStreaming)
          if !cm.isCatalogRegistered(parts.head) =>
        val full =
          if (parts.length == 1)
            (v.currentCatalog +: v.currentNamespace.toSeq) :+ parts.head
          else v.currentCatalog +: parts
        UnresolvedRelation(full, opts, isStreaming)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    // ---- SELECT through a persisted view: splice the re-parsed body.
    // Declared column aliases apply as a subquery-column-alias node
    // (the `FROM (...) t(a, b)` mechanism), so the view exposes its
    // DECLARED names, not the body's.
    case u @ UnresolvedRelation(parts, _, false) =>
      loadedView(parts) match {
        case Some((_, ident, v)) =>
          val body = qualified(
            spark.sessionState.sqlParser.parsePlan(v.query), v)
          val aliased =
            if (v.columnAliases == null || v.columnAliases.isEmpty) body
            else org.apache.spark.sql.catalyst.analysis
              .UnresolvedSubqueryColumnAliases(
                v.columnAliases.toIndexedSeq, body)
          SubqueryAlias(ident.name, aliased)
        case None => u
      }
    // ---- CREATE [OR REPLACE] VIEW
    case CreateView(UnresolvedIdentifier(parts, false), userCols, comment, _,
        props, originalText, query, allowExisting, replace, _)
        if viewCatalogAndIdent(parts).isDefined =>
      val (vc, ident) = viewCatalogAndIdent(parts).get
      CreateGraftViewCommand(vc, ident,
        originalText.getOrElse(throw graft.core.CompactionError.Config(
          s"CREATE VIEW $parts: no SQL text (DataFrame-defined views are " +
            "not storable; define the view in SQL)")),
        query,
        userCols.map(_._1), userCols.map(_._2),
        comment, props, allowExisting, replace)
    // ---- DROP VIEW (its identifier allows temp names — the temp/
    // global-temp guards in viewCatalogAndIdent keep precedence right)
    case DropView(UnresolvedIdentifier(parts, _), ifExists)
        if viewCatalogAndIdent(parts).isDefined =>
      val (vc, ident) = viewCatalogAndIdent(parts).get
      DropGraftViewCommand(vc, ident, ifExists)
    // ---- SHOW VIEWS [IN ns] [LIKE pattern]
    case s @ org.apache.spark.sql.catalyst.plans.logical.ShowViews(
        org.apache.spark.sql.catalyst.analysis.UnresolvedNamespace(parts, _),
        pattern, output) =>
      val cm = spark.sessionState.catalogManager
      val (cat, ns) =
        if (parts.nonEmpty && cm.isCatalogRegistered(parts.head))
          (cm.catalog(parts.head), parts.tail)
        else if (parts.isEmpty)
          (cm.currentCatalog, cm.currentNamespace.toSeq)
        else (cm.currentCatalog, parts)
      cat match {
        case vc: ViewCatalog => ShowGraftViewsCommand(vc, ns, pattern, output)
        case _ => s // session catalog keeps Spark's own SHOW VIEWS
      }
  }
}

/** Eagerly-executed CREATE VIEW against a [[ViewCatalog]]: analyzes the
  * view body to capture the create-time schema snapshot, then commits
  * the view document (CAS — a racing CREATE loses cleanly). */
final case class CreateGraftViewCommand(
    catalog: ViewCatalog,
    ident: Identifier,
    sql: String,
    query: LogicalPlan,
    columnAliases: Seq[String],
    columnComments: Seq[Option[String]],
    comment: Option[String],
    properties: Map[String, String],
    allowExisting: Boolean,
    replace: Boolean) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val qe = spark.sessionState.executePlan(query)
    qe.assertAnalyzed()
    val analyzedSchema = qe.analyzed.schema
    val qcols = analyzedSchema.fieldNames
    if (columnAliases.nonEmpty && columnAliases.length != qcols.length)
      throw graft.core.CompactionError.Config(
        s"CREATE VIEW $ident: ${columnAliases.length} column aliases for " +
          s"a ${qcols.length}-column query")
    val schema =
      if (columnAliases.isEmpty) analyzedSchema
      else org.apache.spark.sql.types.StructType(
        analyzedSchema.fields.zip(columnAliases).map {
          case (f, a) => f.copy(name = a)
        })
    val cm = spark.sessionState.catalogManager
    import scala.jdk.CollectionConverters._
    val props = properties ++ comment.map(ViewCatalog.PROP_COMMENT -> _)
    val info = new ViewInfo(ident, sql,
      cm.currentCatalog.name(), cm.currentNamespace,
      schema, qcols,
      columnAliases.toArray,
      columnComments.map(_.orNull).toArray,
      props.asJava)
    // cycle guard BEFORE committing: the analysis above resolved the
    // body against the OLD stored definitions (a REPLACE referencing
    // itself analyzes fine against its previous body), so walk the NEW
    // definition's view references and refuse if they reach back to
    // the view being defined — otherwise every later read would loop
    // the substitution until the analyzer's max-iterations error
    checkNoCycle(spark,
      startKey = catalog.name() + "." + ident.toString,
      bodySql = sql,
      ctxCat = cm.currentCatalog.name(),
      ctxNs = cm.currentNamespace.toSeq)
    if (replace) catalog.replaceView(info, true)
    else {
      try catalog.createView(info)
      catch { case _: ViewAlreadyExistsException if allowExisting => }
    }
    Nil
  }

  /** BFS over stored view references, each body's names resolved under
    * ITS stored context; bounded by the number of persisted views. */
  private def checkNoCycle(spark: SparkSession, startKey: String,
      bodySql: String, ctxCat: String, ctxNs: Seq[String]): Unit = {
    val cm = spark.sessionState.catalogManager
    def viewIdentOf(parts: Seq[String], cat: String, ns: Seq[String])
        : Option[(ViewCatalog, Identifier)] = {
      val full =
        if (cm.isCatalogRegistered(parts.head)) parts
        else if (parts.length == 1) (cat +: ns) :+ parts.head
        else cat +: parts
      if (!cm.isCatalogRegistered(full.head)) return None
      cm.catalog(full.head) match {
        case vc: ViewCatalog =>
          Some((vc, Identifier.of(full.tail.init.toArray, full.last)))
        case _ => None
      }
    }
    val seen = scala.collection.mutable.Set.empty[String]
    def walk(sql: String, cat: String, ns: Seq[String]): Unit = {
      val body = spark.sessionState.sqlParser.parsePlan(sql)
      val rels = body.collectWithSubqueries {
        case UnresolvedRelation(parts, _, _) => parts
      }
      rels.foreach { parts =>
        viewIdentOf(parts, cat, ns).foreach { case (vc, id) =>
          val key = vc.name() + "." + id.toString
          if (key == startKey) throw graft.core.CompactionError.Config(
            s"recursive view definition: $startKey references itself " +
              s"(via $parts)")
          if (seen.add(key)) {
            try {
              val v = vc.loadView(id)
              walk(v.query, v.currentCatalog, v.currentNamespace.toSeq)
            } catch {
              case _: org.apache.spark.sql.catalyst.analysis
                .NoSuchViewException => // a table or missing — not a view edge
            }
          }
        }
      }
    }
    walk(bodySql, ctxCat, ctxNs)
  }
}

/** SHOW VIEWS against a [[ViewCatalog]]: the session-catalog output
  * shape (namespace, viewName, isTemporary=false), with the standard
  * LIKE-pattern filter. */
final case class ShowGraftViewsCommand(
    catalog: ViewCatalog,
    ns: Seq[String],
    pattern: Option[String],
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute]
) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val names = catalog.listViews(ns: _*).map(_.name).toSeq
    val kept = pattern match {
      case Some(p) => org.apache.spark.sql.catalyst.util.StringUtils
        .filterPattern(names, p)
      case None => names
    }
    kept.sorted.map(n => Row(ns.mkString("."), n, false))
  }
}

/** Eagerly-executed DROP VIEW against a [[ViewCatalog]]. */
final case class DropGraftViewCommand(
    catalog: ViewCatalog,
    ident: Identifier,
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (!catalog.dropView(ident) && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident)
    Nil
  }
}
