package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.internal.{ColumnNode, Literal, UnresolvedAttribute, UnresolvedFunction}

/** Read-only view of a Column's node tree (Spark 4 Columns are
  * `private[sql]` ColumnNode trees until bound to a plan). The engine's
  * scan pruning needs to inspect UNBOUND filter predicates — before any
  * DataFrame exists to resolve them against — so this shim, living in
  * the `org.apache.spark.sql` namespace like [[ColumnBridge]], converts
  * the private node tree into a minimal public ADT. Anything beyond
  * attribute/literal/function collapses to [[PredNode.Opaque]], which
  * consumers must treat as "unknown — assume it can match anything". */
object NodeBridge {

  sealed trait PredNode
  object PredNode {
    final case class Fn(name: String, args: Seq[PredNode]) extends PredNode
    final case class Attr(name: String) extends PredNode
    final case class Lit(value: Any) extends PredNode
    case object Opaque extends PredNode
  }

  def tree(c: Column): PredNode = convert(c.node)

  /** A SQL predicate string as a [[PredNode]] tree — the path for
    * callers holding a predicate as TEXT (e.g. a procedure's `where`
    * argument): `expr(sql)` wraps a parsed catalyst expression in a
    * node [[convert]] cannot see into, so parse and walk the catalyst
    * tree directly. Unhandled shapes collapse to Opaque (assume-match),
    * same contract as the Column path. */
  def treeOfSql(sql: String): PredNode =
    try convertExpr(
      org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseExpression(sql))
    catch { case scala.util.control.NonFatal(_) => PredNode.Opaque }

  private def convertExpr(
      e: org.apache.spark.sql.catalyst.expressions.Expression): PredNode = {
    import org.apache.spark.sql.catalyst.{expressions => ce}
    e match {
      case ce.And(l, r) => PredNode.Fn("and", Seq(convertExpr(l), convertExpr(r)))
      case ce.Or(l, r) => PredNode.Fn("or", Seq(convertExpr(l), convertExpr(r)))
      case ce.EqualTo(l, r) => PredNode.Fn("=", Seq(convertExpr(l), convertExpr(r)))
      case ce.GreaterThan(l, r) => PredNode.Fn(">", Seq(convertExpr(l), convertExpr(r)))
      case ce.GreaterThanOrEqual(l, r) => PredNode.Fn(">=", Seq(convertExpr(l), convertExpr(r)))
      case ce.LessThan(l, r) => PredNode.Fn("<", Seq(convertExpr(l), convertExpr(r)))
      case ce.LessThanOrEqual(l, r) => PredNode.Fn("<=", Seq(convertExpr(l), convertExpr(r)))
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        PredNode.Attr(a.nameParts.mkString("."))
      case l: ce.Literal => PredNode.Lit(l.value match {
        case u: org.apache.spark.unsafe.types.UTF8String => u.toString
        case v => v
      })
      case _ => PredNode.Opaque
    }
  }

  private def convert(n: ColumnNode): PredNode = n match {
    case f: UnresolvedFunction =>
      PredNode.Fn(f.functionName, f.arguments.map(convert))
    case a: UnresolvedAttribute => PredNode.Attr(a.nameParts.mkString("."))
    case l: Literal             => PredNode.Lit(l.value)
    case _                      => PredNode.Opaque
  }
}
