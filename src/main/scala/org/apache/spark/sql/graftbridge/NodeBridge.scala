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

  private def convert(n: ColumnNode): PredNode = n match {
    case f: UnresolvedFunction =>
      PredNode.Fn(f.functionName, f.arguments.map(convert))
    case a: UnresolvedAttribute => PredNode.Attr(a.nameParts.mkString("."))
    case l: Literal             => PredNode.Lit(l.value)
    case _                      => PredNode.Opaque
  }
}
