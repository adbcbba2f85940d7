package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** In-order BPE merge application over one word, as data instead of
  * plan: the K learned merges ride in a broadcast-small rank table
  * referenced by ONE compiled expression, not as K nested `replace`
  * calls compiled into the plan tree.
  *
  * [[graft.pipeline.Bpe.encodeUnfused]] (the literal-replace fold this
  * replaces in the hot path, kept as the cross-validation twin and the
  * shape the DuckDB oracle replays) is correct but compiles the merge
  * list INTO the expression tree — at a realistic 32k-merge vocabulary
  * that is a 32k-deep replace chain: analyzer cost grows with every
  * merge, and janino/codegen limits break long before. Here the plan
  * size is O(1) in K; only this object's merge array grows.
  *
  * Semantics are EXACTLY the fold's, proven element-wise:
  *  - a word is its code-point symbol sequence (the fold's
  *    `regexp_extract_all(word, '.')`);
  *  - each merge (pa, pb), in training order, is ONE leftmost
  *    non-overlapping left-to-right pass: at a match emit pa+pb and
  *    continue AFTER the pair (Java `replace` continue-after-
  *    replacement over the double-space encoding — symbols contain no
  *    spaces, so string matches are exactly token matches, and a
  *    replacement can never create a new match of the SAME rule since
  *    papb differs from both pa and pb);
  *  - output is the single-space join (the fold's final re-join).
  *
  * The per-word cost win over the fold: a symbol-presence count map
  * skips any rule whose operands cannot both occur (two hash probes),
  * so a word pays the O(len) scan only for the handful of rules that
  * might fire — the 32k-rule common case is 64k hash probes, not 32k
  * string scans.
  */
final class BpeApplier(paList: Array[String], pbList: Array[String])
    extends Serializable {
  require(paList.length == pbList.length)

  def this(merges: Seq[(String, String)]) =
    this(merges.map(_._1).toArray, merges.map(_._2).toArray)

  /** Encode one word: returns its subword symbols single-space-joined. */
  def encode(word: UTF8String): UTF8String =
    UTF8String.fromString(encodeString(word.toString))

  def encodeString(word: String): String = {
    // code-point symbols (the `.` regex matches full code points)
    var syms = new Array[String](word.codePointCount(0, word.length))
    var ci = 0
    var si = 0
    while (ci < word.length) {
      val cp = word.codePointAt(ci)
      syms(si) = new String(Character.toChars(cp))
      si += 1
      ci += Character.charCount(cp)
    }
    var n = syms.length
    // presence counts: a rule can only fire if both operands occur
    val counts = new java.util.HashMap[String, Int](math.max(8, n * 2))
    var i = 0
    while (i < n) {
      counts.merge(syms(i), 1, (a, b) => a + b)
      i += 1
    }
    var m = 0
    while (m < paList.length && n > 1) {
      val pa = paList(m)
      val pb = pbList(m)
      val ca = counts.getOrDefault(pa, 0)
      if (ca > 0 && (if (pa == pb) ca >= 2 else counts.getOrDefault(pb, 0) > 0)) {
        // one leftmost non-overlapping pass; write-in-place compaction
        var r = 0
        var w = 0
        var fired = 0
        while (r < n) {
          if (r + 1 < n && syms(r) == pa && syms(r + 1) == pb) {
            syms(w) = pa + pb
            r += 2
            fired += 1
          } else {
            syms(w) = syms(r)
            r += 1
          }
          w += 1
        }
        if (fired > 0) {
          n = w
          // maintain counts: each firing consumed one pa and one pb
          // and produced one papb
          counts.merge(pa, -fired, (a, b) => a + b)
          counts.merge(pb, -fired, (a, b) => a + b)
          counts.merge(pa + pb, fired, (a, b) => a + b)
        }
      }
      m += 1
    }
    if (n == syms.length) syms.mkString(" ")
    else {
      val sb = new java.lang.StringBuilder
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(syms(k))
        k += 1
      }
      sb.toString
    }
  }
}

/** `bpe_encode_word(word)`: the [[BpeApplier]] as a native expression.
  * Generated code is one static-shaped call into the applier via a
  * codegen reference object, so the projection stays inside whole-stage
  * codegen at any K. */
case class BpeEncodeWordExpr(child: Expression,
    merges: Seq[(String, String)]) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_encode_word"

  @transient private lazy val applier = new BpeApplier(merges)

  override def nullSafeEval(input: Any): Any =
    applier.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("bpeApplier", new BpeApplier(merges),
      classOf[BpeApplier].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BpeColumns {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def bpeEncodeWord(word: Column, merges: Seq[(String, String)]): Column =
    column(BpeEncodeWordExpr(expression(word), merges))
}
