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
  *    continue AFTER the pair;
  *  - output is the single-space join (the fold's final re-join).
  *
  * The per-word COST is O(len + fires), independent of K — the
  * production requirement a 32k-merge vocabulary imposes (an earlier
  * presence-count skip still paid two hash probes per RULE per word:
  * Θ(K), ~150 s for a 50k-doc corpus at K=32k). Key insight: a rule
  * can only fire when its pair is ADJACENT, and under in-order
  * semantics an adjacency created while processing rule m is only ever
  * consumed by a LATER rule — so the passes that fire are exactly the
  * ranks popped, in increasing order, from a min-heap seeded with the
  * initial adjacent pairs' ranks and fed with each new adjacency's
  * first rank STRICTLY AFTER the rank that created it. A popped rank
  * whose adjacency was destroyed in the meantime fires zero times
  * (lazy deletion, harmless). Duplicate-pair rule lists are handled by
  * binary-searching the pair's sorted rank array. Operands are
  * interned to int ids once at construction, so the per-word hot path
  * compares ints and probes one long-keyed map per initial pair, never
  * hashing rule strings.
  */
final class BpeApplier(paList: Array[String], pbList: Array[String])
    extends Serializable {
  require(paList.length == pbList.length)

  def this(merges: Seq[(String, String)]) =
    this(merges.map(_._1).toArray, merges.map(_._2).toArray)

  // ---- frozen rule tables (built once, shared by every row) ----
  /** symbol -> dense id over every rule operand and output */
  @transient private lazy val symId: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    def intern(s: String): Unit =
      if (!m.containsKey(s)) m.put(s, m.size)
    var i = 0
    while (i < paList.length) {
      intern(paList(i)); intern(pbList(i)); intern(paList(i) + pbList(i))
      i += 1
    }
    m
  }
  @transient private lazy val paIds: Array[Int] =
    paList.map(s => symId.get(s).intValue)
  @transient private lazy val pbIds: Array[Int] =
    pbList.map(s => symId.get(s).intValue)
  @transient private lazy val outIds: Array[Int] =
    paList.indices.map(i => symId.get(paList(i) + pbList(i)).intValue).toArray
  @transient private lazy val outStrs: Array[String] =
    paList.indices.map(i => paList(i) + pbList(i)).toArray
  /** (aId << 32 | bId) -> sorted ranks of rules merging that pair
    * (training emits unique pairs, but a hand-built list may repeat). */
  @transient private lazy val pairRanks: java.util.HashMap[java.lang.Long, Array[Int]] = {
    val m = new java.util.HashMap[java.lang.Long, Array[Int]]()
    var i = 0
    while (i < paList.length) {
      val k = java.lang.Long.valueOf(
        (paIds(i).toLong << 32) | (pbIds(i).toLong & 0xffffffffL))
      val prev = m.get(k)
      m.put(k, if (prev == null) Array(i) else prev :+ i)
      i += 1
    }
    m // per-pair arrays are insertion-ordered = rank-sorted
  }

  /** First rank of pair (a, b) that is STRICTLY AFTER `after`
    * (-1 = none). `after = -1` admits every rank (initial pairs). */
  private def nextRank(a: Int, b: Int, after: Int): Int = {
    if (a < 0 || b < 0) return -1
    val rs = pairRanks.get(java.lang.Long.valueOf(
      (a.toLong << 32) | (b.toLong & 0xffffffffL)))
    if (rs == null) return -1
    var lo = 0; var hi = rs.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (rs(mid) <= after) lo = mid + 1 else hi = mid
    }
    if (lo < rs.length) rs(lo) else -1
  }

  /** Encode one word: returns its subword symbols single-space-joined. */
  def encode(word: UTF8String): UTF8String =
    UTF8String.fromString(encodeString(word.toString))

  def encodeString(word: String): String = {
    // code-point symbols (the `.` regex matches full code points)
    val syms = new Array[String](word.codePointCount(0, word.length))
    val ids = new Array[Int](syms.length)
    var ci = 0
    var si = 0
    while (ci < word.length) {
      val cp = word.codePointAt(ci)
      val s = new String(Character.toChars(cp))
      syms(si) = s
      val id = symId.get(s)
      ids(si) = if (id == null) -1 else id.intValue
      si += 1
      ci += Character.charCount(cp)
    }
    var n = syms.length
    if (n > 1 && paList.length > 0) {
      // min-heap of candidate ranks (tiny; duplicates tolerated)
      var heap = new Array[Int](8)
      var hn = 0
      def push(r: Int): Unit = if (r >= 0) {
        if (hn == heap.length) heap = java.util.Arrays.copyOf(heap, hn * 2)
        var c = hn; heap(c) = r; hn += 1
        while (c > 0 && heap((c - 1) >> 1) > heap(c)) {
          val p = (c - 1) >> 1
          val t = heap(p); heap(p) = heap(c); heap(c) = t; c = p
        }
      }
      def pop(): Int = {
        val top = heap(0); hn -= 1; heap(0) = heap(hn)
        var c = 0
        while (true) {
          val l = 2 * c + 1; val r = l + 1
          var s2 = c
          if (l < hn && heap(l) < heap(s2)) s2 = l
          if (r < hn && heap(r) < heap(s2)) s2 = r
          if (s2 == c) return top
          val t = heap(s2); heap(s2) = heap(c); heap(c) = t; c = s2
        }
        top
      }
      var i = 0
      while (i < n - 1) { push(nextRank(ids(i), ids(i + 1), -1)); i += 1 }
      // fired write-positions of one pass (new-adjacency sites)
      var firedAt = new Array[Int](8)
      var last = -1
      while (hn > 0 && n > 1) {
        val m = pop()
        if (m != last) { // skip duplicate candidates of one rank
          last = m
          val paId = paIds(m); val pbId = pbIds(m)
          var r = 0; var w = 0; var fired = 0
          while (r < n) {
            if (r + 1 < n && ids(r) == paId && ids(r + 1) == pbId) {
              if (fired == firedAt.length)
                firedAt = java.util.Arrays.copyOf(firedAt, fired * 2)
              firedAt(fired) = w
              syms(w) = outStrs(m); ids(w) = outIds(m)
              r += 2; fired += 1
            } else { syms(w) = syms(r); ids(w) = ids(r); r += 1 }
            w += 1
          }
          if (fired > 0) {
            n = w
            // each fire site creates at most two NEW adjacencies; their
            // next applicable rank is strictly after m (a rank <= m
            // already had its pass — in-order semantics never revisits)
            var f = 0
            while (f < fired) {
              val p = firedAt(f)
              if (p > 0) push(nextRank(ids(p - 1), ids(p), m))
              if (p + 1 < n) push(nextRank(ids(p), ids(p + 1), m))
              f += 1
            }
          }
        }
      }
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

/** [[BpeEncodeWordExpr]] with the merge table behind an EXPLICIT
  * broadcast variable instead of a plan literal: a vocabulary-scale
  * merge list (32k merges ≈ 45 MiB of operand strings) embedded as a
  * case-class field rides inside EVERY task binary and deserializes
  * once per task — 32 concurrent tasks pay ~1.5 GiB of transient heap
  * for the same frozen table. Behind a broadcast the executor JVM
  * holds ONE copy (torrent-fetched once), every task reads it through
  * the handle, and the task binary stays kilobytes at any K. Used
  * automatically by [[graft.pipeline.Bpe.encode]] above the
  * literal-affordable size. */
case class BpeEncodeWordBcastExpr(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[BpeApplier])
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_encode_word_bcast"

  override def nullSafeEval(input: Any): Any =
    bc.value.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("bpeBc", bc,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    defineCodeGen(ctx, ev, c =>
      s"((${classOf[BpeApplier].getName}) $ref.value()).encode($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BpeColumns {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def bpeEncodeWord(word: Column, merges: Seq[(String, String)]): Column =
    column(BpeEncodeWordExpr(expression(word), merges))

  def bpeEncodeWordBcast(word: Column,
      bc: org.apache.spark.broadcast.Broadcast[BpeApplier]): Column =
    column(BpeEncodeWordBcastExpr(expression(word), bc))
}
