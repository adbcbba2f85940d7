package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Native Catalyst expressions for the hash-sketch hot paths.
  *
  * Semantics are EXACTLY the md5-hex forms the DuckDB oracle replays —
  * `hash64(seed, s) = first 15 hex digits of md5("<seed>:<s>") as int64`
  * — but evaluated in one compiled pass per row instead of per-element
  * Catalyst HOF interpretation. Measured on sf0.1 documents this is the
  * difference between ~46 s and ~2 s for 32-seed MinHash signatures
  * (8.3M md5 evaluations); at 100 TB it is the difference between a
  * viable sketch pass and an unusable one.
  *
  * The expressions use `CodegenFallback` deliberately: the per-ROW work
  * (a tight loop over shingles x seeds) is already compiled Scala, so
  * whole-stage codegen would only inline the call — nothing per-element
  * is interpreted.
  */
object Hash64 {
  /** First 15 hex digits of md5(prefixBytes ++ sBytes) as a long —
    * equals `CAST(conv(substr(md5(concat(seed,':',s)),1,15),16,10) AS BIGINT)`. */
  def hash64(md: MessageDigest, prefix: Array[Byte], s: Array[Byte]): Long = {
    md.reset()
    md.update(prefix)
    md.update(s)
    val d = md.digest()
    // first 8 bytes big-endian >>> 4 == first 15 hex digits
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def seedPrefix(seed: String): Array[Byte] =
    (seed + ":").getBytes(StandardCharsets.UTF_8)

  def newMd5(): MessageDigest = MessageDigest.getInstance("MD5")

  /** Production hash path: xxHash64 (Spark's own XXH64, the algorithm
    * behind the codegen'd `xxhash64` builtin) of a UTF8String under a
    * long seed — ~10x cheaper than md5 per call, hashing the string's
    * bytes in place with zero copies. NOT oracle-replayable (DuckDB has
    * no seeded-xxh64 twin), so oracle-checked queries stay on md5; flip
    * the sketch operators' `hashKind` to "xx" for production corpora. */
  def xx64(s: org.apache.spark.unsafe.types.UTF8String, seed: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  val KindMd5 = "md5"
  val KindXx = "xx"
  def requireKind(hashKind: String): Unit =
    require(hashKind == KindMd5 || hashKind == KindXx,
      s"hashKind must be '$KindMd5' or '$KindXx', got '$hashKind'")
}

/** MinHash signature over an array<string> feature column: for each seed
  * 0..numHashes-1, min over features of hash(seed, feature). Empty or
  * null-element-only input yields null elements (matching
  * `list_min(list_transform([], ...)) -> NULL`). `hashKind` selects the
  * oracle-replayable md5 form or the xxHash64 production form. */
case class MinHashSignatureExpr(child: Expression, numHashes: Int,
    hashKind: String = Hash64.KindMd5)
    extends UnaryExpression with CodegenFallback {
  Hash64.requireKind(hashKind)
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_signature"

  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(numHashes)(i => Hash64.seedPrefix(i.toString))
  private val useXx = hashKind == Hash64.KindXx

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = if (useXx) null else Hash64.newMd5()
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val u = arr.getUTF8String(i)
        if (useXx) {
          var h = 0
          while (h < numHashes) {
            val v = Hash64.xx64(u, h.toLong)
            if (v < out(h)) out(h) = v
            h += 1
          }
        } else {
          val s = u.getBytes
          var h = 0
          while (h < numHashes) {
            val v = Hash64.hash64(md, prefixes(h), s)
            if (v < out(h)) out(h) = v
            h += 1
          }
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(Array.fill[Any](numHashes)(null))
    else new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 32-bit SimHash over an array<string> feature column: bit j set iff
  * sum over features of (bit j of hash("s", feature) -> +-1) > 0.
  * `hashKind` selects md5 (oracle form) or xxHash64 (production form). */
case class SimHash32Expr(child: Expression, hashKind: String = Hash64.KindMd5)
    extends UnaryExpression with CodegenFallback {
  Hash64.requireKind(hashKind)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  @transient private lazy val prefix = Hash64.seedPrefix("s")
  private val useXx = hashKind == Hash64.KindXx

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = if (useXx) null else Hash64.newMd5()
    val counts = new Array[Int](32)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val u = arr.getUTF8String(i)
        val h =
          if (useXx) Hash64.xx64(u, 0L)
          else Hash64.hash64(md, prefix, u.getBytes)
        var j = 0
        while (j < 32) {
          if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var v = 0L
    var j = 0
    while (j < 32) { if (counts(j) > 0) v |= (1L << j); j += 1 }
    java.lang.Long.valueOf(v)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Min over features of hash64(seedPrefix, feature) — the fingerprint
  * floor. Null on empty input (matching list_min of empty). */
case class HashMinExpr(child: Expression, seed: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "hash_min"

  @transient private lazy val prefix = Hash64.seedPrefix(seed)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = Hash64.newMd5()
    var best = Long.MaxValue
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val v = Hash64.hash64(md, prefix, arr.getUTF8String(i).getBytes)
        if (v < best) best = v
      }
      i += 1
    }
    if (!any) null else java.lang.Long.valueOf(best)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Intersection size of two SORTED array columns (string or long
  * elements) via a two-pointer merge — equivalent to
  * `size(array_intersect(a, b))` on distinct inputs but with no
  * intermediate array and, for long elements, no allocation at all in the
  * hot loop. Callers sort once per row, upstream of the pairwise join. */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  @transient private lazy val longElements: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var cnt = 0
    if (longElements) {
      while (i < na && j < nb) {
        val x = a.getLong(i)
        val y = b.getLong(j)
        if (x == y) { cnt += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
    } else {
      while (i < na && j < nb) {
        val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (c == 0) { cnt += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    java.lang.Integer.valueOf(cnt)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** [[SortedIntersectCountExpr]] fused with the containment formula AND a
  * THRESHOLD EARLY EXIT — the pair-verify hot loop of the containment
  * dedup family, where almost every blocked/candidate pair is a MISS at
  * production thresholds (t=900 ⇒ a mismatch budget of 10% of the
  * smaller set): the two-pointer merge stops the moment the remaining
  * overlap can no longer reach `ceil(t * min(|A|,|B|) / 1000)`, so a
  * dissimilar pair costs ~(1-t/1000) of its merge, not all of it.
  *
  * CONTRACT (threshold-filter use ONLY): for a pair whose exact
  * containment `(|A∩B| * 1000) div min(|A|,|B|)` is >= thresholdX1000,
  * returns exactly that value (the early exit provably cannot fire:
  * cnt + min(remaining_a, remaining_b) bounds the final count from
  * above, and the final count >= ceil(t*min/1000) keeps the bound at or
  * above the bar at every step); for a pair below the threshold it
  * returns SOME value < thresholdX1000 (-1 on early exit, the exact
  * value when the merge ran out naturally). Callers MUST apply
  * `>= thresholdX1000` — the below-threshold value is not the exact
  * containment. Null/empty semantics match the unfused form: null
  * inputs are null (BinaryExpression), an empty smaller side yields
  * null (the `div least(...)` form's division-by-zero result — callers
  * filter size > 0 upstream, so the branch is unreachable there). */
case class ContainmentX1000ThresholdExpr(left: Expression, right: Expression,
    thresholdX1000: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  // 0 is the degenerate keep-everything threshold (needed = 0, the
  // early exit never fires, every value is exact)
  require(thresholdX1000 >= 0 && thresholdX1000 <= 1000,
    s"containment threshold must be in [0, 1000], got $thresholdX1000")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "containment_x1000_threshold"

  @transient private lazy val longElements: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    val minSize = math.min(na, nb)
    if (minSize == 0) return null
    val needed = (thresholdX1000.toLong * minSize + 999L) / 1000L
    var i = 0; var j = 0; var cnt = 0L
    if (longElements) {
      while (i < na && j < nb) {
        if (cnt + math.min(na - i, nb - j) < needed)
          return java.lang.Long.valueOf(-1L)
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { cnt += 1; i += 1; j += 1 }
        else if (x < y) i += 1 else j += 1
      }
    } else {
      while (i < na && j < nb) {
        if (cnt + math.min(na - i, nb - j) < needed)
          return java.lang.Long.valueOf(-1L)
        val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (c == 0) { cnt += 1; i += 1; j += 1 }
        else if (c < 0) i += 1 else j += 1
      }
    }
    java.lang.Long.valueOf(cnt * 1000L / minSize)
  }

  // Generated twin of the interpreted loop: keeps a pushed-down pair
  // predicate inside janino-compiled code (a CodegenFallback would
  // force the ENTIRE join/filter condition into interpreted mode).
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val mn = ctx.freshName("mn")
      val need = ctx.freshName("need"); val rem = ctx.freshName("rem")
      val cmp = ctx.freshName("cmp"); val done = ctx.freshName("done")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val step = if (longElements)
        s"""long $x = $a.getLong($i); long $y = $b.getLong($j);
           |if ($x == $y) { $cnt++; $i++; $j++; }
           |else if ($x < $y) { $i++; } else { $j++; }""".stripMargin
      else
        s"""int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
           |if ($cmp == 0) { $cnt++; $i++; $j++; }
           |else if ($cmp < 0) { $i++; } else { $j++; }""".stripMargin
      s"""int $na = $a.numElements(); int $nb = $b.numElements();
         |int $mn = java.lang.Math.min($na, $nb);
         |if ($mn == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $need = (${thresholdX1000}L * $mn + 999L) / 1000L;
         |  int $i = 0; int $j = 0; long $cnt = 0L;
         |  boolean $done = false;
         |  while (!$done && $i < $na && $j < $nb) {
         |    int $rem = java.lang.Math.min($na - $i, $nb - $j);
         |    if ($cnt + $rem < $need) {
         |      ${ev.value} = -1L;
         |      $done = true;
         |    } else {
         |      $step
         |    }
         |  }
         |  if (!$done) {
         |    ${ev.value} = $cnt * 1000L / $mn;
         |  }
         |}""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** [[JaccardX1000Expr]] with the same THRESHOLD EARLY EXIT as
  * [[ContainmentX1000ThresholdExpr]]: jac_x1000 >= t is equivalent to
  * `|A∩B| >= ceil(t * (|A|+|B|) / (1000+t))` (clear denominators in
  * `1000*c >= t*(|A|+|B|-c)`), so the merge stops once the remaining
  * overlap cannot reach that bar. Same contract: exact value at or
  * above the threshold (the early exit provably cannot fire there),
  * SOME value < t below it (-1 on early exit) — callers MUST filter
  * `>= thresholdX1000`. Null semantics match [[JaccardX1000Expr]]:
  * null on null inputs and on an empty union. */
case class JaccardX1000ThresholdExpr(left: Expression, right: Expression,
    thresholdX1000: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  // 0 = degenerate keep-everything threshold (early exit never fires)
  require(thresholdX1000 >= 0 && thresholdX1000 <= 1000,
    s"jaccard threshold must be in [0, 1000], got $thresholdX1000")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "jaccard_x1000_threshold"

  @transient private lazy val longElements: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    val needed = (thresholdX1000.toLong * (na + nb) + 1000L + thresholdX1000 - 1L) /
      (1000L + thresholdX1000)
    var i = 0; var j = 0; var cnt = 0L
    if (longElements) {
      while (i < na && j < nb) {
        if (cnt + math.min(na - i, nb - j) < needed)
          return java.lang.Long.valueOf(-1L)
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { cnt += 1; i += 1; j += 1 }
        else if (x < y) i += 1 else j += 1
      }
    } else {
      while (i < na && j < nb) {
        if (cnt + math.min(na - i, nb - j) < needed)
          return java.lang.Long.valueOf(-1L)
        val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (c == 0) { cnt += 1; i += 1; j += 1 }
        else if (c < 0) i += 1 else j += 1
      }
    }
    val union = na.toLong + nb - cnt
    if (union == 0L) null
    else java.lang.Long.valueOf(math.floor(1000.0 * cnt / union).toLong)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val un = ctx.freshName("un")
      val need = ctx.freshName("need"); val rem = ctx.freshName("rem")
      val cmp = ctx.freshName("cmp"); val done = ctx.freshName("done")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val step = if (longElements)
        s"""long $x = $a.getLong($i); long $y = $b.getLong($j);
           |if ($x == $y) { $cnt++; $i++; $j++; }
           |else if ($x < $y) { $i++; } else { $j++; }""".stripMargin
      else
        s"""int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
           |if ($cmp == 0) { $cnt++; $i++; $j++; }
           |else if ($cmp < 0) { $i++; } else { $j++; }""".stripMargin
      s"""int $na = $a.numElements(); int $nb = $b.numElements();
         |long $need = (${thresholdX1000}L * ($na + (long) $nb)
         |  + ${1000L + thresholdX1000 - 1L}L) / ${1000L + thresholdX1000}L;
         |int $i = 0; int $j = 0; long $cnt = 0L;
         |boolean $done = false;
         |while (!$done && $i < $na && $j < $nb) {
         |  int $rem = java.lang.Math.min($na - $i, $nb - $j);
         |  if ($cnt + $rem < $need) {
         |    ${ev.value} = -1L;
         |    $done = true;
         |  } else {
         |    $step
         |  }
         |}
         |if (!$done) {
         |  long $un = $na + (long) $nb - $cnt;
         |  if ($un == 0L) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = (long) java.lang.Math.floor(1000.0 * $cnt / $un);
         |  }
         |}""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Hash every element of an array<string> with [[Hash64.hash64]] under a
  * fixed seed, returning the SORTED DISTINCT array<long> — the compact
  * pairwise-comparison form of a shingle set (primitive longs: the
  * pair-join hot loop does zero allocation). Cross-engine:
  * `list_sort(list_distinct(list_transform(sh, x -> hash64(seed, x))))`. */
case class HashedSetExpr(child: Expression, seed: String,
    hashKind: String = Hash64.KindMd5)
    extends UnaryExpression with CodegenFallback {
  Hash64.requireKind(hashKind)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_set"

  @transient private lazy val prefix = Hash64.seedPrefix(seed)
  private val useXx = hashKind == Hash64.KindXx
  // xx path: derive a stable long seed from the seed string (String
  // hashCode is specified by the JLS — identical on every JVM)
  private val xxSeed: Long = seed.hashCode.toLong

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = if (useXx) null else Hash64.newMd5()
    val vals = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val u = arr.getUTF8String(i)
        vals(m) =
          if (useXx) Hash64.xx64(u, xxSeed)
          else Hash64.hash64(md, prefix, u.getBytes)
        m += 1
      }
      i += 1
    }
    val slice = java.util.Arrays.copyOf(vals, m)
    java.util.Arrays.sort(slice)
    // dedup in place (sorted)
    var w = 0
    var k = 0
    while (k < m) {
      if (w == 0 || slice(k) != slice(w - 1)) { slice(w) = slice(k); w += 1 }
      k += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(slice, w))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Jaccard similarity x1000 (floored) of two SORTED DISTINCT arrays in
  * ONE pass: intersection by two-pointer merge, union by
  * inclusion-exclusion. Matches
  * `floor(1000.0 * |a ∩ b| / |a ∪ b|)` exactly. A single fused node also
  * means a pushed-down join predicate evaluates the merge once per pair
  * (the floor/div formula written from a separate intersect-count node
  * references the count twice and gets no CSE inside join conditions). */
case class JaccardX1000Expr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "jaccard_x1000"

  @transient private lazy val longElements: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var cnt = 0
    if (longElements) {
      while (i < na && j < nb) {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { cnt += 1; i += 1; j += 1 }
        else if (x < y) i += 1 else j += 1
      }
    } else {
      while (i < na && j < nb) {
        val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (c == 0) { cnt += 1; i += 1; j += 1 }
        else if (c < 0) i += 1 else j += 1
      }
    }
    val union = na + nb - cnt
    if (union == 0) null
    else java.lang.Long.valueOf(math.floor(1000.0 * cnt / union).toLong)
  }

  // Generated two-pointer merge: keeps a pushed-down pair predicate
  // inside janino-compiled code (a CodegenFallback here would force the
  // ENTIRE join condition into interpreted mode).
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val un = ctx.freshName("un")
      val cmp = ctx.freshName("cmp")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val loop = if (longElements)
        s"""long $x = $a.getLong($i); long $y = $b.getLong($j);
           |if ($x == $y) { $cnt++; $i++; $j++; }
           |else if ($x < $y) { $i++; } else { $j++; }""".stripMargin
      else
        s"""int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
           |if ($cmp == 0) { $cnt++; $i++; $j++; }
           |else if ($cmp < 0) { $i++; } else { $j++; }""".stripMargin
      s"""int $na = $a.numElements(); int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $cnt = 0;
         |while ($i < $na && $j < $nb) {
         |  $loop
         |}
         |int $un = $na + $nb - $cnt;
         |if ($un == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (long) java.lang.Math.floor(1000.0 * $cnt / $un);
         |}""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine similarity of two float-array columns, accumulated in double
  * with a single sequential pass — numerically identical to the
  * zip_with/aggregate HOF fold (same order of operations), ~20x faster. */
case class CosineSimExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Distinct word n-gram shingles of a text column: split on single
  * spaces (same token semantics as `split(text, " ")` / DuckDB
  * `string_split(text, ' ')`, including empty tokens between consecutive
  * spaces), join each n-run with a single space, keep first-occurrence
  * distinct order. One compiled pass; the HOF twin
  * (TextFunctions.shingles3) builds the same set via
  * transform/slice/concat_ws. */
case class ShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    // split on single space, preserving empty tokens (split-regex parity)
    val words = text.split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    val last = words.length - n
    val sb = new java.lang.StringBuilder(64)
    while (i <= last) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words(i + k))
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) {
      out(j) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Random-hyperplane LSH bucket of a float-vector column: `numBits` sign
  * bits, weight(b,d) = (hash64("hp","b,d") % 1000)/1000 - 0.5. Weights
  * are constants — materialized once per executor instance — so the
  * per-row cost is numBits*dims multiply-adds. The per-bit dot product is
  * rounded to 9 decimals (BigDecimal HALF_UP, identical to Spark's
  * `round` and DuckDB's `round` for these magnitudes) before the sign
  * test, keeping buckets engine-reproducible. */
case class HyperplaneBucketExpr(child: Expression, dims: Int, numBits: Int)
    extends UnaryExpression with CodegenFallback {
  require(dims > 0 && numBits > 0 && numBits < 63)
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bucket"

  @transient private lazy val weights: Array[Array[Double]] = {
    val md = Hash64.newMd5()
    Array.tabulate(numBits, dims) { (b, d) =>
      val h = Hash64.hash64(md, Hash64.seedPrefix("hp"),
        s"$b,$d".getBytes(StandardCharsets.UTF_8))
      (h % 1000L).toDouble / 1000.0 - 0.5
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    // contract parity with the HOF twin: under ANSI mode, getItem beyond
    // the vector length errors — a shorter-than-dims vector is invalid
    // input in both forms, not a silent partial dot
    if (v.numElements() < dims)
      throw new IllegalArgumentException(
        s"hyperplane_bucket: vector has ${v.numElements()} elements, expected >= $dims")
    val n = dims
    var bucket = 0L
    var b = 0
    while (b < numBits) {
      val w = weights(b)
      var dot = 0.0
      var d = 0
      while (d < n) { dot += v.getFloat(d).toDouble * w(d); d += 1 }
      val rounded = java.math.BigDecimal.valueOf(dot)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
      if (rounded > 0) bucket |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(bucket)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object HashColumns {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def minhashSignature(features: Column, numHashes: Int,
      hashKind: String = Hash64.KindMd5): Column =
    column(MinHashSignatureExpr(expression(features), numHashes, hashKind))
  def simhash32(features: Column, hashKind: String = Hash64.KindMd5): Column =
    column(SimHash32Expr(expression(features), hashKind))
  def hashMin(features: Column, seed: String): Column =
    column(HashMinExpr(expression(features), seed))
  def sortedIntersectCount(a: Column, b: Column): Column =
    column(SortedIntersectCountExpr(expression(a), expression(b)))
  def cosineSim(a: Column, b: Column): Column =
    column(CosineSimExpr(expression(a), expression(b)))
  def hashedSet(features: Column, seed: String,
      hashKind: String = Hash64.KindMd5): Column =
    column(HashedSetExpr(expression(features), seed, hashKind))
  def shingles(text: Column, n: Int): Column =
    column(ShinglesExpr(expression(text), n))
  def jaccardX1000(a: Column, b: Column): Column =
    column(JaccardX1000Expr(expression(a), expression(b)))
  /** Threshold-filter form — see [[ContainmentX1000ThresholdExpr]]'s
    * contract: exact at or above the threshold, unspecified-below-t
    * otherwise; callers MUST filter `>= thresholdX1000`. */
  def containmentX1000Threshold(a: Column, b: Column,
      thresholdX1000: Int): Column =
    column(ContainmentX1000ThresholdExpr(expression(a), expression(b),
      thresholdX1000))
  /** Threshold-filter form — see [[JaccardX1000ThresholdExpr]]. */
  def jaccardX1000Threshold(a: Column, b: Column,
      thresholdX1000: Int): Column =
    column(JaccardX1000ThresholdExpr(expression(a), expression(b),
      thresholdX1000))
  def hyperplaneBucket(vec: Column, dims: Int, numBits: Int): Column =
    column(HyperplaneBucketExpr(expression(vec), dims, numBits))
}
