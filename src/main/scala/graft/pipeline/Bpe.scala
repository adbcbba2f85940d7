package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding TOKENIZER TRAINING (Sennrich et al., "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016 —
  * the algorithm behind GPT/Llama-family subword vocabularies),
  * distributed the way BPE actually scales:
  *
  *  1. the corpus collapses ONCE to the word-frequency table (the only
  *     pass over the raw text — at 100 TB this is one shuffle on a
  *     vocabulary-sized key, after which training never touches the
  *     corpus again);
  *  2. each merge step counts adjacent symbol pairs over that table
  *     (distributed aggregate, frequencies as weights), picks the
  *     argmax with a total tie-break (count desc, pair asc), and
  *     rewrites every word's symbol sequence by the new merge.
  *
  * The symbol sequence rides as a DOUBLE-SPACE-joined string and a
  * merge applies as a literal `replace(' a  b ', ' ab ')` + re-join:
  * leftmost, non-overlapping, continue-after-replacement — exactly
  * BPE's greedy application order — and bit-identical in any engine
  * with standard string replace, which is what lets DuckDB replay
  * training merge-for-merge ([[graft.queries.PipelineQueries]] unrolls
  * the K iterations as chained CTEs).
  *
  * Driver coordination is one scalar argmax collect per merge — the
  * same loop discipline as [[IntKMeans]] (k iterations, scalar state);
  * the per-iteration `localCheckpoint` pins the plan depth so step K
  * does not replay steps 1..K-1. The returned merge table is the
  * trained artifact (inherently driver-small, like k-means centroids).
  */
object Bpe {

  /** Train `merges` BPE merge steps over the whitespace words of
    * `textCol`. Returns the merge table
    * (step, pa, pb, merged, cnt) — one row per learned merge, in
    * training order; stops early if no adjacent pair remains. */
  def train(docs: DataFrame, textCol: String, merges: Int): DataFrame = {
    require(merges > 0, s"merges must be positive, got $merges")
    val spark = docs.sparkSession
    // the ONE corpus pass: word -> corpus frequency, symbols = chars
    var state = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("freq"),
        concat(lit(" "),
          array_join(regexp_extract_all(col("word"), lit("."), lit(0)), "  "),
          lit(" ")).as("s"))
      .localCheckpoint(true)
    val learned = scala.collection.mutable.ArrayBuffer.empty[
      (Long, String, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= merges && !exhausted) {
      val toks = split(trim(col("s")), " +")
      val pairs = state
        .select(col("freq"),
          explode(zip_with(
            slice(toks, lit(1), size(toks) - 1),
            slice(toks, lit(2), size(toks) - 1),
            (a, b) => struct(a.as("pa"), b.as("pb")))).as("t"))
        .groupBy(col("t.pa").as("pa"), col("t.pb").as("pb"))
        .agg(sum("freq").as("cnt"))
      val top = pairs
        .orderBy(col("cnt").desc, col("pa"), col("pb"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (pa, pb, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        learned += ((step.toLong, pa, pb, pa + pb, cnt))
        // literal replace = BPE's leftmost non-overlapping greedy apply;
        // the re-join restores the canonical double-space encoding
        val prev = state
        state = state
          .withColumn("s", concat(lit(" "),
            array_join(split(trim(
              replace(col("s"), lit(s" $pa  $pb "), lit(s" $pa$pb "))),
              " +"), "  "), lit(" ")))
          .localCheckpoint(true)
        prev.unpersist() // only the newest checkpoint stays pinned
        step += 1
      }
    }
    // the merge table is driver-local and independent of state: release
    // the final checkpoint too (repeated train() calls must not
    // accumulate one cached RDD each)
    state.unpersist()
    import spark.implicits._
    learned.toSeq.toDF("step", "pa", "pb", "merged", "cnt")
  }

  /** ENCODE with a learned merge table: apply the merges to every word
    * in training order (BPE inference). Encoding is an embarrassingly
    * parallel projection — no joins, no shuffles until the caller
    * aggregates — and the merge list rides as DATA inside ONE native
    * expression ([[graft.functions.BpeApplier]]), so plan size and
    * analyzer cost are O(1) in K: a realistic 32k-merge vocabulary
    * compiles exactly like a 4-merge toy one. Returns
    * (doc_id, n_subwords, token_digest) where token_digest certifies
    * the exact subword sequence, not just its length. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    // vocabulary-scale merge tables ride as an explicit BROADCAST, not
    // a plan literal: a literal deserializes once per TASK (32
    // concurrent tasks × ~45 MiB at K=32k blew an 8 GiB heap), a
    // broadcast once per EXECUTOR. Small tables stay literals — no
    // broadcast-cleanup traffic for the common trained-tokenizer case.
    val sub =
      if (merges.size <= 1024)
        graft.functions.BpeColumns.bpeEncodeWord(col("word"), merges)
      else {
        val bc = docs.sparkSession.sparkContext
          .broadcast(new graft.functions.BpeApplier(merges))
        graft.functions.BpeColumns.bpeEncodeWordBcast(col("word"), bc)
      }
    finishEncode(docs, idCol, textCol, sub)
  }

  /** The literal-replace fold twin of [[encode]]: the K merges compile
    * as K nested `replace` calls over the double-space encoding — the
    * exact shape the DuckDB oracle replays as chained CTEs, kept for
    * cross-validation (BpeEncodeSpec proves fold == native expression;
    * the oracle proves fold == DuckDB). NOT the production path: plan
    * depth grows with K, so a vocabulary-scale merge list breaks
    * analyzer/codegen limits long before 32k merges. */
  private[graft] def encodeUnfused(docs: DataFrame, idCol: String,
      textCol: String, merges: Seq[(String, String)]): DataFrame = {
    val wordSym = concat(lit(" "),
      array_join(regexp_extract_all(col("word"), lit("."), lit(0)), "  "),
      lit(" "))
    val applied = merges.foldLeft(wordSym) { case (e, (pa, pb)) =>
      concat(lit(" "),
        array_join(split(trim(
          replace(e, lit(s" $pa  $pb "), lit(s" $pa$pb "))), " +"), "  "),
        lit(" "))
    }
    finishEncode(docs, idCol, textCol,
      array_join(split(trim(applied), " +"), " "))
  }

  /** The literal-replace fold as PLAIN SCALA over one word — a third,
    * deliberately independent implementation of the merge semantics
    * (shares no code with [[graft.functions.BpeApplier]]'s rank-heap
    * and no plan machinery with [[encodeUnfused]]'s expression tree):
    * canonical double-space encoding, one `String.replace` per merge in
    * training order, renormalize after a fire. Used by
    * [[encodeCompare]] to certify the production encode IN-GATE at
    * vocabulary sizes the plan-literal fold cannot compile
    * (`pats(i)`/`reps(i)` are the precomputed `" pa  pb "`/`" papb "`
    * literals). Cost is O(K · |word|) — affordable because callers run
    * it once per DISTINCT word, never per word instance. */
  private[graft] def foldEncodeWord(word: String,
      pats: Array[String], reps: Array[String]): String = {
    // code-point symbols — the fold's regexp_extract_all(word, '.')
    val syms = new Array[String](word.codePointCount(0, word.length))
    var ci = 0; var si = 0
    while (ci < word.length) {
      val cp = word.codePointAt(ci)
      syms(si) = new String(Character.toChars(cp))
      si += 1; ci += Character.charCount(cp)
    }
    var s = syms.mkString(" ", "  ", " ")
    var i = 0
    while (i < pats.length) {
      val t = s.replace(pats(i), reps(i))
      // renormalize to canonical double-space form (the fold's
      // split/trim/rejoin step) — identity unless the replace fired
      if (t != s) s = t.trim.split(" +").mkString(" ", "  ", " ")
      i += 1
    }
    s.trim.split(" +").mkString(" ")
  }

  /** GATE-CERTIFIABLE exactness comparison for the production encode
    * at ANY vocabulary size: run [[encode]] (the native rank-heap
    * expression — the timed production path) AND an independent
    * [[foldEncodeWord]] twin in the SAME plan, and emit per-doc
    * equality booleans `(doc_id, digest_eq, ntok_eq)`. The oracle for
    * this shape is trivially DuckDB-expressible (`SELECT doc_id, TRUE,
    * TRUE …`) — no engine has to replay K merges — so a rows+schema+
    * hash match certifies in-gate that the fused path is exact at
    * production vocabulary scale.
    *
    * Scale shape: the fold twin runs once per DISTINCT word (cost ∝
    * vocabulary × K, never corpus × K) and joins back to word
    * instances; at this fixture's vocabulary the mapping side is
    * broadcast. At open-web scale the distinct-word table is
    * Heap's-law-sized (can exceed broadcast limits) — drop the hint
    * and let AQE pick the join, the comparison stays one shuffle. */
  def encodeCompare(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    val fused = encode(docs, idCol, textCol, merges)
    val pats = merges.map { case (a, b) => s" $a  $b " }.toArray
    val reps = merges.map { case (a, b) => s" $a$b " }.toArray
    // explicit broadcast variable (not a closure capture): a 32k-merge
    // table is tens of MiB — ship it to each executor once, not inside
    // every task binary
    val bc = spark.sparkContext.broadcast((pats, reps))
    val foldUdf = udf((w: String) => {
      val (p, r) = bc.value; foldEncodeWord(w, p, r)
    })
    val words = docs.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), " ")).as(Seq("wpos", "word")))
    val subs = words.select("word").distinct()
      .withColumn("sub", foldUdf(col("word")))
    val twin = words.join(broadcast(subs), Seq("word"))
      .groupBy("doc_id")
      .agg(
        sum(size(split(col("sub"), " "))).cast("long").as("fold_n"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("wpos"), col("sub")))),
            s => s.getField("sub")),
          " ")).as("fold_digest"))
    fused.join(twin, Seq("doc_id"))
      .select(col("doc_id"),
        (col("token_digest") === col("fold_digest")).as("digest_eq"),
        (col("n_subwords") === col("fold_n")).as("ntok_eq"))
  }

  /** Shared explode -> per-word encode -> per-doc digest skeleton. An
    * empty `sub` (empty word between consecutive spaces) contributes
    * one subword, matching `size(split('', ' ')) == 1` in both twins
    * and the oracle. */
  private def finishEncode(docs: DataFrame, idCol: String, textCol: String,
      subExpr: org.apache.spark.sql.Column): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("wpos", "word")))
      .select(col("doc_id"), col("wpos"), subExpr.as("sub"))
      .groupBy("doc_id")
      .agg(
        sum(size(split(col("sub"), " "))).cast("long").as("n_subwords"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("wpos"), col("sub")))),
            s => s.getField("sub")),
          " ")).as("token_digest"))
}
