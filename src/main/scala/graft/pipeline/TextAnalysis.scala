package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextFunctions._

/** Text-analysis operators: token counting, quality scoring, language ID,
  * document fingerprinting. All narrow (per-row) transforms — no shuffle,
  * fully parallel at any scale; outputs are integers/strings/booleans so
  * oracle hash-compares are float-free.
  */
object TextAnalysis {

  /** Marker stopwords per language for the n-gram/stopword-hit language
    * heuristic. Tie-break = declaration order. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "fr" -> Seq("le", "les", "de", "et", "est"),
    "zh" -> Seq("de5", "shi4", "le5") // romanized markers
  )

  private def hitCount(w: Column, markers: Seq[String]): Column =
    size(filter(w, x => x.isin(markers.map(lit(_)): _*))).cast("long")

  /** Token counts: whitespace tokens, alphanumeric regex tokens, distinct
    * tokens. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = words(col(textCol))
    docs.select(
      col(idCol).as("doc_id"),
      size(w).cast("long").as("n_ws_tokens"),
      size(expr(s"regexp_extract_all($textCol, '[a-z0-9]+', 0)")).cast("long")
        .as("n_alpha_tokens"),
      size(array_distinct(w)).cast("long").as("n_distinct_tokens"))
  }

  /** The quality-gate predicate as a single narrow Column — usable as a
    * row filter with no join/shuffle (the SQL twin is
    * graft.queries.QuerySql.qualityPredicate). */
  def qualityOk(text: Column): Column = {
    val w = words(text)
    length(text) >= 100 &&
      floor(lit(1000.0) * size(array_distinct(w)) / size(w)) >= 300
  }

  /** Quality metrics: actual char length, word count, distinct ratio
    * (x1000), stopword hits, and a simple accept flag. */
  def quality(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = words(col(textCol))
    val nWords = size(w).cast("long")
    val nDistinct = size(array_distinct(w)).cast("long")
    val stopHits = hitCount(w, langMarkers.flatMap(_._2))
    val distinctRatio = floor(lit(1000.0) * nDistinct / nWords).cast("long")
    docs.select(
      col(idCol).as("doc_id"),
      length(col(textCol)).cast("long").as("n_chars"),
      nWords.as("n_words"),
      nDistinct.as("n_distinct"),
      distinctRatio.as("distinct_ratio_x1000"),
      stopHits.as("stopword_hits"),
      (length(col(textCol)) >= 100 && distinctRatio >= 300).as("quality_ok"))
  }

  /** The Gopher paper's stop-word presence set (Rae et al. 2021,
    * appendix A1.1 quality filters). */
  val gopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** GOPHER-style quality RULE SET (Rae et al. 2021, A1.1 — the word-level
    * subset that applies to single-line documents): per-doc integer
    * evidence plus one boolean per rule plus the conjunction, so a
    * curation pipeline can both filter and AUDIT which rule fired.
    * Rules, evaluated all-integer (no ratio ever materializes):
    *  - word count in [50, 100000];
    *  - mean word length in [3, 10]  ⇔  3n ≤ Σlen ≤ 10n;
    *  - ≥ 80% of words contain an alphabetic char  ⇔  10·alpha ≥ 8n;
    *  - ≤ 10% of words carry a '#' or '…' symbol  ⇔  10·sym ≤ n;
    *  - ≥ `minStops` distinct Gopher stop words present (paper default
    *    2; a corpus with a restricted function-word vocabulary can
    *    lower it — the evidence column always carries the raw count).
    * One narrow codegen'd pass, zero shuffle, no UDF. */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String,
      minStops: Int = 2): DataFrame = {
    val w = words(col(textCol))
    val n = size(w).cast("long")
    val sumLen = aggregate(
      transform(w, x => length(x).cast("long")), lit(0L), _ + _)
    val alpha = size(filter(w, x => x.rlike("[A-Za-z]"))).cast("long")
    val sym = size(filter(w,
      x => x.contains("#") || x.contains("..."))).cast("long")
    val stopDistinct = size(array_intersect(
      array_distinct(w), array(gopherStops.map(lit): _*))).cast("long")
    val okWc = n >= 50 && n <= 100000L
    val okLen = sumLen >= lit(3L) * n && sumLen <= lit(10L) * n
    val okAlpha = lit(10L) * alpha >= lit(8L) * n
    val okSym = lit(10L) * sym <= n
    val okStop = stopDistinct >= minStops
    docs.select(
      col(idCol).as("doc_id"),
      n.as("n_words"),
      sumLen.as("sum_word_len"),
      alpha.as("alpha_words"),
      sym.as("sym_words"),
      stopDistinct.as("stop_distinct"),
      okWc.as("ok_wordcount"),
      okLen.as("ok_meanlen"),
      okAlpha.as("ok_alpha"),
      okSym.as("ok_symbol"),
      okStop.as("ok_stopwords"),
      (okWc && okLen && okAlpha && okSym && okStop).as("keep_doc"))
  }

  /** Language ID by stopword scoring; deterministic tie-break by
    * [[langMarkers]] order. */
  def languageId(docs: DataFrame, idCol: String, textCol: String,
      claimedCol: String): DataFrame = {
    val w = words(col(textCol))
    val scores = langMarkers.map { case (l, ms) => l -> hitCount(w, ms) }
    // argmax with declaration-order tie-break: first language whose score
    // is >= all others wins
    val pred = scores.foldLeft(Option.empty[Column]) {
      case (acc, (l, s)) =>
        val isMax = scores.map(_._2).map(o => s >= o).reduce(_ && _)
        acc match {
          case None    => Some(when(isMax, lit(l)))
          case Some(c) => Some(c.when(isMax, lit(l)))
        }
    }.get.otherwise(lit("und"))
    docs.select(
      col(idCol).as("doc_id"),
      col(claimedCol).as("claimed_lang"),
      pred.as("predicted_lang"))
      .withColumn("agree", col("claimed_lang") === col("predicted_lang"))
  }

  /** Document fingerprint: distinct 3-shingle count + min shingle hash
    * (rolling-hash winnowing floor). */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sh = shingles3(col(textCol))
    docs.select(
      col(idCol).as("doc_id"),
      size(sh).cast("long").as("n_shingles"),
      graft.functions.HashColumns.hashMin(sh, "fp").as("fp_min"))
  }

  /** Corpus-frequency quality signal: per document, the sum of GLOBAL
    * occurrence counts of its tokens and the number of rare tokens
    * (global count below `rareBelow`) — the rare-token-density filter
    * used to drop gibberish/OCR noise from training corpora. Two stages:
    * one shuffle builds the (small) vocabulary count table; the lookup
    * join is left UNHINTED so the planner broadcasts it while it fits
    * the threshold and falls back to a shuffle join when a noisy corpus
    * inflates the vocabulary (an explicit broadcast hint would force the
    * broadcast regardless and OOM instead of degrading). Integer
    * outputs only. */
  def frequencyScore(docs: DataFrame, idCol: String, textCol: String,
      rareBelow: Long = 3L): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("gfreq"))
    toks.join(vocab, "tok")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("gfreq")).as("freq_sum"),
        sum(when(col("gfreq") < rareBelow, 1L).otherwise(0L)).as("n_rare"))
  }

  /** Per-document top-k terms by an integer-exact TF-IDF: score =
    * tf(term, doc) * (N * 1000 div df(term)), where df is the number of
    * documents containing the term — Sparck Jones' inverse document
    * frequency with the log replaced by scaled integer division, so the
    * ranking is bit-reproducible across engines (no floating-point ln to
    * disagree in the last ulp). Tie-break: score desc, then term asc.
    *
    * 100 TB shape: tokens collapse to (doc, term, tf) with map-side
    * partial aggregation (one shuffle); df is one more aggregate over
    * those pairs into a vocabulary-sized table whose join stays
    * UNHINTED — the planner broadcasts it while it fits and degrades to
    * a shuffle join on a noisy vocabulary (same policy as
    * [[frequencyScore]]); the top-k window partitions by doc_id, which
    * is uniform by construction. N rides in as a literal computed by a
    * metadata-served count. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"k must be positive, got $k")
    val n = docs.count()
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term"))
    tf.join(df, "term")
      .withColumn("score", col("tf") * expr(s"(${n}L * 1000) div df"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("doc_id", "rnk", "term", "tf", "score")
  }

  /** BM25 document ranking (Robertson/Sparck Jones probabilistic
    * relevance, the Okapi BM25 form) for a FIXED query term set, with
    * every factor restated over integers so the ranking is
    * bit-reproducible across engines:
    *
    *  - idf(t) ~ (N - df + 0.5)/(df + 0.5), scaled:
    *    `idf_x1000 = ((2N - 2df + 1) * 1000) div (2df + 1)`. Dropping
    *    the log preserves the PER-TERM idf ordering (the log is
    *    monotone), but BM25 SUMS idf*tfnorm over the query terms, so
    *    the scaled ratio re-weights terms relative to each other and
    *    multi-term rankings can diverge from true Okapi BM25 — a
    *    deliberate rank-affecting approximation that keeps rare-term
    *    dominance while staying integer-exact (engine and oracle share
    *    the formula, so the certification is unaffected);
    *  - tf normalization with k1 = 1.2, b = 0.75: multiplying numerator
    *    and denominator by 10T (T = total corpus tokens, avgdl = T/N)
    *    gives `(22000 * tf * T) div (10*T*tf + 3*T + 9*dl*N)` (x1000
    *    scaled — 3 decimal digits of the [0, 2.2] factor) — exact
    *    integer arithmetic, no floating point anywhere.
    *
    * 100 TB shape: the narrow term filter cuts the explode to query
    * terms BEFORE the (doc, term) aggregate; N and T come from ONE
    * scalar aggregate pass; the per-doc sum is one uniform shuffle and
    * the top-k is TakeOrdered (no global sort). Integer headroom: the
    * tf-normalization numerator `22000 * tf * T` must stay under 2^63
    * (tf * T < ~4e14 — a per-doc term count times total corpus tokens)
    * and `idf_x1000 * 2200` bounds scores to ~1.5e6 * N (N < ~10^12
    * docs); beyond that, shard the corpus or drop the x1000 scales. */
  def bm25Rank(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int = 20): DataFrame = {
    require(queryTerms.nonEmpty, "bm25Rank needs at least one query term")
    require(k > 0, s"k must be positive, got $k")
    val base = docs.select(col(idCol).as("doc_id"),
      split(col(textCol), " ").as("toks"))
    val scalars = base.agg(count(lit(1)).as("n"),
      sum(size(col("toks")).cast("long")).as("t")).head()
    val (n, totalToks) = (scalars.getLong(0), scalars.getLong(1))
    val toks = base.select(col("doc_id"),
      size(col("toks")).cast("long").as("dl"),
      explode(col("toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
    // materialized once: the (doc, query-term) frame — tiny, bounded by
    // matching docs × |queryTerms| — feeds BOTH the df aggregate and
    // the scoring join; without it each consumer re-explodes the corpus
    val tf = toks.groupBy("doc_id", "term")
      .agg(first(col("dl")).as("dl"), count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "term")
      .withColumn("idf_x1000",
        expr(s"((2 * ${n}L - 2 * df + 1) * 1000) div (2 * df + 1)"))
      // the tf factor carries its own x1000 scale so dividing it first
      // keeps 3 decimal digits (dividing unscaled would truncate to
      // 0..2 and flatten the ranking) while keeping the numerator's
      // overflow bound independent of idf — see headroom note above
      .withColumn("term_score",
        col("idf_x1000") *
          expr(s"(22000 * tf * ${totalToks}L) div " +
            s"(10 * ${totalToks}L * tf + 3 * ${totalToks}L + 9 * dl * ${n}L)"))
      .groupBy("doc_id")
      .agg(sum(col("term_score")).as("bm25_x1e6"))
      .orderBy(col("bm25_x1e6").desc, col("doc_id"))
      .limit(k)
  }

  /** 2-gram repetition signal (the Gopher-rule family of repetition
    * filters — Rae et al., "Scaling Language Models: ... Gopher", 2021,
    * §A1.1 uses duplicate n-gram fractions to drop degenerate text):
    * duplicated-2-gram ratio x1000 = (total - distinct) * 1000 / total.
    * Narrow per-row transform, zero shuffle; the distinct set comes from
    * the compiled shingle expression. */
  def repetition(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val total = (size(split(col(textCol), " ")) - 1).cast("long")
    val distinct2 = size(graft.functions.HashColumns.shingles(col(textCol), 2))
      .cast("long")
    docs.select(
      col(idCol).as("doc_id"),
      total.as("n_2grams"),
      distinct2.as("n_distinct_2grams"),
      // single-token/empty docs have zero 2-grams: ratio defined as 0
      // (the SQL twin guards the same way — an unguarded 0/0 is NULL in
      // Spark but a NaN-cast error in DuckDB)
      when(total > 0,
        floor(lit(1000L) * (total - distinct2) / total).cast("long"))
        .otherwise(0L)
        .as("dup_2gram_x1000"))
  }

  /** Bigram language-model FLUENCY score — the CCNet/KenLM-shaped
    * perplexity gate (Wenzek et al., "CCNet: Extracting High Quality
    * Monolingual Datasets from Web Crawl Data", LREC 2020 filters web
    * text by LM perplexity; the Pile and RefinedWeb run the same gate),
    * integer-exact so both engines replay it bit-for-bit: per bigram
    * instance the MLE probability scales to
    * `(c(w1,w2) * 1e6) div c(w1·))` (c(w1·) = tokens with a successor —
    * the bigram-denominator convention), a document's fluency is the
    * floor-mean over its bigram instances, and documents with fewer
    * than two tokens score 0 by definition. High = predictable,
    * in-distribution text; low = gibberish/OCR noise — the
    * model-based sibling of [[frequencyScore]]'s rare-token filter.
    *
    * 100 TB shape: one explode to bigram instances, two map-side-
    * partial aggregates onto vocabulary-bounded keys, and two UNHINTED
    * lookup joins (the planner broadcasts the count tables while they
    * fit and degrades to shuffle joins on a noisy vocabulary — the
    * [[frequencyScore]]/[[tfidfTopTerms]] policy), then the per-doc
    * sum. Self-trained on the scored corpus, so every observed bigram
    * has count >= 1 — no smoothing constant to tune. */
  def lmFluency(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = split(col(textCol), " ")
    val bi = docs
      .select(col(idCol).as("doc_id"),
        explode(zip_with(
          slice(ws, lit(1), size(ws) - 1),
          slice(ws, lit(2), size(ws) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("t"))
      .select(col("doc_id"), col("t.w1").as("w1"), col("t.w2").as("w2"))
    // materialized once (the collocations discipline): the count table
    // feeds the context-margin aggregate AND the scoring join — without
    // it each consumer re-explodes and re-aggregates the whole corpus.
    // Vocabulary-bounded (distinct bigrams), orders of magnitude below
    // the corpus it summarizes.
    val c12 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .localCheckpoint(true)
    // context counts DERIVE from the bigram table (c(w1·) = Σ_w2
    // c(w1,w2)) — a vocabulary-bounded aggregate, not a third pass
    // over the exploded corpus
    val c1 = c12.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val scored = bi.join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(expr("(c12 * 1000000) div c1")).as("s"))
    docs.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(expr("s div n_bigrams"), lit(0L)).as("fluency_x1e6"))
  }

  /** PMI collocation extraction — corpus-level multi-word-expression
    * mining (Church & Hanks 1990, "Word Association Norms, Mutual
    * Information, and Lexicography"; the classic phrase-detection pass
    * tokenizer pipelines run before merging "new york"-style units).
    * Pointwise mutual information of an adjacent bigram is
    * log(P(w1,w2) / (P(w1)P(w2))); both engines rank by the integer
    * fixed-point LIFT `(c12 * N * 1e6) div (c1 * c2)` instead — the
    * same monotone order with the log dropped, replayable bit-for-bit.
    * Margins derive from the bigram table itself (c1 = Σ_w2 c12,
    * c2 = Σ_w1 c12), so P(·) is over bigram events throughout. Bigrams
    * below `minCount` are noise-gated (a hapax pair trivially maxes
    * PMI), and the survivors rank on the total order
    * (lift desc, w1, w2) — deterministic top-k.
    *
    * 100 TB shape: one explode to bigram instances, then everything is
    * vocabulary-bounded — three map-side-partial aggregates (pair +
    * two margins), margin joins on bigram-TYPE keys (never the corpus),
    * a broadcast one-row total, and a TakeOrdered top-k (no global
    * sort materializes). The ×1e6 numerator `c12 * N` caps at N², so
    * the Long envelope holds through N ≈ 3e6 bigrams per 1e6 scale —
    * at web scale drop the scale factor or widen to DECIMAL(38,0). */
  def collocations(docs: DataFrame, textCol: String,
      minCount: Long = 5L, topK: Int = 20): DataFrame = {
    val ws = split(col(textCol), " ")
    val bi = docs
      .select(explode(zip_with(
        slice(ws, lit(1), size(ws) - 1),
        slice(ws, lit(2), size(ws) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("t"))
      .select(col("t.w1").as("w1"), col("t.w2").as("w2"))
    // cache: margins, the total, and the final join all consume the
    // bigram-TYPE table — without materialization each consumer would
    // re-explode and re-aggregate the whole corpus (4 passes instead
    // of 1). The cached frame is vocabulary-bounded (distinct pairs),
    // orders of magnitude below the corpus it summarizes.
    val c12 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("n12")).cache()
    val left = c12.groupBy("w1").agg(sum(col("n12")).as("n1"))
    val right = c12.groupBy("w2").agg(sum(col("n12")).as("n2"))
    val total = c12.agg(sum(col("n12")).as("nb"))
    val out = c12.join(left, Seq("w1")).join(right, Seq("w2"))
      .crossJoin(broadcast(total))
      .where(col("n12") >= minCount)
      .select(col("w1"), col("w2"), col("n12"),
        expr("(n12 * nb * 1000000) div (n1 * n2)").as("pmi_x1e6"))
      .orderBy(col("pmi_x1e6").desc, col("w1"), col("w2"))
      .limit(topK)
    // materialize the top-k and RELEASE the cached bigram table —
    // repeated calls must not accumulate dead cached blocks
    val materialized = out.localCheckpoint(true)
    c12.unpersist()
    materialized
  }

  /** One-row corpus DATASET CARD — the summary statistics every corpus
    * release publishes (docs, tokens, language/source coverage, exact
    * duplication rate, length envelope) computed in ONE aggregate pass.
    * Exact-duplicate counting goes through `md5(text)` so the distinct
    * shuffle moves 32-byte digests, never document bodies — the only
    * scale-relevant choice in an otherwise partial-aggregable query;
    * all outputs are integers (floor-mean), replayed exactly. */
  def corpusStats(docs: DataFrame, textCol: String, langCol: String,
      sourceCol: String, charsCol: String): DataFrame =
    docs
      .select(col(textCol).as("t"), col(langCol).as("lg"),
        col(sourceCol).as("src"), col(charsCol).as("nc"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col("t"), " ")).cast("long")).as("n_tokens"),
        countDistinct(col("lg")).as("n_langs"),
        countDistinct(col("src")).as("n_sources"),
        (count(lit(1)) - countDistinct(md5(col("t")))).as("n_exact_dups"),
        min(col("nc")).cast("long").as("min_chars"),
        max(col("nc")).cast("long").as("max_chars"))
      .select(col("n_docs"), col("n_tokens"), col("n_langs"),
        col("n_sources"), col("n_exact_dups"),
        expr("n_tokens div n_docs").as("mean_tokens"),
        col("min_chars"), col("max_chars"))

  /** Hashed-linear-model quality gate — the CLASSIFIER-based filtering
    * shape (fastText quality classifiers gate LLaMA's CommonCrawl;
    * FineWeb-Edu and DCLM gate on model scores): score(doc) = Σ_tok
    * w[h(tok) mod dims] over a broadcast weight vector, keep = score
    * >= 0. The hashing-trick featurization and the broadcast-weights
    * lookup ARE the operator; the weights here are a deterministic
    * stand-in derived from the oracle-replayable hash (w[i] =
    * (hash64("w", i) mod 2001) - 1000) — swap in trained fastText/
    * logistic weights without changing the plan. At a real model's
    * dimensionality (2M buckets) the literal array becomes an actual
    * broadcast join on the bucket id; at gate-sized dims the weight
    * vector rides in the plan and scoring is one narrow projection +
    * one per-doc aggregate — no vocabulary table, no training-corpus
    * join, which is what makes classifier gates the cheapest
    * model-based filter at 100 TB. */
  def modelScore(docs: DataFrame, idCol: String, textCol: String,
      dims: Int = 1024): DataFrame = {
    val md = graft.functions.Hash64.newMd5()
    val wPrefix = graft.functions.Hash64.seedPrefix("w")
    val weights: Array[Long] = Array.tabulate(dims) { i =>
      (graft.functions.Hash64.hash64(md, wPrefix,
        i.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        % 2001L) - 1000L
    }
    val bucket = pmod(hash64(lit("t"), col("tok")), lit(dims.toLong))
    docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("tok"))
      .select(col("doc_id"),
        element_at(lit(weights), (bucket + 1L).cast("int")).as("w"))
      .groupBy("doc_id")
      .agg(sum(col("w")).as("score"), count(lit(1)).as("n_tokens"))
      .select(col("doc_id"), col("score"), col("n_tokens"),
        (col("score") >= 0L).as("keep"))
  }

  /** Benchmark decontamination — the n-gram-overlap check every serious
    * training corpus runs before release (GPT-3 appendix C / The Pile
    * use 13-gram collision against eval sets; n is a parameter here):
    * a training document is contaminated if it shares any distinct
    * word n-gram with the benchmark set. Returns (doc_id, n_hits) for
    * contaminated docs only.
    *
    * Scale: the benchmark side is DISTINCT n-grams of the (small) eval
    * corpus — broadcast to every executor, so the 100 TB training side
    * is scanned once with a map-side semi-join; the only shuffle is the
    * final per-doc count with map-side partial aggregation. For an
    * adversarially huge benchmark set, drop the broadcast hint and let
    * AQE choose (the join degrades to shuffled, same semantics). */
  def contamination(
      docs: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5
  ): DataFrame = {
    val grams = graft.functions.HashColumns.shingles(col(textCol), n)
    val benchGrams = benchmark
      .select(explode(grams).as("g")).distinct()
    docs
      .select(col(idCol).as("doc_id"), explode(grams).as("g"))
      .join(broadcast(benchGrams), "g")
      .groupBy("doc_id")
      // per-doc shingles are already distinct -> count = distinct
      // contaminated n-grams
      .agg(count(lit(1)).as("n_hits"))
  }

  /** [[contamination]] with a Bloom-filter prefilter on the training
    * side — the shape a 100 TB decontamination run actually takes when
    * the benchmark n-gram set is too large to broadcast as an exact
    * hashmap: the join degrades to a shuffle, and without a prefilter
    * the FULL exploded training corpus (tens of n-grams per document)
    * crosses the wire to match a set that rejects almost all of it.
    *
    * Here the benchmark grams build a fixed-size [[graft.functions.Bloom]]
    * sketch (megabytes for millions of grams) probed map-side inside
    * whole-stage codegen, so only candidate grams — true hits plus the
    * configured false-positive trickle — reach the shuffle. The exact
    * join that follows removes the false positives, making the result
    * byte-identical to [[contamination]]: the SAME DuckDB oracle
    * certifies this path. The join is left unhinted deliberately — AQE
    * broadcasts the benchmark side while it fits and falls back to a
    * (bloom-thinned) shuffle join when it doesn't. */
  def contaminationBloom(
      docs: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      expectedGrams: Long = 1000000L,
      fpp: Double = 0.01
  ): DataFrame = {
    val grams = graft.functions.HashColumns.shingles(col(textCol), n)
    val benchGrams = benchmark.select(explode(grams).as("g")).distinct()
    val bloom = graft.functions.Bloom.build(benchGrams, "g", expectedGrams, fpp)
    docs
      .select(col(idCol).as("doc_id"), explode(grams).as("g"))
      .filter(graft.functions.Bloom.mightContain(col("g"), bloom))
      .join(benchGrams, "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"))
  }

  /** PII scrubbing: redact email addresses and long digit runs (phone /
    * account-number shaped) — the standard pre-training privacy pass.
    * Returns per doc the redaction counts and the scrubbed text's md5,
    * so a cross-engine hash-match certifies byte-exact redaction.
    * Patterns are RE2-compatible (run identically under Java regex and
    * DuckDB). Narrow per-row transform, zero shuffle; the scrubbed text
    * itself never leaves the row. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val LongDigitsPattern = "[0-9]{7,}"
  def piiScrub(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val scrubbed = regexp_replace(
      regexp_replace(t, EmailPattern, "<EMAIL>"),
      LongDigitsPattern, "<NUM>")
    docs.select(
      col(idCol).as("doc_id"),
      size(regexp_extract_all(t, lit(EmailPattern), lit(0))).cast("long")
        .as("n_emails"),
      size(regexp_extract_all(regexp_replace(t, EmailPattern, "<EMAIL>"),
        lit(LongDigitsPattern), lit(0))).cast("long").as("n_digit_runs"),
      md5(scrubbed).as("scrubbed_digest"))
  }

  /** DSIR-style IMPORTANCE SCORING (Xie et al., "Data Selection with
    * Importance Resampling", NeurIPS 2023 — the hashed-n-gram
    * importance-weighting recipe behind targeted pre-training mixes):
    * fit two hashed unigram bag-of-words models from ONE corpus pass —
    * a TARGET model over the rows `isTarget` selects (the
    * high-quality/domain exemplar set) and a RAW model over everything
    * — then weight every document by how much more likely its tokens
    * are under target than raw.
    *
    * Integer-exact variant: DSIR's per-token log-ratio is replaced by
    * the Laplace-smoothed probability RATIO in x1e6 fixed point
    * (`ratio_x1e6(b) = (pTgt_x1e9 * 1e6) div pRaw_x1e9`, with
    * `p*_x1e9 = ((cnt+1) * 1e9) div (total + buckets)`), and the doc
    * score is the MEAN per-token ratio — order-preserving per token and
    * bit-replayable by any engine (a float `ln` is not; the repo's
    * fluency/TF-IDF scores use the same substitution). The x1e9
    * intermediate holds to ~9e9 tokens per bucket (≈ 2e12 tokens at
    * the default 256 buckets — ~10 TB of text; shift the scales or
    * widen to decimal beyond that).
    *
    * Scale shape: one exploded-token pass builds both models map-side
    * (the target flag is an aggregate filter, not a second scan); the
    * model is `buckets` rows — broadcast to the scoring join, so the
    * 100 TB side is scanned once with no shuffle before the per-doc
    * aggregate; `selected` is a fixed-threshold predicate (score ≥
    * parity with the raw model), never a global rank pass.
    *
    * @return (doc_id, n_tokens, importance_x1e6, selected) */
  def importanceScore(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 256): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val toks = docs
      .select(col(idCol).as("doc_id"), isTarget.as("_tgt"),
        explode(words(col(textCol))).as("tok"))
      .select(col("doc_id"), col("_tgt"),
        pmod(hash64(lit("ds"), col("tok")), lit(buckets.toLong)).as("b"))
    // materialized once: the buckets-sized model feeds BOTH the totals
    // aggregate and the ratio projection — without it each consumer
    // re-explodes and re-aggregates the whole corpus
    val model = toks
      .groupBy("b")
      .agg(count(lit(1)).as("cRaw"),
        sum(when(col("_tgt"), 1L).otherwise(0L)).as("cTgt"))
      .localCheckpoint(true)
    // bucket totals ride the same buckets-sized frame (a 1-row
    // cross-joinable aggregate of it), never a second corpus pass
    val totals = model.agg(sum("cRaw").as("tRaw"), sum("cTgt").as("tTgt"))
    val ratios = model.crossJoin(broadcast(totals))
      .select(col("b"),
        (expr(s"((cTgt + 1) * 1000000000) div (tTgt + $buckets)") * 1000000L)
          .as("pt"),
        expr(s"((cRaw + 1) * 1000000000) div (tRaw + $buckets)").as("pr"))
      .select(col("b"), expr("pt div pr").as("ratio_x1e6"))
    val scored = toks
      .join(broadcast(ratios), Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("ratio_x1e6")).as("s"))
    docs.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(expr("s div n_tokens"), lit(0L)).as("importance_x1e6"))
      .withColumn("selected", col("importance_x1e6") >= 1000000L)
  }
}
