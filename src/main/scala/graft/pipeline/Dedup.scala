package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TextFunctions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Algorithms follow the published formulations: MinHash resemblance
  * sketches (Broder, "On the resemblance and containment of documents",
  * SEQUENCES 1997) with LSH banding (Leskovec/Rajaraman/Ullman, Mining of
  * Massive Datasets ch.3), and SimHash random-hyperplane sketches
  * (Charikar, "Similarity estimation techniques from rounding
  * algorithms", STOC 2002), as used for near-dedup of web-scale training
  * corpora (Lee et al., "Deduplicating Training Data Makes Language
  * Models Better", ACL 2022).
  *
  * Each operator is a declarative DataFrame transform designed for the
  * 100 TB shape first, with the small-scale oracle-checked query derived
  * from the same code path:
  *
  *  - exact: hash-groupBy on content — one shuffle on the dedup key.
  *  - MinHash+LSH: per-row signature (narrow), explode to bands (xN),
  *    shuffle on band key, verify candidates — the classic
  *    shingle->minhash->band->bucket-join pipeline; cost scales with
  *    candidate count, not n^2.
  *  - SimHash: per-row 32-bit sketch (narrow), then block-local pairing.
  *  - n-gram Jaccard: blocked pairwise — the exact (quadratic-per-block)
  *    baseline the sketch methods approximate.
  *  - embedding cosine: blocked pairwise over vectors.
  *
  * MATERIALIZATION DISCIPLINE (read before adding an operator): multi-
  * consumer frames whose construction is expensive (shingle/sketch
  * passes, tokenized corpora) are pinned with EAGER `localCheckpoint` —
  * blocks are ContextCleaner-freed when the frame is garbage (unlike
  * `cache()`, which would leak across a long-lived session), and the
  * construction pass is paid exactly once. Two consequences callers on
  * elastic clusters must know: (1) construction runs AT OPERATOR BUILD
  * TIME — these entry points trigger Spark jobs even if the returned
  * frame is never consumed; (2) `localCheckpoint` is a NON-RELIABLE
  * checkpoint — pinned blocks live on executors with lineage truncated,
  * so losing an executor (dynamic allocation, spot kill) fails the
  * query instead of recomputing. On a static cluster (this engine's
  * bench/serving posture) that trade is free; under executor churn,
  * swap the corpus-scale pins (the [[blockedPairs]] input, the
  * substring/passage token frames) for `persist(DISK_ONLY)` + explicit
  * unpersist or a reliable checkpoint dir, at the cost of a
  * write-through to storage.
  */
object Dedup {

  /** Exact dedup: one survivor (min id) per identical value of `key`.
    * Scale: single shuffle on key; map-side partial aggregation. */
  def exact(df: DataFrame, key: Column, id: Column): DataFrame =
    df.groupBy(key.as("dedup_key"))
      .agg(min(id).as("survivor_id"), count(lit(1)).as("copies"))

  /** Skew-proof blocked self-join: all unordered pairs (a, b) with
    * `a.blk == b.blk` and `a.doc_id < b.doc_id`, each pair exactly once.
    *
    * A plain self-join on the block key puts every pair of a block in ONE
    * task (a language block at 100 TB is millions of docs — quadratic on
    * a single core). Instead each row gets a salt bucket
    * `bu = doc_id % buckets` and is replicated to the `buckets`
    * bucket-PAIR keys it participates in; the join key becomes
    * (blk, lo, hi), giving blocks x buckets(buckets+1)/2 parallel tasks.
    * The filter `least/greatest(bu) == (lo, hi)` keeps each pair exactly
    * once (same-bucket pairs only in (u,u); cross-bucket pairs only in
    * (min,max)).
    *
    * Input must have columns `doc_id` and `blk`; payload columns are
    * carried through with `a_`/`b_` prefixes.
    */
  def blockedPairs(t0: DataFrame, buckets: Int): DataFrame = {
    // The input subtree feeds BOTH self-join sides with DIFFERENT
    // bucket-pair expansions (sequence(bu, buckets-1) vs sequence(0,
    // bu)), so exchange reuse can never kick in and an expensive
    // upstream — the per-doc shingle hashing of the quadratic dedup
    // baselines, the simhash sketch pass — would evaluate TWICE.
    // Materialize it eagerly once: both sides then read the (tiny next
    // to its construction cost) blocked frame from block storage, and
    // the construction pass is paid exactly once. CORPUS-SCALE PIN:
    // this frame is per-doc (id, blk, payload sketch) — at 100 TB it is
    // the largest thing this module pins; see the object scaladoc for
    // the localCheckpoint executor-loss trade and the DISK_ONLY swap.
    val t = t0.localCheckpoint(true)
    val payload = t.columns.filterNot(Set("doc_id", "blk"))
    val bu = pmod(col("doc_id"), lit(buckets)).cast("int")
    // Role assignment by salt bucket: the A side serves the LOW bucket of
    // each bucket-pair key, the B side the HIGH bucket, so a cross-bucket
    // pair meets in EXACTLY one key with no probe amplification; the
    // same-bucket key (u,u) uses id order. Pair ids are emitted as
    // (least, greatest) — payload a_/b_ roles are bucket-determined, so
    // downstream measures must be symmetric.
    val a = t
      .withColumn("bu", bu)
      .withColumn("pk", explode(transform(
        sequence(col("bu"), lit(buckets - 1)),
        v => struct(col("bu").as("lo"), v.as("hi")))))
    val b = t
      .withColumn("bu", bu)
      .withColumn("pk", explode(transform(
        sequence(lit(0), col("bu")),
        v => struct(v.as("lo"), col("bu").as("hi")))))
    val aSel = a.select(
      (Seq(col("doc_id").as("a_raw_id"), col("blk"), col("pk")) ++
        payload.map(c => col(c).as(s"a_$c"))): _*)
    val bSel = b.select(
      (Seq(col("doc_id").as("b_raw_id"), col("blk").as("b_blk"),
        col("pk").as("b_pk")) ++
        payload.map(c => col(c).as(s"b_$c"))): _*)
    aSel.join(bSel,
        col("blk") === col("b_blk") && col("pk") === col("b_pk") &&
          (col("pk.lo") =!= col("pk.hi") || col("a_raw_id") < col("b_raw_id")) &&
          col("a_raw_id") =!= col("b_raw_id"))
      .withColumn("a_id", least(col("a_raw_id"), col("b_raw_id")))
      .withColumn("b_id", greatest(col("a_raw_id"), col("b_raw_id")))
      .drop("b_blk", "b_pk", "pk", "a_raw_id", "b_raw_id")
  }

  /** THE LSH banding projection — the single definition both the batch
    * near-dup pass ([[minhashLsh]]) and the persisted bands index
    * ([[DedupIndex]]) derive band rows from, so probe-vs-index
    * bit-compatibility is structural, not spec-pinned: band rows of a
    * (doc_id, text) frame as (band, band_key, doc_id), band_key equal
    * iff all `bandSize` signature slots match. One narrow projection +
    * explode, no shuffle. */
  def bandRows(docs: DataFrame, numHashes: Int, bandSize: Int,
      hashKind: String = "md5"): DataFrame = {
    require(numHashes % bandSize == 0,
      "numHashes must be divisible by bandSize")
    val numBands = numHashes / bandSize
    docs
      .select(col("doc_id"), shingles3(col("text")).as("sh"))
      .withColumn("mh", graft.functions.HashColumns
        .minhashSignature(col("sh"), numHashes, hashKind))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(numBands - 1)),
          b => concat_ws(",", slice(col("mh"), b * bandSize + 1, lit(bandSize)))))
          .as(Seq("band", "band_key")))
      .select(col("band").cast("long").as("band"), col("band_key"),
        col("doc_id"))
  }

  /** MinHash-LSH near-dup pairs over a text column.
    *
    * @return (a_id, b_id, jac_x1000) for candidate pairs whose TRUE
    *         shingle-set jaccard >= threshold, a_id < b_id.
    */
  def minhashLsh(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 32,
      bandSize: Int = 4,
      thresholdX1000: Int = 500,
      /** "md5" = oracle-replayable reference semantics; "xx" = xxHash64
        * production path (~10x cheaper per hash, same pipeline shape). */
      hashKind: String = "md5",
      /** Hard bound on one LSH bucket's membership: the grouped
        * candidate generation holds a bucket's sorted id list in ONE
        * aggregation buffer and expands its (i, j>i) pairs in ONE task,
        * so a degenerate corpus (thousands of byte-identical docs — all
        * 8 bands collide) would serialize quadratic pair expansion on a
        * single core and balloon that buffer. The pair OUTPUT is
        * quadratic in the bucket either way; past this bound the
        * operator fails LOUDLY (raise_error, naming the bucket) instead
        * of degrading — pre-dedup exact duplicates ([[exact]]) or raise
        * the cap deliberately. 64k ids ≈ 512 KB buffer, ~2G pairs: far
        * beyond any real near-dup cluster, comfortably inside task
        * memory. */
      maxBucketDocs: Int = 65536
  ): DataFrame = {
    require(numHashes % bandSize == 0, "numHashes must be divisible by bandSize")
    require(maxBucketDocs >= 2, s"maxBucketDocs must be >= 2, got $maxBucketDocs")
    val withSig = docs
      .select(col(idCol).as("doc_id"), shingles3(col(textCol)).as("sh"))
      .withColumn("shh",
        graft.functions.HashColumns.hashedSet(col("sh"), "j", hashKind))

    // (band, band_key) rows via the ONE shared banding projection
    // ([[bandRows]] — the same rows a persisted DedupIndex stores):
    // band keys join equal iff all slots in the band match, the LSH
    // bucket. Candidates come from ONE aggregation over the band rows
    // rather than a bands-to-bands self-join: the join form evaluates
    // the bandRows subtree (the full numHashes-seed signature pass —
    // the operator's dominant cost) once per side, the grouped form
    // once total, and one exchange replaces two. Pair semantics are
    // identical: collect the bucket's doc ids sorted, emit (i, j>i)
    // positional pairs (sorted ⇒ a_id < b_id), then the same distinct
    // across buckets. An LSH bucket's membership list is bounded by the
    // near-dup cluster size (the pair OUTPUT is already quadratic in
    // it), so the per-group list adds no new scale hazard.
    val bands = bandRows(
      docs.select(col(idCol).as("doc_id"), col(textCol).as("text")),
      numHashes, bandSize, hashKind)

    val buckets = bands
      .groupBy("band", "band_key")
      .agg(sort_array(collect_list("doc_id")).as("ids"))
      .filter(size(col("ids")) >= 2)
    // the raise_error branch must carry the ids column's OWN type (the
    // operator is id-type-agnostic; a hard-coded cast would coerce or
    // reject non-bigint doc ids)
    val idsType = buckets.schema("ids").dataType.catalogString
    val cand = buckets
      // oversized-bucket tripwire (see maxBucketDocs): fail loudly with
      // the offending band before the quadratic expansion serializes on
      // one task — a no-op projection for every sane bucket
      .withColumn("ids",
        when(size(col("ids")) <= lit(maxBucketDocs), col("ids"))
          .otherwise(raise_error(concat(
            lit(s"minhashLsh: LSH bucket exceeds maxBucketDocs=$maxBucketDocs (band="),
            col("band").cast("string"),
            lit(", |bucket|="), size(col("ids")).cast("string"),
            lit("); pre-dedup exact duplicates or raise the cap")))
            .cast(idsType)))
      .select(posexplode(col("ids")).as(Seq("i", "a_id")), col("ids"))
      .select(col("a_id"),
        explode(slice(col("ids"), col("i") + 2, size(col("ids")))).as("b_id"))
      // strict-inequality guarantee: duplicate doc_id rows in the input
      // would make the sorted bucket list carry equal neighbours, whose
      // positional (i, j>i) pairs include (x, x) — the old self-join's
      // a.doc_id < b.doc_id never could. A no-op for unique ids.
      .filter(col("a_id") < col("b_id"))
      .distinct()

    // the verify join consumes the signature frame TWICE (a_id and b_id
    // sides — different join keys, so exchange reuse never applies);
    // materialize it once so the per-doc hashedSet pass is paid once,
    // not per side
    val sigs = withSig.select(col("doc_id"), col("shh")).localCheckpoint(true)
    cand
      .join(sigs.as("x"), col("a_id") === col("x.doc_id"))
      .join(sigs.as("y"), col("b_id") === col("y.doc_id"))
      // fused threshold-early-exit verify ([[ngramJaccardPairs]])
      .withColumn("jac_x1000", graft.functions.HashColumns
        .jaccardX1000Threshold(col("x.shh"), col("y.shh"), thresholdX1000))
      .filter(col("jac_x1000") >= thresholdX1000)
      .select("a_id", "b_id", "jac_x1000")
  }

  /** SimHash near-dup pairs: 32-bit sketch over distinct 3-shingles,
    * pairs within a blocking key at hamming distance <= maxDistance. */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      maxDistance: Int = 6,
      /** "md5" = oracle-replayable; "xx" = xxHash64 production path. */
      hashKind: String = "md5"
  ): DataFrame = {
    val sk = docs
      .select(col(idCol).as("doc_id"), col(blockCol).as("blk"),
        shingles3(col(textCol)).as("sh"))
      .withColumn("simhash",
        graft.functions.HashColumns.simhash32(col("sh"), hashKind))
      .select("doc_id", "blk", "simhash")
    blockedPairs(sk, buckets = 8)
      .withColumn("dist",
        bit_count(col("a_simhash").bitwiseXOR(col("b_simhash"))).cast("long"))
      .filter(col("dist") <= maxDistance)
      .select(col("a_id"), col("b_id"), col("dist"))
  }

  /** CONTAINMENT near-dup pairs: |A∩B| * 1000 div min(|A|, |B|) over
    * 3-shingle sets within a blocking key — the asymmetric measure that
    * catches a SHORT document embedded in a long one (a quote, an
    * excerpt, a truncated mirror), which symmetric Jaccard structurally
    * misses (the union is dominated by the long side). No size-ratio
    * prefilter can apply — the size-skewed pair IS the target — so cost
    * is the blocked quadratic baseline, like [[ngramJaccardPairs]]:
    * this form is the readable EXACT ORACLE. The production twin with
    * the identical output is [[containmentPairsPrefix]] — prefix-
    * filtered index probing, never quadratic in a block. Empty shingle
    * sets (< 3 tokens) are excluded: containment of nothing is
    * undefined, not 100%. */
  def containmentPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      thresholdX1000: Int = 900
  ): DataFrame = {
    val t = docs.select(col(idCol).as("doc_id"), col(blockCol).as("blk"),
      graft.functions.HashColumns.hashedSet(shingles3(col(textCol)), "j").as("sh"))
      .filter(size(col("sh")) > 0)
    // fused verify with a threshold early exit: exact containment for
    // every pair the filter keeps (the early exit provably cannot fire
    // at or above the threshold), below-threshold pairs — the vast
    // majority of the quadratic blocked enumeration — stop their merge
    // as soon as the remaining overlap cannot reach ceil(t*min/1000)
    blockedPairs(t, buckets = 8)
      .withColumn("cont_x1000", graft.functions.HashColumns
        .containmentX1000Threshold(col("a_sh"), col("b_sh"), thresholdX1000))
      .filter(col("cont_x1000") >= thresholdX1000)
      .select(col("a_id"), col("b_id"), col("cont_x1000"))
  }

  /** PRODUCTION-SCALE containment pairs: a PREFIX-FILTERED overlap
    * self-join (the exact set-similarity-join family — Chaudhuri et
    * al., "A Primitive Operator for Similarity Joins", ICDE 2006;
    * Bayardo et al., "Scaling Up All Pairs Similarity Search", WWW
    * 2007; Xiao et al., "Efficient Similarity Joins for Near Duplicate
    * Detection", WWW 2008), which produces [[containmentPairs]]'s
    * EXACT output without ever enumerating a block's pair set:
    *
    *  1. one distributed aggregate orders the shingle universe by
    *     GLOBAL RARITY within each block (document frequency asc, hash
    *     asc — a total order both sides of any pair agree on);
    *  2. containment(A,B) >= t with A the smaller side needs
    *     |A∩B| >= ceil(t*|A|), so among A's (|A| - ceil(t*|A|) + 1)
    *     RAREST shingles at least one must lie in B — each doc
    *     therefore probes an inverted index of ALL docs' shingles with
    *     only that short prefix (~(1-t) of its shingles);
    *  3. candidate pairs verify with the exact two-pointer intersect.
    *
    * LOSSLESS, not an approximation: recall 1 by the prefix-filter
    * theorem (the non-prefix suffix holds only ceil(t*s)-1 shingles,
    * fewer than any qualifying intersection), precision 1 by the
    * verify stage — so it shares the quadratic baseline's oracle
    * verbatim (the dedup_minhash_xx discipline, but deterministic).
    *
    * 100 TB shape: every stage is a shuffle on a uniform or
    * rarity-thinned key — shingle-hash aggregates, one per-doc window
    * (docs are bounded-size), and a probe join whose candidate count is
    * Σ prefix_len(doc) × df(shingle at probe). Rarity ordering puts the
    * corpus's hottest shingles OUTSIDE every prefix, so probed postings
    * lists are the SHORT tail ones; a stop-phrase shared by a million
    * docs is never probed. No stage is quadratic in a block. */
  def containmentPairsPrefix(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      thresholdX1000: Int = 900
  ): DataFrame =
    containmentPairsPrefixSized(docs, idCol, textCol, blockCol,
      thresholdX1000)
      .select(col("a_id"), col("b_id"), col("cont_x1000"))

  /** [[containmentPairsPrefix]] plus the two shingle-set sizes
    * (a_sz, b_sz) the verify stage already holds — what a drop rule
    * needs to identify the CONTAINED side without re-shingling. */
  private[graft] def containmentPairsPrefixSized(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      thresholdX1000: Int = 900
  ): DataFrame = {
    require(thresholdX1000 > 0 && thresholdX1000 <= 1000,
      s"containment threshold must be in (0, 1000], got $thresholdX1000")
    // the shingle-set frame feeds the instance explode AND both verify
    // sides (3 consumers, 3 different downstream keys — no exchange
    // reuse); materialize once so the per-doc shingle hashing is paid
    // once. Per-doc arrays only — the exploded instances stay lazy.
    val sets = docs.select(col(idCol).as("doc_id"), col(blockCol).as("blk"),
        graft.functions.HashColumns
          .hashedSet(shingles3(col(textCol)), "j").as("sh"))
      .filter(size(col("sh")) > 0)
      .localCheckpoint(true)
    val ex = sets.select(col("doc_id"), col("blk"),
      size(col("sh")).cast("long").as("s"), explode(col("sh")).as("h"))
    // block-scoped document frequency: the rarity order is shared by
    // both docs of any candidate pair (pairs never cross blocks)
    val dfreq = ex.groupBy("blk", "h").agg(count(lit(1)).as("df"))
    // alpha = ceil(t * s): the least intersection size that clears the
    // floored-division threshold when this doc is the smaller side
    val alpha = expr(s"(s * $thresholdX1000 + 999) div 1000")
    val w = Window.partitionBy("doc_id").orderBy(col("df"), col("h"))
    val probes = ex.join(dfreq, Seq("blk", "h"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("s") - alpha + 1)
      .select("doc_id", "blk", "h")
    val postings = ex.select(col("doc_id").as("p_id"), col("blk"), col("h"))
    val cand = probes.join(postings, Seq("blk", "h"))
      .filter(col("doc_id") =!= col("p_id"))
      .select(least(col("doc_id"), col("p_id")).as("a_id"),
        greatest(col("doc_id"), col("p_id")).as("b_id"))
      .distinct()
    val s2 = sets.select(col("doc_id"), col("sh"))
    cand
      .join(s2.as("x"), col("a_id") === col("x.doc_id"))
      .join(s2.as("y"), col("b_id") === col("y.doc_id"))
      // fused threshold-early-exit verify (exact for every kept pair —
      // see [[containmentPairs]]; candidates here are prefix-filtered,
      // so the miss fraction is smaller but the exit still prunes)
      .withColumn("cont_x1000", graft.functions.HashColumns
        .containmentX1000Threshold(col("x.sh"), col("y.sh"), thresholdX1000))
      .filter(col("cont_x1000") >= thresholdX1000)
      .select(col("a_id"), col("b_id"), col("cont_x1000"),
        size(col("x.sh")).cast("long").as("a_sz"),
        size(col("y.sh")).cast("long").as("b_sz"))
  }

  /** Containment-based EXCERPT removal — the curation drop rule over
    * [[containmentPairsPrefix]]'s pairs: for every qualifying pair,
    * drop the side with FEWER shingles (the contained excerpt /
    * truncation), keeping the fuller document; equal sizes drop the
    * higher id (deterministic). Returns the distinct loser ids for the
    * caller's anti-join. Scale shape: the pair set is prefix-filtered
    * (never a block's quadratic enumeration) and the sizes ride out of
    * the verify stage, so this adds only the per-pair CASE + distinct. */
  def containmentLosers(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      thresholdX1000: Int = 900
  ): DataFrame =
    containmentPairsPrefixSized(docs, idCol, textCol, blockCol,
      thresholdX1000)
      .select(
        when(col("a_sz") < col("b_sz"), col("a_id"))
          .when(col("b_sz") < col("a_sz"), col("b_id"))
          .otherwise(greatest(col("a_id"), col("b_id")))
          .as("doc_id"))
      .distinct()

  /** Exact n-gram (3-shingle) Jaccard pairs within a blocking key — the
    * quadratic-per-block exact baseline. */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      thresholdX1000: Int = 500
  ): DataFrame = {
    val t = docs.select(col(idCol).as("doc_id"), col(blockCol).as("blk"),
      graft.functions.HashColumns.hashedSet(shingles3(col(textCol)), "j").as("sh"))
    // size-ratio prefilter: jaccard >= t/1000 implies
    // min(|A|,|B|) / max(|A|,|B|) >= t/1000 (|A∩B| <= min, |A∪B| >= max),
    // so the cheap integer test prunes pairs before the merge loop runs
    // and cannot change the output set
    blockedPairs(t, buckets = 8)
      .filter(least(size(col("a_sh")), size(col("b_sh"))) * 1000 >=
        greatest(size(col("a_sh")), size(col("b_sh"))) * thresholdX1000)
      // fused threshold-early-exit verify: exact jaccard for every pair
      // the filter keeps; a below-threshold pair stops its merge once
      // |A∩B| can no longer reach ceil(t*(|A|+|B|)/(1000+t))
      .withColumn("jac_x1000", graft.functions.HashColumns
        .jaccardX1000Threshold(col("a_sh"), col("b_sh"), thresholdX1000))
      .filter(col("jac_x1000") >= thresholdX1000)
      .select(col("a_id"), col("b_id"), col("jac_x1000"))
  }

  /** PRODUCTION-SCALE exact Jaccard pairs: the prefix-filtered overlap
    * self-join ([[containmentPairsPrefix]]'s machinery — Chaudhuri
    * 2006, Bayardo 2007, Xiao 2008) producing [[ngramJaccardPairs]]'s
    * EXACT output without ever enumerating a block's pair set.
    *
    * The prefix bound: jac_x1000(A,B) >= T means
    * |A∩B| * 1000 >= T * (|A| + |B| - |A∩B|), and since |A∩B| <= |B|
    * the B-terms cannot go negative, so |A∩B| * 1000 >= T * |A| — i.e.
    * the intersection is at least alpha(A) = ceil(T*|A|/1000), the SAME
    * bound the containment prefix uses (Jaccard <= containment, so the
    * containment prefix is lossless for Jaccard a fortiori). Among A's
    * (|A| - alpha + 1) rarest shingles at least one must lie in B; each
    * doc probes the inverted index with only that short prefix.
    * Additionally jac >= T implies min(|A|,|B|) * 1000 >=
    * max(|A|,|B|) * T, so size-incompatible candidates prune at the
    * probe join before the distinct — a pure optimization that cannot
    * change the output.
    *
    * LOSSLESS: recall 1 by the prefix-filter theorem, precision 1 by
    * the exact sorted-merge Jaccard verify — shares the quadratic
    * baseline's oracle VERBATIM. Scale shape: identical to
    * [[containmentPairsPrefix]] — every stage keys on a uniform or
    * rarity-thinned key, the hottest shingles sit outside every
    * prefix, no stage is quadratic in a block. */
  def ngramJaccardPairsPrefix(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      thresholdX1000: Int = 500
  ): DataFrame = {
    require(thresholdX1000 > 0 && thresholdX1000 <= 1000,
      s"jaccard threshold must be in (0, 1000], got $thresholdX1000")
    // materialized once for the same reason as the containment prefix
    // path: 3 consumers (instance explode + both verify sides), no
    // exchange reuse between them
    val sets = docs.select(col(idCol).as("doc_id"), col(blockCol).as("blk"),
        graft.functions.HashColumns
          .hashedSet(shingles3(col(textCol)), "j").as("sh"))
      .filter(size(col("sh")) > 0)
      .localCheckpoint(true)
    val ex = sets.select(col("doc_id"), col("blk"),
      size(col("sh")).cast("long").as("s"), explode(col("sh")).as("h"))
    val dfreq = ex.groupBy("blk", "h").agg(count(lit(1)).as("df"))
    val alpha = expr(s"(s * $thresholdX1000 + 999) div 1000")
    val w = Window.partitionBy("doc_id").orderBy(col("df"), col("h"))
    val probes = ex.join(dfreq, Seq("blk", "h"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("s") - alpha + 1)
      .select("doc_id", "blk", "h", "s")
    val postings = ex.select(col("doc_id").as("p_id"), col("blk"),
      col("h"), col("s").as("p_s"))
    val cand = probes.join(postings, Seq("blk", "h"))
      .filter(col("doc_id") =!= col("p_id"))
      .filter(least(col("s"), col("p_s")) * 1000 >=
        greatest(col("s"), col("p_s")) * thresholdX1000)
      .select(least(col("doc_id"), col("p_id")).as("a_id"),
        greatest(col("doc_id"), col("p_id")).as("b_id"))
      .distinct()
    val s2 = sets.select(col("doc_id"), col("sh"))
    cand
      .join(s2.as("x"), col("a_id") === col("x.doc_id"))
      .join(s2.as("y"), col("b_id") === col("y.doc_id"))
      // fused threshold-early-exit verify ([[ngramJaccardPairs]])
      .withColumn("jac_x1000", graft.functions.HashColumns
        .jaccardX1000Threshold(col("x.sh"), col("y.sh"), thresholdX1000))
      .filter(col("jac_x1000") >= thresholdX1000)
      .select(col("a_id"), col("b_id"), col("jac_x1000"))
  }

  /** Connected components over an undirected near-dup pair graph:
    * label-propagation to the component MINIMUM id — every node converges
    * to `comp = min(id in its component)`, the canonical survivor. Fixes
    * the greedy pair-drop's over-keep on transitive chains (pairs (A,C)
    * and (B,C) must collapse to ONE survivor A, not two).
    *
    * Deterministic fixpoint, two phases. Phase 1: min-label
    * propagation — ONE cheap shuffle per round, exact stationary-sum
    * convergence (labels only decrease) — bounded at 8 rounds, which
    * finishes virtually every near-dup graph (duplicate clusters have
    * tiny diameter). Phase 2, only if propagation hasn't converged:
    * contract the graph by the partial labels and run alternating
    * large-star/small-star rounds (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC 2014) — O(log n)
    * rounds, so an adversarial diameter-100 chain costs ~7 star rounds
    * instead of 100 propagation rounds. Either way the result is the
    * well-defined component minimum, independent of iteration order or
    * engine (a DuckDB recursive CTE reaches the identical fixpoint).
    *
    * @param pairs DataFrame with `a_id`, `b_id` columns (undirected edges)
    * @return (id, comp) — one row per node appearing in any pair
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    // the input edge frame is consumed THREE times before iteration
    // even starts (both sides of the node union + the canonical edge
    // set) — and callers hand in whole near-dup pipelines as `pairs`.
    // Materialize once; everything downstream reads the (tiny) edge
    // list, never the pipeline that produced it.
    val raw = pairs.select(col("a_id").as("u"), col("b_id").as("v"))
      .localCheckpoint(true)
    // every node appearing in any pair gets a label, including
    // self-loop-only and isolated-after-dedup nodes
    val nodes = raw.select(col("u").as("id"))
      .union(raw.select(col("v").as("id"))).distinct().persist()
    if (nodes.head(1).isEmpty) {
      nodes.unpersist()
      return raw.select(col("u").as("id"), col("u").as("comp")).limit(0)
    }
    // the ORIGINAL undirected edges, canonically oriented big->small:
    // the convergence certificate checks against THESE, so an early
    // stationary probe can never return labels that split a component
    val original = raw.filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct().persist()

    // per-node label implied by an oriented (big->small) edge frame:
    // min over outgoing parents, the node itself when it has none
    def labelsOf(e: DataFrame): DataFrame =
      nodes.join(e.groupBy("u").agg(min("v").as("p")),
          col("id") === col("u"), "left")
        .select(col("id"),
          least(col("id"), coalesce(col("p"), col("id"))).as("comp"))

    // PHASE 1 — plain min-label propagation, the CHEAP round shape
    // (one join + one groupBy), bounded at a handful of rounds:
    // near-dup components are duplicate CLUSTERS with tiny diameter,
    // so this phase almost always finishes in 2-4 rounds. Stationarity
    // is an exact certificate here: labels are non-increasing, a
    // stationary sum means no label moved, and a propagation fixpoint
    // forces both endpoints of every edge to share a label — which is
    // then the component minimum (the minimum node's own id never
    // changes). EVERY round eagerly localCheckpoints: a persist-only
    // loop deepens the logical plan by one join per round and the
    // analyzer/optimizer re-plans the whole lineage twice per round
    // (BENCH_r02: 42 s, BENCH_r08: 35 s excursions on a 3 s query);
    // checkpointing pins plan depth at one LogicalRDD + one join.
    val bidir0 = original
      .union(original.select(col("v").as("u"), col("u").as("v")))
      .persist()
    val propRounds = math.min(6, maxIter)
    var labels = nodes.withColumn("comp", col("id")).localCheckpoint(true)
    var lastSum = labels.agg(sum("comp")).first().getLong(0)
    var done = false
    var iter = 0
    while (!done && iter < propRounds) {
      val viaNeighbors = bidir0.join(labels, col("v") === col("id"))
        .groupBy(col("u")).agg(min("comp").as("ncomp"))
      val next = labels.join(viaNeighbors, col("id") === col("u"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
        .localCheckpoint(true)
      val s = next.agg(sum("comp")).first().getLong(0)
      labels.unpersist()
      labels = next
      done = s == lastSum
      lastSum = s
      iter += 1
    }
    bidir0.unpersist()

    // PHASE 2 — only for graphs deeper than the propagation budget:
    // CONTRACT the graph by the phase-1 labels (each partial cluster
    // becomes one node), then run alternating large-star / small-star
    // rounds (Kiveris et al., "Connected Components in MapReduce and
    // Beyond", SoCC 2014), whose round count is O(log n) — a planted
    // diameter-100 chain finishes in ~7 star rounds where propagation
    // would pay 100.
    if (!done) {
      var e = original
        .join(labels.select(col("id").as("u"), col("comp").as("cu")), "u")
        .join(labels.select(col("id").as("v"), col("comp").as("cv")), "v")
        .where(col("cu") =!= col("cv"))
        .select(greatest(col("cu"), col("cv")).as("u"),
          least(col("cu"), col("cv")).as("v"))
        .distinct()
        .localCheckpoint(true)
      val cnodes = e.select(col("u").as("id"))
        .union(e.select(col("v").as("id"))).distinct().persist()
      def starLabels(edges: DataFrame): DataFrame =
        cnodes.join(edges.groupBy("u").agg(min("v").as("p")),
            col("id") === col("u"), "left")
          .select(col("id"),
            least(col("id"), coalesce(col("p"), col("id"))).as("comp"))
      while (!done && iter < maxIter) {
        // LARGE-STAR: for each node u, attach every STRICTLY LARGER
        // neighbor to the minimum of u's closed neighborhood —
        // processed from the smaller endpoint of each edge, so every
        // edge contributes exactly once; output points big->small.
        val bidir = e.union(e.select(col("v").as("u"), col("u").as("v")))
        val mLarge = bidir.groupBy("u").agg(min("v").as("mn"))
          .select(col("u").as("lu"), least(col("u"), col("mn")).as("m"))
        val large = bidir.join(mLarge, col("u") === col("lu"))
          .where(col("v") > col("u"))
          .select(col("v").as("u"), col("m").as("v"))
          .distinct()
        // SMALL-STAR: input already points big->small; re-point each
        // node and all its smaller neighbors at the minimum among them
        val mSmall = large.groupBy("u").agg(min("v").as("mn"))
          .select(col("u").as("su"), col("mn").as("m"))
        val withM = large.join(mSmall, col("u") === col("su"))
        val prevE = e
        e = withM.where(col("v") =!= col("m"))
            .select(col("v").as("u"), col("m").as("v"))
          .union(withM.select(col("u"), col("m").as("v")))
          .distinct()
          .localCheckpoint(true)
        prevE.unpersist()
        // exact CERTIFICATE every star round: labels are final iff
        // both endpoints of every current edge agree (star sums are
        // not monotone the way phase-1 label sums are, so a
        // stationarity probe would prove nothing and cost a lag
        // round; the contracted frames are small, so the per-round
        // certificate join is cheap)
        val lbl = starLabels(e)
        val lu = lbl.select(col("id").as("cu2"), col("comp").as("ka"))
        val lv = lbl.select(col("id").as("cv2"), col("comp").as("kb"))
        done = e.join(lu, col("u") === col("cu2"))
          .join(lv, col("v") === col("cv2"))
          .where(col("ka") =!= col("kb")).isEmpty
        iter += 1
      }
      if (done) {
        // compose: each phase-1 label routes through its star component
        val star = starLabels(e)
          .select(col("id").as("c1"), col("comp").as("c2"))
        val prevLabels = labels
        labels = labels.join(star, col("comp") === col("c1"), "left")
          .select(col("id"), coalesce(col("c2"), col("comp")).as("comp"))
          .localCheckpoint(true)
        prevLabels.unpersist()
      }
      e.unpersist()
      cnodes.unpersist()
    }
    connectedComponentsRounds.set(iter)
    // silent non-convergence would return WRONG components — fail
    // loudly instead (after the O(log n) star phase this means a
    // broken fixpoint, not a long chain)
    require(done,
      s"connectedComponents did not converge within $maxIter rounds " +
        s"($propRounds propagation + ${iter - propRounds} star) — an " +
        "edge's endpoints still disagree; raise maxIter only if the " +
        "graph has over 2^maxIter nodes")
    original.unpersist()
    nodes.unpersist()
    labels
  }

  /** Rounds the last [[connectedComponents]] call took — observable so
    * the planted-chain spec can pin the O(log n) bound. */
  private[graft] val connectedComponentsRounds =
    new java.util.concurrent.atomic.AtomicInteger(0)

  /** SemDeDup-style SEMANTIC dedup (Abbas et al., "SemDeDup: Data-
    * efficient learning at web-scale through semantic deduplication",
    * arXiv:2303.09540): cluster the embedding space with k-means, then
    * compare pairs ONLY within a cluster — a doc is a duplicate iff a
    * LOWER-ID doc in its cluster has cosine >= the threshold. The
    * clustering bounds pair cost to Σ|cluster|² instead of |corpus|²;
    * at 100 TB the centroid count is the knob that keeps clusters
    * small (centroids broadcast, assignment is a narrow pass, and the
    * only shuffle is the per-cluster self-join key).
    *
    * Training reuses [[Similarity.IntKMeans]] — quantized x1e6 integer
    * Lloyd — so clustering, assignment, and the keep/drop decision all
    * replay bit-for-bit in the DuckDB oracle (`dedup_semantic`).
    *
    * @return (vec_id, cluster, is_dup) — one row per vector. */
  def semanticDedup(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      minCosineX1e6: Long,
      numCentroids: Int = 16,
      lloydIters: Int = 2
  ): DataFrame = {
    val tq = quantized(vectors, idCol, vecCol).persist()
    try {
      val assigned =
        clusterAssigned(tq, numCentroids, lloydIters).persist()
      // materialize before unpersist: callers get a stable frame
      try semanticFlags(assigned, minCosineX1e6).localCheckpoint(true)
      finally assigned.unpersist()
    } finally tq.unpersist()
  }

  private def quantized(vectors: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    vectors.select(col(idCol).cast("long").as("vec_id"),
        col(vecCol).as("v"))
      .withColumn("px", Similarity.IntKMeans.quant(col("v")))

  /** (vec_id, v, cid) — one cluster per vector. */
  private def clusterAssigned(tq: DataFrame, numCentroids: Int,
      lloydIters: Int): DataFrame = {
    import Similarity.IntKMeans
    // training collects bounded centroids per Lloyd round (model
    // metadata); the assignment is then a narrow literal argmin — the
    // cluster pass never expands or shuffles the corpus
    IntKMeans.assignLit(tq, "px",
      IntKMeans.trainCollect(tq, "vec_id", "px", numCentroids, lloydIters))
      .drop("px")
  }

  /** The keep/drop decision over an assigned (vec_id, v, cid) frame —
    * split out so plan-shape tests can inspect the UNMATERIALIZED plan. */
  private def semanticFlags(assigned: DataFrame,
      minCosineX1e6: Long): DataFrame = {
    val a = assigned.select(col("cid"), col("vec_id").as("a_id"),
      col("v").as("a_v"))
    val b = assigned.select(col("cid"), col("vec_id").as("b_id"),
      col("v").as("b_v"))
    val dupIds = a.join(b, Seq("cid"))
      .filter(col("a_id") < col("b_id"))
      .filter(round(cosine(col("a_v"), col("b_v")) * 1e6).cast("long")
        >= minCosineX1e6)
      .select(col("b_id").as("vec_id")).distinct()
    assigned
      .join(dupIds.withColumn("__dup", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid").as("cluster"),
        coalesce(col("__dup"), lit(false)).as("is_dup"))
  }

  /** Un-checkpointed plan for shape assertions (tests only) — the
    * SAME builders as [[semanticDedup]], minus persist/checkpoint. */
  private[graft] def semanticDedupPlanForTest(
      vectors: DataFrame, idCol: String, vecCol: String,
      minCosineX1e6: Long, numCentroids: Int = 16,
      lloydIters: Int = 2): DataFrame =
    semanticFlags(
      clusterAssigned(quantized(vectors, idCol, vecCol),
        numCentroids, lloydIters),
      minCosineX1e6)

  /** Embedding near-dup pairs: cosine >= threshold within a block. */
  def embeddingPairs(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      blockCol: String,
      minCosine: Double
  ): DataFrame = {
    val t = vectors.select(col(idCol).as("doc_id"), col(blockCol).as("blk"),
      col(vecCol).as("v"))
    blockedPairs(t, buckets = 8)
      .withColumn("cos", round(cosine(col("a_v"), col("b_v")), 6))
      .filter(col("cos") >= minCosine)
      .select(col("a_id"), col("b_id"))
  }

  /** Passage-level exact dedup — the corpus-wide paragraph-hash pass of
    * CCNet (Wenzek et al., "CCNet: Extracting High Quality Monolingual
    * Datasets from Web Crawl Data", LREC 2020) and the "exact substring"
    * family of Lee et al. 2022: split every document into fixed-size
    * token passages, keep only the globally FIRST occurrence of each
    * distinct passage, and reassemble the surviving text per document.
    * Documents here have no line structure, so the passage boundary is a
    * deterministic token count rather than '\n' — the algebra is
    * identical.
    *
    * Returns (doc_id, n_passages, n_kept, cleaned_digest) where
    * cleaned_digest = md5 of the reassembled text — a cross-engine
    * hash-match certifies byte-exact reassembly, not just the counts.
    *
    * 100 TB shape (3 shuffles, all skew-proof):
    *  1. passages form per-row (narrow — no explode-then-regroup);
    *  2. winner per distinct passage via `min(doc*2^20+chunk)` groupBy —
    *     partial aggregation collapses a million-fold duplicated passage
    *     to one row per map task BEFORE the shuffle (a window over the
    *     passage key would funnel all duplicates into one partition);
    *  3. instances join winners on the UNIQUE (doc_id, chunk_idx) slot —
    *     uniform key distribution even when passage frequencies are
    *     wildly skewed;
    *  4. per-document reassembly groupBy.
    */
  def passageDedup(docs: DataFrame, idCol: String, textCol: String,
      passageTokens: Int = 8): DataFrame = {
    val n = passageTokens
    require(n > 0, s"passageTokens must be positive, got $n")
    val toks = split(col(textCol), " ")
    val lastChunk = ((size(toks) - 1).cast("double") / n).cast("long")
    val passages = transform(
      sequence(lit(0L), lastChunk),
      k => array_join(slice(toks, (k * n + 1).cast("int"), lit(n)), " "))
    // materialized once: the instance frame feeds the winner aggregate
    // AND the reassembly join (different keys — no exchange reuse), so
    // the passage build (token slicing + joins per chunk) would
    // otherwise run twice
    val inst = docs
      .select(col(idCol).as("doc_id"),
        posexplode(passages).as(Seq("chunk_idx", "passage")))
      .withColumn("chunk_idx", col("chunk_idx").cast("long"))
      .localCheckpoint(true)
    // chunk_idx must stay below 2^20 for the packed winner key (an 8M+
    // token document would silently corrupt winners — fail loudly)
    val packed = when(col("chunk_idx") < 1048576L,
        col("doc_id") * lit(1048576L) + col("chunk_idx"))
      .otherwise(raise_error(concat(
        lit("passageDedup: chunk_idx overflows the packed winner key: "),
        col("chunk_idx").cast("string"))))
    val winners = inst
      .withColumn("k", packed)
      .groupBy("passage").agg(min(col("k")).as("wkey"))
      .select(expr("wkey div 1048576").as("w_doc"),
        (col("wkey") % 1048576).as("w_chunk"))
    val kept = col("w_doc").isNotNull
    inst
      .join(winners,
        inst("doc_id") === winners("w_doc") &&
          inst("chunk_idx") === winners("w_chunk"),
        "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_passages"),
        sum(when(kept, 1L).otherwise(0L)).as("n_kept"),
        md5(array_join(
          transform(
            array_sort(collect_list(
              when(kept, struct(col("chunk_idx"), col("passage"))))),
            s => s.getField("passage")),
          " ")).as("cleaned_digest"))
  }

  /** EXACT SUBSTRING dedup — the sliding-window form of Lee et al. 2022
    * ("Deduplicating Training Data Makes Language Models Better",
    * ExactSubstr): a token is duplicated text when ANY `minTokens`-gram
    * covering it occurs at two or more positions corpus-wide (their
    * suffix-array criterion, restated as sliding fixed-length windows so
    * it distributes); every covered token is removed from every copy.
    * Complements [[passageDedup]], whose fixed non-overlapping chunks
    * miss duplicated spans that straddle a chunk boundary or start
    * mid-chunk.
    *
    * Returns (doc_id, n_tokens, n_removed, kept_digest) where
    * kept_digest = md5 of the surviving tokens in order — a cross-engine
    * hash match certifies byte-exact splicing, not just counts.
    *
    * 100 TB shape (4 shuffles, each on a uniform or shrinking key):
    *  1. gram counts: groupBy(gram) with map-side partial aggregation —
    *     a million-fold duplicated gram collapses per map task before
    *     the shuffle;
    *  2. instances semi-join the (already shrunken) duplicated-gram set
    *     on gram — when the dup set is small it broadcasts;
    *  3. covered (doc, position) pairs dedup on a UNIQUE, uniformly
    *     distributed key, then
    *  4. tokens anti-join covered on that same (doc, position) key and
    *     reassemble per doc. No window funnels all copies of a hot gram
    *     through one partition, and per-doc state is bounded by document
    *     length (the same bound [[passageDedup]]'s reassembly accepts).
    */
  def substringDedup(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 6): DataFrame = {
    val L = minTokens
    require(L > 1, s"minTokens must be > 1, got $L")
    // tokenized once: the frame feeds the gram explode, the per-token
    // explode, AND the final per-doc length projection (3 consumers,
    // no shared exchange) — without materialization each re-reads and
    // re-splits the corpus. CORPUS-SCALE PIN (full token arrays): see
    // the object scaladoc for the localCheckpoint executor-loss trade
    // and the DISK_ONLY swap on elastic clusters.
    val base = docs.select(col(idCol).as("doc_id"),
        split(col(textCol), " ").as("toks"))
      .localCheckpoint(true)
    // sliding L-gram instances with their 0-based start position; docs
    // shorter than L tokens yield none (sequence(0, negative) would
    // count DOWN, so the filter is load-bearing)
    val inst = base.filter(size(col("toks")) >= L)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), size(col("toks")) - L),
        i => array_join(slice(col("toks"), i + 1, lit(L)), " ")))
        .as(Seq("pos", "gram")))
    val dup = inst.groupBy("gram").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select("gram")
    val covered = inst.join(dup, Seq("gram"), "left_semi")
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (L - 1))).as("tp"))
      .distinct()
    val tokens = base.select(col("doc_id"), size(col("toks")).as("n_tok"),
      posexplode(col("toks")).as(Seq("tp", "tok")))
    val keptAgg = tokens.join(covered, Seq("doc_id", "tp"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("tp"), col("tok")))),
            s => s.getField("tok")),
          " ")).as("kept_digest"))
    base.select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
      .join(keptAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("kept_digest"), md5(lit(""))).as("kept_digest"))
  }
}
