package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus EXPORT layout: the deterministic global shuffle that
  * precedes writing a corpus out as training shards.
  *
  * Trainers want the corpus in a pseudorandom order that (a) breaks
  * every source/time/topic correlation the ingest order carries, (b) is
  * REPRODUCIBLE — re-running the export, on any cluster size or engine,
  * yields byte-identical shards — and (c) is addressable: example k of
  * shard s is a stable coordinate a data loader can seek to and a lineage
  * record can cite. An RNG-based `orderBy(rand())` gives none of that;
  * a seeded-hash order gives all three.
  *
  * Scale shape (the 100 TB contract): shard assignment is a NARROW
  * per-row hash, and the within-shard sequence numbers come from one
  * hash partition per shard — ONE shuffle total, no global sort, no
  * driver-side anything. Shard count is the parallelism knob: thousands
  * of shards → thousands of independent, evenly-loaded partitions
  * (hash-uniform), each small enough to sort in memory.
  */
object Export {

  /** Seeded 64-bit hash of `s` — md5-derived so any engine (the DuckDB
    * oracle included) replays the exact layout. Production twin: swap in
    * `xxhash64` for ~10x cheaper hashing when cross-engine replay isn't
    * required (same pattern as the MinHash md5/xx pair). */
  private def h64(seed: String, s: Column): Column =
    TextFunctions.hash64(lit(seed), s)

  /** Assign every document a `(shard, seq)` coordinate of the shuffled
    * corpus: `shard` = hash mod `shards`, `seq` = the document's 1-based
    * rank within its shard in hash order. Deterministic in (ids, seed,
    * shards); ties on the (vanishingly rare) equal hash break by id.
    *
    * @return input columns + `shard` + `seq`
    */
  def shuffleShards(
      docs: DataFrame,
      idCol: String,
      shards: Int,
      seed: String = "shuf"
  ): DataFrame = {
    require(shards > 0, "shard count must be positive")
    val clash = docs.columns.toSet
      .intersect(Set("shard", "seq", "_shuf_h"))
    require(clash.isEmpty,
      s"shuffleShards writes columns ${clash.mkString(", ")} — rename " +
        "them on the input first (silent overwrite would corrupt data)")
    val h = h64(seed, col(idCol).cast("string"))
    docs
      .withColumn("_shuf_h", h)
      .withColumn("shard", pmod(col("_shuf_h"), lit(shards.toLong)))
      .withColumn("seq", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("_shuf_h"), col(idCol))).cast("long"))
      .drop("_shuf_h")
  }

  /** DATA MIXING to per-domain token budgets: select, per domain, the
    * greedy hash-ordered prefix of documents whose running token total
    * stays under that domain's budget — the "recipe" step that turns a
    * raw corpus plus target mixture weights into the training subset
    * (downsample the over-represented web crawl, keep all of the scarce
    * code/math, reproducibly).
    *
    * Selection rule (deterministic, engine-independent): order each
    * domain's docs by seeded hash (ties by id); keep a doc iff the token
    * sum of the docs BEFORE it is `< budget` — the greedy fill that
    * admits the boundary-crossing doc and then stops.
    *
    * Scale shape: a naive per-domain window (`partitionBy(domain)`)
    * funnels each domain through ONE task — a 40 TB web-crawl domain is
    * a straight OOM. Instead the running total is a two-phase prefix
    * sum over ORDER-PRESERVING hash-range buckets: bucket boundaries
    * are contiguous in hash order, so per-(domain, bucket) token sums
    * (a tiny aggregate, domains × buckets rows) prefix-scanned per
    * domain give each bucket's exclusive offset, and the within-bucket
    * running total comes from a window partitioned by (domain, bucket)
    * — parallelism = domains × buckets regardless of domain skew. Two
    * shuffles over the corpus (partial-agg'd sums + the bucket window),
    * one broadcast of the offsets.
    *
    * @param budgetOf per-domain token budget (a Column over `domainCol`,
    *                 e.g. an `element_at(typedLit(map), col)` lookup or
    *                 any deterministic expression); docs of domains with
    *                 a NULL budget are dropped
    * @return kept docs: input columns (no helper columns survive)
    */
  def mixtureSample(
      docs: DataFrame,
      idCol: String,
      domainCol: String,
      tokensCol: String,
      budgetOf: Column,
      seed: String = "mix",
      rangeBuckets: Int = 32
  ): DataFrame = {
    require(rangeBuckets > 0, "rangeBuckets must be positive")
    val clash = docs.columns.toSet.intersect(Set(
      "_mix_h", "_mix_b", "_mix_t", "_mix_d", "_mix_bsum", "_mix_off",
      "_mix_run"))
    require(clash.isEmpty,
      s"mixtureSample uses helper columns ${clash.mkString(", ")} — " +
        "rename them on the input first (silent overwrite would corrupt " +
        "the kept set)")
    // h64 is 15 hex digits = a uniform draw from [0, 2^60); an integer
    // division by ceil(2^60 / B) yields B contiguous, order-preserving
    // hash ranges of near-equal expected mass
    val bucketWidth = (1L << 60) / rangeBuckets + 1L
    val t = docs
      .withColumn("_mix_h", h64(seed, col(idCol).cast("string")))
      .withColumn("_mix_b", (col("_mix_h") / lit(bucketWidth)).cast("long"))
      .withColumn("_mix_t", coalesce(col(tokensCol).cast("long"), lit(0L)))
    // phase 1: per-(domain, bucket) token sums — map-side partial agg,
    // the shuffle carries domains x buckets rows; the prefix scan over
    // THAT is a window on a tiny frame
    val offsets = t.groupBy(col(domainCol).as("_mix_d"), col("_mix_b"))
      .agg(sum(col("_mix_t")).as("_mix_bsum"))
      .withColumn("_mix_off",
        coalesce(sum(col("_mix_bsum")).over(
          Window.partitionBy(col("_mix_d")).orderBy(col("_mix_b"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("_mix_bsum")
    // phase 2: within-bucket exclusive running total + the bucket's
    // offset = the doc's global exclusive prefix sum in hash order
    val keepIf = t
      .join(broadcast(offsets),
        col(domainCol) <=> col("_mix_d") && t("_mix_b") === offsets("_mix_b"))
      .drop(offsets("_mix_b")).drop("_mix_d")
      .withColumn("_mix_run",
        col("_mix_off") + coalesce(sum(col("_mix_t")).over(
          Window.partitionBy(col(domainCol), col("_mix_b"))
            .orderBy(col("_mix_h"), col(idCol))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("_mix_run") < budgetOf)
    keepIf.select(docs.columns.map(col).toIndexedSeq: _*)
  }

  /** Deterministic TRAIN/VAL/TEST split — the reproducible holdout
    * assignment every training run needs before anything touches the
    * data: each document lands in exactly one named split, decided by a
    * seeded hash of its id, so (a) the assignment is stable across
    * re-runs, engines, and cluster sizes (no RNG, no `randomSplit`
    * whose outcome depends on partitioning), (b) adding documents never
    * moves an existing document between splits (no leakage of yesterday's
    * test set into today's train set), and (c) any downstream system can
    * recompute membership from the id alone.
    *
    * Rule: `bucket = seededHash(id) mod 1000`; the ordered `splits`
    * per-mille weights carve `[0, 1000)` into contiguous ranges
    * (train 900 / val 50 / test 50 → buckets 0-899 / 900-949 / 950-999).
    *
    * Scale shape: one NARROW per-row projection — zero shuffle, zero
    * driver involvement; the split column composes with partitioned
    * writes (`partitionBy("split")`) so each split lands as its own
    * file set.
    *
    * @param splits ordered (name, permille) weights; must sum to 1000
    * @return input columns + `split`
    */
  def splitAssign(
      docs: DataFrame,
      idCol: String,
      splits: Seq[(String, Int)],
      seed: String = "split"
  ): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "splitAssign needs at least one split with a positive weight")
    require(splits.map(_._2).sum == 1000,
      s"split weights must sum to 1000 permille, got ${splits.map(_._2).sum}")
    require(splits.map(_._1).distinct.size == splits.size,
      "split names must be unique")
    require(!docs.columns.contains("split"),
      "splitAssign writes a `split` column — rename the input's first")
    val bucket = pmod(h64(seed, col(idCol).cast("string")), lit(1000L))
    // fold the ordered weights into a CASE chain over cumulative bounds;
    // the final branch is unconditional so every row lands somewhere
    val bounds = splits.scanLeft(0)(_ + _._2).tail
    val assigned = splits.zip(bounds).dropRight(1)
      .foldLeft(Option.empty[Column]) { case (acc, ((name, _), hi)) =>
        val cond = bucket < hi
        Some(acc.fold(when(cond, name))(_.when(cond, name)))
      }
      .fold(lit(splits.head._1))(_.otherwise(splits.last._1))
    docs.withColumn("split", assigned)
  }

  /** Per-domain frequency cap — the "no domain dominates the corpus"
    * rule of web-corpus curation (RefinedWeb / Dolma cap the documents
    * taken per registered domain): keep at most `cap` documents per
    * `domainCol`, selected by a deterministic pseudo-random priority
    * (md5 of the id) so the kept subset is an unbiased, reproducible
    * sample of each domain rather than its first rows in storage order.
    *
    * Exactly [[graft.operators.TopK.saltedTopK]] under the hood, so a
    * hot domain (the 100 TB failure mode: one domain holds a billion
    * docs) spreads over `salts` tasks in phase 1 and only `salts * cap`
    * survivors reach the per-domain phase-2 window.
    *
    * @return kept docs: input columns + `rnk` (1-based priority rank
    *         within the domain)
    */
  def domainCap(
      docs: DataFrame,
      idCol: String,
      domainCol: String,
      cap: Int,
      salts: Int = 16
  ): DataFrame =
    graft.operators.TopK.saltedTopK(
      docs,
      keys = Seq(domainCol),
      ordering = Seq(md5(col(idCol).cast("string")).asc, col(idCol).asc),
      k = cap,
      saltFrom = col(idCol),
      salts = salts)
}
