package graft.queries

import graft.pipeline.{Dedup, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Capstone composition — the full corpus-cleaning pipeline a
  * training-data run executes, as ONE oracle-checked query:
  *
  *  1. quality gate: >= 100 chars and >= 30% distinct words;
  *  2. exact dedup: keep min doc_id per identical text;
  *  3. near-dup removal: MinHash-LSH pairs (32 hashes, 8x4 bands,
  *     verified jaccard >= 0.5) among the survivors; greedily drop the
  *     higher doc_id of each pair (deterministic, SQL-expressible — a
  *     connected-components pass would need iteration);
  *  4. emit surviving (doc_id, lang, n_chars).
  *
  * Every stage is a previously-verified operator; the value here is the
  * composed plan: the gates are narrow row filters that prune BEFORE the
  * dedup shuffles, so each stage's cost shrinks with the previous
  * stage's selectivity — the property that matters at 100 TB.
  */
object CorpusPipelineQuery {

  /** Stages 1-2: quality gate + exact dedup. The survivor frame feeds the
    * LSH self-join (both sides), the verification lookups, and the final
    * anti-join — persist it so the upstream join and shingling run once,
    * not per reference. The cached frame is small (the deduped corpus
    * keys); it lives until the session ends, which matches the one-shot
    * Verify/Bench drivers. */
  private def uniqueDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val qualityDocs = docs.filter(TextAnalysis.qualityOk(col("text")))
    val exactSurvivors = Dedup
      .exact(qualityDocs, col("text"), col("doc_id"))
      .select(col("survivor_id").as("doc_id"))
    qualityDocs.join(exactSurvivors, "doc_id").persist()
  }

  private def finish(clean: DataFrame): DataFrame =
    clean.select(col("doc_id"), col("lang"),
        length(col("text")).cast("long").as("n_chars"))
      .orderBy("doc_id")

  def run(spark: SparkSession, dir: String): DataFrame = {
    val unique = uniqueDocs(spark, dir)
    // 3. near-dup pair removal (greedily drop the b side)
    val nearDupLosers = Dedup
      .minhashLsh(unique, "doc_id", "text", 32, 4, 500)
      .select(col("b_id").as("doc_id")).distinct()
    finish(unique.join(nearDupLosers, Seq("doc_id"), "left_anti"))
  }

  /** The connected-components variant: near-dup pairs form an undirected
    * graph; each component keeps exactly its MINIMUM doc_id. Unlike the
    * greedy pair-drop above (which keeps every node that never appears on
    * a pair's b side), transitive chains collapse to one survivor — pairs
    * (A,C) and (B,C) keep only A, where the greedy form over-keeps B. */
  def runCC(spark: SparkSession, dir: String): DataFrame = {
    val unique = uniqueDocs(spark, dir)
    val pairs = Dedup.minhashLsh(unique, "doc_id", "text", 32, 4, 500)
      .select("a_id", "b_id")
    val comps = Dedup.connectedComponents(pairs)
    val losers = comps.filter(col("comp") =!= col("id"))
      .select(col("id").as("doc_id"))
    finish(unique.join(losers, Seq("doc_id"), "left_anti"))
  }

  /** CURATION composition over the round-12 operators, as ONE plan:
    * quality gate → per-source frequency cap (15 docs/source by md5
    * priority — the dominance rule) → EXACT SUBSTRING dedup over the
    * survivors (6-gram windows, duplicated spans spliced out,
    * md5-certified). Ordering matters at 100 TB: both gates are a
    * narrow filter + a salted top-k BEFORE the dedup's gram explode, so
    * the expensive stage sees only capped, quality-passed data. */
  def runCurate(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val gated = docs.filter(TextAnalysis.qualityOk(col("text")))
      .select("doc_id", "source", "text")
    val capped = graft.pipeline.Export
      .domainCap(gated, "doc_id", "source", cap = 15)
      .select("doc_id", "text")
    Dedup.substringDedup(capped, "doc_id", "text", minTokens = 6)
      .orderBy("doc_id")
  }

  val curateOracle: String =
    s"""WITH q AS (
      |  SELECT doc_id, source, text FROM documents
      |  WHERE ${QuerySql.qualityPredicate}),
      |r AS (
      |  SELECT doc_id, text,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
      |  FROM q),
      |p0 AS (
      |  SELECT doc_id, string_split(text,' ') AS toks
      |  FROM r WHERE rnk <= 15),
      |g AS (
      |  SELECT doc_id, unnest(list_transform(
      |    generate_series(1, len(toks)-5),
      |    i -> {'pos': i, 'gram': array_to_string(toks[i:i+5], ' ')})) AS u
      |  FROM p0 WHERE len(toks) >= 6),
      |inst AS (SELECT doc_id, u.pos AS pos, u.gram AS gram FROM g),
      |dup AS (SELECT gram FROM inst GROUP BY gram HAVING count(*) >= 2),
      |cov AS (SELECT DISTINCT doc_id, unnest(generate_series(pos, pos+5)) AS tp
      |        FROM inst JOIN dup USING (gram)),
      |tok AS (
      |  SELECT doc_id, u.tp AS tp, u.tok AS tok FROM (
      |    SELECT doc_id, unnest(list_transform(
      |      generate_series(1, len(toks)),
      |      i -> {'tp': i, 'tok': toks[i]})) AS u
      |    FROM p0)),
      |kept AS (
      |  SELECT t.doc_id, t.tp, t.tok
      |  FROM tok t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.tp = c.tp
      |  WHERE c.tp IS NULL),
      |ka AS (
      |  SELECT doc_id, count(*) AS n_kept,
      |    md5(string_agg(tok, ' ' ORDER BY tp)) AS kd
      |  FROM kept GROUP BY doc_id)
      |SELECT p0.doc_id,
      |  CAST(len(p0.toks) AS BIGINT) AS n_tokens,
      |  CAST(len(p0.toks) - coalesce(ka.n_kept, 0) AS BIGINT) AS n_removed,
      |  coalesce(ka.kd, md5('')) AS kept_digest
      |FROM p0 LEFT JOIN ka USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** CURATION v2 — the composition with the CONTAINMENT stage: quality
    * gate → per-source frequency cap → containment-based EXCERPT
    * removal (prefix-filtered exact pairs at >= 90%, drop the smaller
    * side — the excerpt/truncation a symmetric near-dup pass
    * structurally misses) → exact substring dedup of the survivors.
    * Truncated twins (first 30 tokens of every %9 doc, id + 200000) are
    * PLANTED before the gates so the containment stage provably fires;
    * the oracle plants identically and replays all four stages in one
    * statement. Stage order at 100 TB: both gates and the excerpt drop
    * are narrow filters/anti-joins BEFORE the substring dedup's gram
    * explode — the expensive stage sees only capped, quality-passed,
    * excerpt-free data. */
  def runCurateV2(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val planted = docs.filter(col("doc_id") % 9 === 0)
      .select((col("doc_id") + 200000L).as("doc_id"), col("source"),
        col("lang"),
        array_join(slice(split(col("text"), " "), 1, 30), " ").as("text"))
    val base = docs.select("doc_id", "source", "lang", "text")
      .unionByName(planted)
    val gated = base.filter(TextAnalysis.qualityOk(col("text")))
    val capped = graft.pipeline.Export
      .domainCap(gated, "doc_id", "source", cap = 15)
      .select("doc_id", "lang", "text")
    val losers = Dedup.containmentLosers(capped, "doc_id", "text", "lang",
      thresholdX1000 = 900)
    val kept = capped.join(losers, Seq("doc_id"), "left_anti")
    Dedup.substringDedup(kept.select("doc_id", "text"), "doc_id", "text",
        minTokens = 6)
      .orderBy("doc_id")
  }

  /** [[runCurateV2]]'s oracle: planted twins + quality gate + cap (the
    * curateOracle chain) + the exact containment pairs with the
    * smaller-side drop rule + the substring-dedup replay — four stages,
    * one statement. */
  val curateV2Oracle: String =
    s"""WITH base AS (
      |  SELECT doc_id, source, lang, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 200000 AS doc_id, source, lang,
      |    array_to_string((string_split(text, ' '))[1:30], ' ') AS text
      |  FROM documents WHERE doc_id % 9 = 0),
      |q AS (
      |  SELECT doc_id, source, lang, text FROM base
      |  WHERE ${QuerySql.qualityPredicate}),
      |r AS (
      |  SELECT doc_id, lang, text,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
      |  FROM q),
      |cdocs AS (SELECT doc_id, lang, text FROM r WHERE rnk <= 15),
      |${QuerySql.shinglesCteFrom("cdocs")},
      |hs AS (
      |  SELECT doc_id, lang,
      |    list_distinct(list_transform(sh, x -> ${QuerySql.h64("'j:' || x")})) AS shh
      |  FROM sh_t WHERE len(sh) > 0),
      |pairs AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |    len(a.shh) AS a_sz, len(b.shh) AS b_sz
      |  FROM hs a JOIN hs b ON a.lang = b.lang AND a.doc_id < b.doc_id
      |  WHERE (len(list_intersect(a.shh, b.shh)) * 1000)
      |      // least(len(a.shh), len(b.shh)) >= 900),
      |losers AS (
      |  SELECT DISTINCT CASE WHEN a_sz < b_sz THEN a_id
      |    WHEN b_sz < a_sz THEN b_id
      |    ELSE greatest(a_id, b_id) END AS doc_id
      |  FROM pairs),
      |p0 AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM cdocs
      |  WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
      |g AS (
      |  SELECT doc_id, unnest(list_transform(
      |    generate_series(1, len(toks)-5),
      |    i -> {'pos': i, 'gram': array_to_string(toks[i:i+5], ' ')})) AS u
      |  FROM p0 WHERE len(toks) >= 6),
      |inst AS (SELECT doc_id, u.pos AS pos, u.gram AS gram FROM g),
      |dup AS (SELECT gram FROM inst GROUP BY gram HAVING count(*) >= 2),
      |cov AS (SELECT DISTINCT doc_id, unnest(generate_series(pos, pos+5)) AS tp
      |        FROM inst JOIN dup USING (gram)),
      |tok AS (
      |  SELECT doc_id, u.tp AS tp, u.tok AS tok FROM (
      |    SELECT doc_id, unnest(list_transform(
      |      generate_series(1, len(toks)),
      |      i -> {'tp': i, 'tok': toks[i]})) AS u
      |    FROM p0)),
      |kept AS (
      |  SELECT t.doc_id, t.tp, t.tok
      |  FROM tok t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.tp = c.tp
      |  WHERE c.tp IS NULL),
      |ka AS (
      |  SELECT doc_id, count(*) AS n_kept,
      |    md5(string_agg(tok, ' ' ORDER BY tp)) AS kd
      |  FROM kept GROUP BY doc_id)
      |SELECT p0.doc_id,
      |  CAST(len(p0.toks) AS BIGINT) AS n_tokens,
      |  CAST(len(p0.toks) - coalesce(ka.n_kept, 0) AS BIGINT) AS n_removed,
      |  coalesce(ka.kd, md5('')) AS kept_digest
      |FROM p0 LEFT JOIN ka USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** THE FULL TRAINING-DATA LAYOUT in one composed plan: quality gate →
    * exact dedup → minhash-LSH near-dup removal → benchmark
    * decontamination (every 17th original doc is the planted benchmark)
    * → token counting → greedy 256-token sequence packing → shuffled
    * shard coordinates. Each stage is a previously-verified operator;
    * the output row is a surviving document's complete destiny:
    * (pack bucket, pack, position-in-pack, shard, sequence-in-shard).
    * The scale property the composition preserves: every gate is a
    * narrow filter/anti-join BEFORE the next stage's shuffle, so each
    * stage's cost shrinks with the previous stage's selectivity. */
  def runToShards(spark: SparkSession, dir: String): DataFrame = {
    val unique = uniqueDocs(spark, dir)
    val nearDupLosers = Dedup
      .minhashLsh(unique, "doc_id", "text", 32, 4, 500)
      .select(col("b_id").as("doc_id")).distinct()
    val clean = unique.join(nearDupLosers, Seq("doc_id"), "left_anti")
    val benchmark = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 17 === 0)
    val contaminated = TextAnalysis
      .contamination(clean, benchmark, "doc_id", "text", n = 5)
      .select("doc_id")
    val survivors = clean.join(contaminated, Seq("doc_id"), "left_anti")
      .persist()
    try {
      val toks = TextAnalysis.tokenCounts(survivors, "doc_id", "text")
        .select(col("doc_id"), col("n_ws_tokens"))
      val packed = graft.pipeline.Packing.packSequences(
        toks, "doc_id", "n_ws_tokens", budget = 256L, buckets = 8)
      val shards = graft.pipeline.Export.shuffleShards(
        survivors.select("doc_id"), "doc_id", shards = 8)
      packed.join(shards, Seq("doc_id"))
        .select("doc_id", "bucket", "pack", "pack_pos", "shard", "seq")
        .orderBy("doc_id")
    } finally survivors.unpersist()
  }

  /** [[runToShards]]'s oracle: the corpus_clean CTE chain extended by
    * the decontamination join, the recursive greedy pack replay, and
    * the shard-coordinate window — one SQL statement replaying the
    * whole pipeline. */
  val toShardsOracle: String = {
    val g5 = "list_distinct(list_transform(" +
      "generate_series(1, len(string_split(text,' '))-4), " +
      "i -> array_to_string((string_split(text,' '))[i:i+4], ' ')))"
    s"""WITH RECURSIVE quality_docs AS (
       |  SELECT * FROM documents
       |  WHERE ${QuerySql.qualityPredicate}
       |),
       |exact_survivors AS (
       |  SELECT min(doc_id) AS doc_id FROM quality_docs GROUP BY text
       |),
       |unique_docs AS (
       |  SELECT q.* FROM quality_docs q JOIN exact_survivors s USING (doc_id)
       |),
       |${QuerySql.shinglesCteFrom("unique_docs")},
       |${QuerySql.minhashSigCte},
       |${QuerySql.minhashCandCte},
       |losers AS (
       |  SELECT DISTINCT b_id AS doc_id
       |  FROM cand JOIN sig x ON cand.a_id = x.doc_id JOIN sig y ON cand.b_id = y.doc_id
       |  WHERE ${QuerySql.jaccardXY} >= 500),
       |clean AS (
       |  SELECT * FROM unique_docs
       |  WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
       |g5c AS (SELECT doc_id, unnest($g5) AS g FROM clean),
       |eg AS (SELECT DISTINCT unnest($g5) AS g
       |       FROM documents WHERE doc_id % 17 = 0),
       |contaminated AS (SELECT DISTINCT doc_id FROM g5c JOIN eg USING (g)),
       |survivors AS (
       |  SELECT * FROM clean
       |  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
       |docs AS (
       |  SELECT doc_id, doc_id % 8 AS bucket,
       |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
       |    row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
       |  FROM survivors),
       |packed AS (
       |  SELECT doc_id, bucket, n_tokens, rn,
       |    CAST(0 AS BIGINT) AS pack, CAST(0 AS BIGINT) AS pack_pos,
       |    n_tokens AS fill
       |  FROM docs WHERE rn = 1
       |  UNION ALL
       |  SELECT d.doc_id, d.bucket, d.n_tokens, d.rn,
       |    CASE WHEN p.fill + d.n_tokens <= 256 THEN p.pack
       |         ELSE p.pack + 1 END,
       |    CASE WHEN p.fill + d.n_tokens <= 256 THEN p.pack_pos + 1
       |         ELSE CAST(0 AS BIGINT) END,
       |    CASE WHEN p.fill + d.n_tokens <= 256 THEN p.fill + d.n_tokens
       |         ELSE d.n_tokens END
       |  FROM docs d JOIN packed p ON d.bucket = p.bucket AND d.rn = p.rn + 1),
       |sh AS (SELECT doc_id, ${QuerySql.h64("'shuf:' || doc_id")} AS h
       |       FROM survivors),
       |shards AS (
       |  SELECT doc_id, h % 8 AS shard,
       |    CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id)
       |      AS BIGINT) AS seq
       |  FROM sh)
       |SELECT p.doc_id, p.bucket, p.pack, p.pack_pos, s.shard, s.seq
       |FROM packed p JOIN shards s USING (doc_id)
       |ORDER BY p.doc_id""".stripMargin
  }

  /** CC oracle: min-reachable-id via recursive CTE — the same fixpoint
    * (component minimum) the Spark label propagation converges to. */
  val ccOracle: String =
    s"""WITH RECURSIVE quality_docs AS (
       |  SELECT * FROM documents
       |  WHERE ${QuerySql.qualityPredicate}
       |),
       |exact_survivors AS (
       |  SELECT min(doc_id) AS doc_id FROM quality_docs GROUP BY text
       |),
       |unique_docs AS (
       |  SELECT q.* FROM quality_docs q JOIN exact_survivors s USING (doc_id)
       |),
       |${QuerySql.shinglesCteFrom("unique_docs")},
       |${QuerySql.minhashSigCte},
       |${QuerySql.minhashCandCte},
       |pairs AS (
       |  SELECT a_id, b_id
       |  FROM cand JOIN sig x ON cand.a_id = x.doc_id JOIN sig y ON cand.b_id = y.doc_id
       |  WHERE ${QuerySql.jaccardXY} >= 500),
       |edges AS (
       |  SELECT a_id AS src, b_id AS dst FROM pairs
       |  UNION SELECT b_id, a_id FROM pairs),
       |reach(id, r) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id),
       |comp AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
       |cc_losers AS (SELECT id AS doc_id FROM comp WHERE comp <> id)
       |SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars
       |FROM unique_docs
       |WHERE doc_id NOT IN (SELECT doc_id FROM cc_losers)
       |ORDER BY doc_id""".stripMargin

  val oracle: String =
    s"""WITH quality_docs AS (
       |  SELECT * FROM documents
       |  WHERE ${QuerySql.qualityPredicate}
       |),
       |exact_survivors AS (
       |  SELECT min(doc_id) AS doc_id FROM quality_docs GROUP BY text
       |),
       |unique_docs AS (
       |  SELECT q.* FROM quality_docs q JOIN exact_survivors s USING (doc_id)
       |),
       |${QuerySql.shinglesCteFrom("unique_docs")},
       |${QuerySql.minhashSigCte},
       |${QuerySql.minhashCandCte},
       |losers AS (
       |  SELECT DISTINCT b_id AS doc_id
       |  FROM cand JOIN sig x ON cand.a_id = x.doc_id JOIN sig y ON cand.b_id = y.doc_id
       |  WHERE ${QuerySql.jaccardXY} >= 500)
       |SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars
       |FROM unique_docs
       |WHERE doc_id NOT IN (SELECT doc_id FROM losers)
       |ORDER BY doc_id""".stripMargin
}
