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

  def run(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // 1. quality gate
    val q = TextAnalysis.quality(docs, "doc_id", "text")
      .filter(col("quality_ok")).select("doc_id")
    val qualityDocs = docs.join(q, "doc_id")

    // 2. exact dedup
    val exactSurvivors = Dedup
      .exact(qualityDocs, col("text"), col("doc_id"))
      .select(col("survivor_id").as("doc_id"))
    val uniqueDocs = qualityDocs.join(exactSurvivors, "doc_id")

    // 3. near-dup pair removal (drop the b side)
    val nearDupLosers = Dedup
      .minhashLsh(uniqueDocs, "doc_id", "text", 32, 4, 500)
      .select(col("b_id").as("doc_id")).distinct()
    val clean = uniqueDocs.join(nearDupLosers, Seq("doc_id"), "left_anti")

    clean.select(col("doc_id"), col("lang"),
        length(col("text")).cast("long").as("n_chars"))
      .orderBy("doc_id")
  }

  val oracle: String =
    """WITH quality_docs AS (
      |  SELECT * FROM documents
      |  WHERE length(text) >= 100
      |    AND floor(1000.0 * len(list_distinct(string_split(text,' ')))
      |          / len(string_split(text,' '))) >= 300
      |),
      |exact_survivors AS (
      |  SELECT min(doc_id) AS doc_id FROM quality_docs GROUP BY text
      |),
      |unique_docs AS (
      |  SELECT q.* FROM quality_docs q JOIN exact_survivors s USING (doc_id)
      |),
      |sh_t AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(generate_series(1, len(string_split(text,' '))-2),
      |      i -> array_to_string((string_split(text,' '))[i:i+2], ' '))) AS sh
      |  FROM unique_docs
      |),
      |sig AS (
      |  SELECT doc_id,
      |    list_transform(generate_series(0, 31),
      |      s -> list_min(list_transform(sh,
      |        x -> CAST(('0x' || substr(md5(s::VARCHAR || ':' || x), 1, 15)) AS BIGINT)))) AS mh,
      |    list_distinct(list_transform(sh,
      |      x -> CAST(('0x' || substr(md5('j:' || x), 1, 15)) AS BIGINT))) AS shh
      |  FROM sh_t),
      |bands AS (
      |  SELECT doc_id, b, array_to_string(mh[b*4+1:b*4+4], ',') AS band_key
      |  FROM sig, generate_series(0, 7) g(b)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM bands a JOIN bands b
      |    ON a.b = b.b AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
      |losers AS (
      |  SELECT DISTINCT b_id AS doc_id
      |  FROM cand JOIN sig x ON cand.a_id = x.doc_id JOIN sig y ON cand.b_id = y.doc_id
      |  WHERE floor(1000.0 * len(list_intersect(x.shh, y.shh))
      |          / len(list_distinct(x.shh || y.shh))) >= 500)
      |SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars
      |FROM unique_docs
      |WHERE doc_id NOT IN (SELECT doc_id FROM losers)
      |ORDER BY doc_id""".stripMargin
}
