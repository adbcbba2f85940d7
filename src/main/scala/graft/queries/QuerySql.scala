package graft.queries

/** Shared DuckDB-oracle SQL fragments — ONE definition of the cross-engine
  * hash and shingle formulas (the Spark twins live in
  * graft.pipeline.TextFunctions / graft.functions.Hash64; change all
  * three together). */
object QuerySql {

  /** 60-bit hash: first 15 md5 hex digits as int64 —
    * the SQL twin of [[graft.functions.Hash64.hash64]]. */
  def h64(arg: String): String =
    s"CAST(('0x' || substr(md5($arg), 1, 15)) AS BIGINT)"

  /** Distinct 3-word shingles of `text` from a given source relation —
    * the SQL twin of TextFunctions.shingles3. Emits a CTE body named
    * `sh_t` with (doc_id, lang, sh). */
  def shinglesCteFrom(source: String): String =
    s"""sh_t AS (
       |  SELECT doc_id, lang,
       |    list_distinct(list_transform(generate_series(1, len(string_split(text,' '))-2),
       |      i -> array_to_string((string_split(text,' '))[i:i+2], ' '))) AS sh
       |  FROM $source
       |)""".stripMargin

  /** The MinHash signature + hashed-shingle-set CTE (`sig`) over `sh_t` —
    * 32 seeds, the SQL twin of MinHashSignatureExpr + HashedSetExpr. */
  val minhashSigCte: String =
    s"""sig AS (
       |  SELECT doc_id,
       |    list_transform(generate_series(0, 31),
       |      s -> list_min(list_transform(sh, x -> ${h64("s::VARCHAR || ':' || x")}))) AS mh,
       |    list_distinct(list_transform(sh, x -> ${h64("'j:' || x")})) AS shh
       |  FROM sh_t)""".stripMargin

  /** LSH banding + candidate pairs (8 bands of 4) over `sig`. */
  val minhashCandCte: String =
    """bands AS (
      |  SELECT doc_id, b, array_to_string(mh[b*4+1:b*4+4], ',') AS band_key
      |  FROM sig, generate_series(0, 7) g(b)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM bands a JOIN bands b
      |    ON a.b = b.b AND a.band_key = b.band_key AND a.doc_id < b.doc_id)""".stripMargin

  /** Hashed-set jaccard x1000 formula between sig aliases x and y. */
  val jaccardXY: String =
    "floor(1000.0 * len(list_intersect(x.shh, y.shh)) / len(list_distinct(x.shh || y.shh)))"

  /** The quality-gate predicate (length + distinct-word ratio) used by
    * text_quality and the corpus pipeline. */
  val qualityPredicate: String =
    """length(text) >= 100
      |    AND floor(1000.0 * len(list_distinct(string_split(text,' ')))
      |          / len(string_split(text,' '))) >= 300""".stripMargin
}
