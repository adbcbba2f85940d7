package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window document CHUNKING — the retrieval/RAG preparation
  * step that turns long documents into fixed-size overlapping passages
  * (the unit embeddings are computed over and search serves back).
  *
  * Chunk `i` covers tokens `[i*stride, i*stride + chunkSize)`; windows
  * start at `0, stride, 2*stride, …` and the count is chosen so every
  * token is covered exactly once past the overlap:
  * `nChunks = 1 + ceil((nTokens - chunkSize) / stride)` (min 1 — an
  * empty or short document is one chunk). `stride < chunkSize` gives
  * the usual overlap so no sentence is split across a hard boundary
  * without also appearing whole in a neighbor.
  *
  * Scale shape (the 100 TB contract): one NARROW per-row transform —
  * `split` → `transform(sequence(...))` → `explode` — all built-in
  * codegen'd functions, zero shuffle, zero UDFs; output size is
  * O(input tokens × chunkSize/stride), decided row-locally. The chunk
  * id is a stable (doc_id, chunk_id) coordinate downstream indexes key
  * on.
  */
object Chunker {

  /** Explode `textCol` into overlapping whitespace-token windows.
    *
    * @return (idCol, chunk_id, n_tokens, chunk_text) — `chunk_id`
    *         0-based, `n_tokens` the chunk's own token count (only the
    *         final chunk may be short)
    */
  def chunk(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      stride: Int
  ): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    require(stride > 0 && stride <= chunkSize,
      s"stride must be in [1, chunkSize], got $stride")
    // literal-space split, empty tokens dropped — matches the corpus
    // tokenization used everywhere else in the pipeline (and DuckDB's
    // string_split + list_filter twin exactly)
    val toks = filter(split(col(textCol), " "), t => t =!= lit(""))
    val n = size(col("_ck_toks")).cast("long")
    // ceil((n - chunkSize) / stride) as exact integer math: operands
    // are small positive longs, so the double division floors exactly
    val nChunks = when(n <= chunkSize, lit(1L))
      .otherwise(lit(1L) +
        floor((n - chunkSize + (stride - 1)) / lit(stride)).cast("long"))
    val windows: Column = transform(
      sequence(lit(0L), col("_ck_n") - 1L),
      i => struct(
        i.as("chunk_id"),
        slice(col("_ck_toks"), (i * stride + 1).cast("int"), lit(chunkSize))
          .as("ctoks")))
    docs
      .withColumn("_ck_toks", toks)
      .withColumn("_ck_n", nChunks)
      .select(col(idCol), explode(windows).as("_ck_w"))
      .select(
        col(idCol),
        col("_ck_w.chunk_id").as("chunk_id"),
        size(col("_ck_w.ctoks")).cast("long").as("n_tokens"),
        array_join(col("_ck_w.ctoks"), " ").as("chunk_text"))
  }

  /** Chunks-per-doc capacity of [[chunkKey]]'s packed coordinate. */
  val KeySpace: Long = 1000000L

  /** Largest doc_id [[chunkKey]] can pack without Long overflow. */
  val MaxDocId: Long = (Long.MaxValue - (KeySpace - 1)) / KeySpace

  /** Pack a (doc_id, chunk_id) coordinate into the single Long key
    * downstream indexes use: `doc_id * 1e6 + chunk_id`. The 1e6 key
    * space supports docs of 48M+ tokens at the default 48-stride; a
    * coordinate beyond EITHER bound RAISES instead of silently
    * colliding/corrupting posting keys (chunk_id ≥ 1e6 would collide
    * two passages; doc_id above [[MaxDocId]] — or negative — would
    * let the product overflow the Long). Both guards are codegen'd
    * conditionals — no extra pass. */
  def chunkKey(docId: Column, chunkId: Column): Column =
    when(chunkId.between(0L, KeySpace - 1) && docId.between(0L, MaxDocId),
      docId * KeySpace + chunkId)
      .otherwise(raise_error(concat(
        lit("chunk key (doc_id, chunk_id) outside the 1e6 key space: ("),
        docId, lit(", "), chunkId, lit(")"))).cast("long"))
}
