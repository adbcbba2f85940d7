package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HYBRID retrieval fusion — combine a lexical ranking (BM25) and a
  * semantic ranking (embedding cosine) for the same queries with
  * Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, "Reciprocal
  * Rank Fusion outperforms Condorcet and individual Rank Learning
  * Methods", SIGIR 2009): each retriever contributes `1 / (C + rank)`
  * and the fused list orders by the sum. RRF is the standard first
  * fusion every hybrid search deployment reaches for because it needs
  * no score calibration — only ranks cross the retriever boundary, so
  * BM25's unbounded scores and cosine's [-1, 1] never have to be
  * reconciled.
  *
  * Integer-exact variant: the contribution is `1e9 div (C + rank)`
  * (floor), so the fused score is a sum of exact longs both engines
  * replay bit-for-bit — no floating-point reciprocals cross the oracle
  * boundary. With C = 60 and ranks ≤ 1000 the fused score of two legs
  * is < 2^25: no overflow anywhere.
  *
  * Scale shape: the inputs are already-ranked TOP-K lists (bounded by
  * queries × k rows — retrieval output, not corpus), so the fusion is
  * a full-outer join + window over a frame whose size is independent
  * of corpus size. The expensive work happened inside the retrievers
  * (which prune: BM25 over a bucket-pruned text index, cosine over a
  * partition-pruned IVF index); fusion cost is O(queries × k).
  */
object HybridSearch {

  /** Fuse two per-query rankings by RRF.
    *
    * @param lex (query_id, doc_id, rnk) — lexical leg, rnk 1-based
    * @param sem (query_id, doc_id, rnk) — semantic leg, rnk 1-based
    * @param c   the RRF damping constant (60 in the paper)
    * @param k   fused results kept per query
    * @return (query_id, rnk, doc_id, rrf_score, lex_rnk, sem_rnk) —
    *         absent-leg ranks surface as 0 (that leg contributed
    *         nothing), ties on the fused score break by doc_id
    */
  def rrfFuse(lex: DataFrame, sem: DataFrame, c: Int = 60, k: Int = 10): DataFrame = {
    require(c >= 0, s"RRF constant must be non-negative, got $c")
    require(k > 0, s"k must be positive, got $k")
    def leg(df: DataFrame, name: String): DataFrame =
      df.select(col("query_id"), col("doc_id"),
        col("rnk").cast("long").as(s"${name}_rnk"))
    val fused = leg(lex, "lex")
      .join(leg(sem, "sem"), Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_score",
        coalesce(expr(s"1000000000L div (${c}L + lex_rnk)"), lit(0L)) +
          coalesce(expr(s"1000000000L div (${c}L + sem_rnk)"), lit(0L)))
    fused
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("rrf_score").desc, col("doc_id"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("doc_id"), col("rrf_score"),
        coalesce(col("lex_rnk"), lit(0L)).as("lex_rnk"),
        coalesce(col("sem_rnk"), lit(0L)).as("sem_rnk"))
  }
}
