package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** SEQUENCE PACKING for LLM training data: assign documents to
  * fixed-token-budget training sequences ("packs") with the classic
  * greedy first-fit-in-order rule, so a corpus becomes context-window
  * payloads with bounded waste and ZERO driver-side iteration.
  *
  * Scale shape: packing is inherently order-sequential, so the engine's
  * job is to make the sequential unit SMALL and the units independent —
  * documents route to `buckets` deterministic buckets (`doc_id mod B`),
  * one shuffle co-locates and orders each bucket, and a per-partition
  * pass fills packs greedily. At 100 TB the bucket count is the
  * parallelism knob (thousands of buckets = thousands of independent
  * sequential fills); determinism (bucket route + doc_id order) makes
  * the layout reproducible run-over-run, which training-data lineage
  * requires.
  *
  * Semantics, pinned by the `sequence_pack` oracle (a DuckDB recursive
  * CTE replays the same greedy fill):
  *  - within a bucket, docs are processed in ascending `doc_id`;
  *  - a doc joins the current pack iff `fill + n_tokens <= budget`,
  *    else it STARTS the next pack (docs never split);
  *  - an oversized doc (n_tokens > budget) occupies a pack alone.
  */
object Packing {

  /** @return (doc_id, bucket, pack, pack_pos) — pack ids are dense per
    *         bucket starting at 0; pack_pos is the doc's position
    *         within its pack. */
  def packSequences(
      docs: DataFrame,
      idCol: String,
      tokensCol: String,
      budget: Long,
      buckets: Int
  ): DataFrame = {
    require(budget > 0, "token budget must be positive")
    require(buckets > 0, "bucket count must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val t = docs.select(
      col(idCol).cast("long").as("doc_id"),
      pmod(col(idCol), lit(buckets.toLong)).cast("long").as("bucket"),
      col(tokensCol).cast("long").as("n_tokens"))
    // ONE shuffle: co-locate each bucket and order it; several buckets
    // may hash into one partition, so the fill state resets on every
    // bucket boundary (rows arrive bucket-ordered within the partition)
    val ordered: Dataset[(Long, Long, Long)] = t
      .repartition(buckets, col("bucket"))
      .sortWithinPartitions("bucket", "doc_id")
      .as[(Long, Long, Long)]
    ordered.mapPartitions { rows =>
        var curBucket = -1L
        var pack = -1L
        var pos = -1L
        var fill = 0L
        rows.map { case (docId, bucket, nTokens) =>
          if (bucket != curBucket) {
            curBucket = bucket; pack = -1L; fill = 0L
          }
          if (fill + nTokens <= budget && pack >= 0) {
            fill += nTokens; pos += 1
          } else {
            pack += 1; pos = 0; fill = nTokens
          }
          (docId, bucket, pack, pos)
        }
      }
      .toDF("doc_id", "bucket", "pack", "pack_pos")
  }
}
