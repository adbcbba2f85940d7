package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared column expressions for the text/dedup pipeline.
  *
  * Everything here is DETERMINISTIC and cross-engine reproducible: hashes
  * are derived from md5 hex (identical in any engine), not from
  * engine-native hash functions, so the DuckDB oracle can replay them
  * bit-for-bit. For 100 TB production runs, swap [[hash64]] for Spark's
  * codegen'd `xxhash64` (same shape, ~10x cheaper) — the md5 form is the
  * oracle-checked reference semantics.
  *
  * All builders are pure `Column` functions (no UDFs): they stay inside
  * Catalyst, get column-pruned, and their inputs push down to the parquet
  * scan.
  */
object TextFunctions {

  /** Whitespace tokens. */
  def words(text: Column): Column = split(text, " ")

  /** Distinct 3-word shingles (native expression — one compiled pass;
    * [[shingles3Hof]] is the HOF twin for cross-validation). */
  def shingles3(text: Column): Column =
    graft.functions.HashColumns.shingles(text, 3)

  /** HOF form of [[shingles3]]. Guarded for <3 words (empty result, the
    * same as a generate_series-based SQL formulation). */
  def shingles3Hof(text: Column): Column = {
    val w = words(text)
    when(size(w) >= 3,
      array_distinct(transform(sequence(lit(1), size(w) - 2),
        i => concat_ws(" ", slice(w, i, lit(3))))))
      .otherwise(array().cast("array<string>"))
  }

  /** 60-bit deterministic hash: first 15 hex digits of md5("<seed>:<s>").
    * Cross-engine: DuckDB `CAST(('0x'||substr(md5(seed||':'||s),1,15)) AS BIGINT)`. */
  def hash64(seed: Column, s: Column): Column =
    conv(substr(md5(concat(seed.cast("string"), lit(":"), s)), lit(1), lit(15)), 16, 10)
      .cast("long")

  /** MinHash signature: for each of `numHashes` seeds, the min [[hash64]]
    * over the feature set. One pass over the row, no shuffle. Delegates
    * to the native expression; [[minhashSignatureHof]] is the pure-HOF
    * twin kept for cross-validation (same values, ~20x slower). */
  def minhashSignature(features: Column, numHashes: Int): Column =
    graft.functions.HashColumns.minhashSignature(features, numHashes)

  /** Interpreted HOF form of [[minhashSignature]] (oracle-shape twin). */
  def minhashSignatureHof(features: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      s => array_min(transform(features, x => hash64(s, x))))

  /** 32-bit SimHash over a feature set: bit j is set iff the sum over
    * features of (bit j of hash -> +-1) is positive. Returned as long.
    * Native expression; [[simhash32Hof]] is the SQL-form twin. */
  def simhash32(features: Column): Column =
    graft.functions.HashColumns.simhash32(features)

  /** SQL-HOF form of [[simhash32]] over a named column (the variable
    * shift amounts need the SQL form; kept for cross-validation). */
  def simhash32Hof(featuresColName: String): Column = expr(
    s"""aggregate(
       |  transform(sequence(0, 31), j ->
       |    CASE WHEN aggregate(
       |      transform($featuresColName, x ->
       |        (shiftright(CAST(conv(substr(md5(concat('s:', x)), 1, 15), 16, 10) AS BIGINT), j) & 1L) * 2L - 1L),
       |      0L, (acc, v) -> acc + v) > 0
       |    THEN shiftleft(1L, j) ELSE 0L END),
       |  0L, (acc, v) -> acc + v)""".stripMargin)

  /** Jaccard similarity of two DISTINCT-element arrays, scaled x1000 and
    * floored to a long (exact integer output — float-hash-safe). */
  def jaccardX1000(a: Column, b: Column): Column =
    floor(lit(1000.0) * size(array_intersect(a, b)) / size(array_union(a, b)))
      .cast("long")

  /** [[jaccardX1000]] over SORTED distinct arrays: one fused native
    * two-pointer pass — identical values, no intermediate arrays, single
    * evaluation even inside pushed join predicates. */
  def jaccardX1000Sorted(aSorted: Column, bSorted: Column): Column =
    graft.functions.HashColumns.jaccardX1000(aSorted, bSorted)

  /** Cosine similarity of two float-array columns, computed in double with
    * a sequential pass (deterministic order). Native expression;
    * [[cosineHof]] is the HOF twin with the identical fold order. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.HashColumns.cosineSim(a, b)

  /** Interpreted HOF form of [[cosine]] (cross-validation twin). */
  def cosineHof(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }
}
