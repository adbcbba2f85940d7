package graft.pipeline

import graft.core.CompactionError
import graft.txn.{FileTableCatalog, TableCatalog}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INCREMENTALLY MAINTAINED inverted text index: a postings table
  * (term, doc_id, dl, tf) derived from a graft corpus table and kept in
  * sync by the corpus CHANGELOG — the delta+base design every serving
  * index uses at scale:
  *
  *  - [[refresh]] applies the corpus's net changes since the index's
  *    marker as ONE atomic upsert commit: equality-delete every changed
  *    document's postings, insert the new postings, and advance the
  *    (N, T) corpus constants and the synced-version marker in the SAME
  *    commit — a reader always sees a complete index of SOME corpus
  *    version, never a half-refreshed one. Cost ∝ changed documents
  *    (the netted changelog), never the corpus.
  *  - Refresh commits write UNPARTITIONED delta files (the row-level
  *    upsert path), so term-bucket pruning keeps them alongside the
  *    pruned base buckets — correct, just less prunable. A periodic
  *    compaction rewrites deltas into the table's bucket(term) layout
  *    and restores full pruning (the same fold-the-backlog lifecycle as
  *    streaming auto-compaction).
  *
  * The searcher gates on the marker: serving requires
  * synced-version == corpus current version, so a lagging index is
  * detected, not silently stale.
  */
object TextIndex {

  val StatsProp = "graft.textidx.stats" // "N,T"
  val SourceProp = "graft.textidx.source"
  val SyncedProp = "graft.textidx.synced-version"
  /** Marks a POSITIONAL index ((term, doc_id, pos) rows — the phrase /
    * proximity shape); its refresh re-derives positional postings
    * instead of tf postings and keeps no corpus constants. */
  val PosProp = "graft.textidx.positional"

  /** Postings of a (doc_id, text) frame: one row per (term, doc) with
    * the doc length riding denormalized (BM25 needs it per posting). */
  def postings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("term"))
      .groupBy("term", "doc_id")
      .agg(first(col("dl")).as("dl"), count(lit(1)).as("tf"))
      .select("term", "doc_id", "dl", "tf")

  /** POSITIONAL postings of a (doc_id, text) frame: one row per token
    * OCCURRENCE (term, doc_id, pos) — the index shape phrase and
    * proximity queries need. Written PARTITIONED BY bucket(term) like
    * the tf index, a phrase lookup plans only its terms' buckets. */
  def positionalPostings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
      .select(col("term"), col("doc_id"), col("pos").cast("long").as("pos"))

  /** EXACT PHRASE match over positional postings: documents containing
    * the consecutive token sequence `phrase`, with occurrence counts.
    * The classic inverted-index phrase algorithm: anchor on the first
    * term's positions, then for each later term intersect on
    * (doc_id, pos - offset) — a chain of equi-joins on the uniform
    * (doc, position) key, each step shrinking the candidate set, no
    * window, no per-doc re-scan. Overlapping occurrences all count
    * (positions are distinct by construction). Returns
    * (doc_id, n_hits) for matching docs only. */
  def phraseMatch(postings: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val anchors = postings.filter(col("term") === phrase.head)
      .select(col("doc_id"), col("pos"))
    val matched = phrase.zipWithIndex.drop(1)
      .foldLeft(anchors) { case (acc, (t, i)) =>
        acc.join(postings.filter(col("term") === t)
          .select(col("doc_id"), (col("pos") - i).as("pos")),
          Seq("doc_id", "pos"))
      }
    matched.groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
  }

  /** ORDERED PROXIMITY match (NEAR / slop queries — the Lucene
    * sloppy-phrase shape restricted to in-order matches): the phrase
    * terms must appear IN ORDER, each within `slop` extra positions of
    * the previous matched term (gap 1 = adjacent, so `slop = 0` is the
    * exact phrase; gap <= slop + 1 otherwise). Same shrinking chain of
    * per-term joins as [[phraseMatch]], with a RANGE BAND riding the
    * doc_id equi-join instead of the exact pos-offset key — the band
    * is a filter on the joined rows, so the join still keys on the
    * uniform doc_id column and pruning still plans only the phrase
    * terms' buckets. Counts matching chains per doc (overlapping and
    * branching chains all count — each distinct position path is one
    * hit, the deterministic cross-engine definition). Returns
    * (doc_id, n_hits) for matching docs only. */
  def phraseNear(postings: DataFrame, phrase: Seq[String],
      slop: Int): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    require(slop >= 0, s"slop must be non-negative, got $slop")
    val anchors = postings.filter(col("term") === phrase.head)
      .select(col("doc_id"), col("pos"))
    val matched = phrase.drop(1)
      .foldLeft(anchors) { (acc, t) =>
        acc.join(postings.filter(col("term") === t)
            .select(col("doc_id"), col("pos").as("next_pos")),
          Seq("doc_id"))
          .filter(col("next_pos") > col("pos") &&
            col("next_pos") <= col("pos") + slop + 1)
          .select(col("doc_id"), col("next_pos").as("pos"))
      }
    matched.groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
  }

  /** Corpus constants of a (doc_id, text) frame: (N docs, T tokens). */
  def stats(docs: DataFrame): (Long, Long) = {
    val r = docs.agg(count(lit(1)).as("n"),
      coalesce(sum(size(split(col("text"), " ")).cast("long")), lit(0L))
        .as("t")).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Bring the index at `idxDir` up to the corpus's current version by
    * applying the NET changelog since the index marker, as ONE atomic
    * upsert commit. Returns the new synced corpus version (no-op when
    * already current). The corpus must be keyed by unique `doc_id` —
    * a net multiplicity above 1 means duplicate ids and is refused. */
  def refresh(
      spark: SparkSession,
      corpusDir: String,
      idxDir: String,
      catalog: TableCatalog = FileTableCatalog
  ): Long = {
    val idx = catalog.loadOrThrow(idxDir)
    val Array(n0, t0) = idx.properties.getOrElse(StatsProp,
      throw CompactionError.Config(s"$idxDir carries no $StatsProp"))
      .split(",").map(_.toLong)
    IndexMaintenance.changelogRefresh(spark, corpusDir, idxDir, catalog,
      idx, SourceProp, SyncedProp, corpusIdCol = "doc_id",
      indexKeyCol = "doc_id", indexNoun = "an inverted index") { net =>
      val ins = net.filter(col("_change_type") === "insert")
        .select("doc_id", "text")
      val del = net.filter(col("_change_type") === "delete")
        .select("doc_id", "text")
      // corpus constants advance with the delta — never a corpus rescan
      val dlOf = size(split(col("text"), " ")).cast("long")
      def sum2(df: DataFrame): (Long, Long) = {
        val r = df.agg(count(lit(1)), coalesce(sum(dlOf), lit(0L))).head()
        (r.getLong(0), r.getLong(1))
      }
      val (nIns, tIns) = sum2(ins)
      val (nDel, tDel) = sum2(del)
      (postings(ins),
        Map(StatsProp -> s"${n0 + nIns - nDel},${t0 + tIns - tDel}"))
    }
  }

  /** Bring a POSITIONAL index ([[positionalPostings]] rows, marked by
    * [[PosProp]]) up to the corpus's current version — the same
    * one-atomic-commit changelog catch-up as [[refresh]], minus the
    * (N, T) constants a phrase lookup never needs: equality-delete
    * every changed document's occurrence rows, insert the re-derived
    * positional postings, advance the marker. Cost ∝ changed docs. */
  def refreshPositional(
      spark: SparkSession,
      corpusDir: String,
      idxDir: String,
      catalog: TableCatalog = FileTableCatalog
  ): Long = {
    val idx = catalog.loadOrThrow(idxDir)
    if (!idx.properties.contains(PosProp))
      throw CompactionError.Config(
        s"$idxDir is not a positional index (no $PosProp)")
    IndexMaintenance.changelogRefresh(spark, corpusDir, idxDir, catalog,
      idx, SourceProp, SyncedProp, corpusIdCol = "doc_id",
      indexKeyCol = "doc_id", indexNoun = "a positional index") { net =>
      val ins = net.filter(col("_change_type") === "insert")
        .select("doc_id", "text")
      (positionalPostings(ins), Map.empty)
    }
  }
}
