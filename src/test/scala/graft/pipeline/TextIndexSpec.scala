package graft.pipeline

import graft.SparkTestSession
import graft.txn.{FileTableCatalog, TableMetadata, TableSnapshot, TableWrites}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** [[TextIndex]]: changelog-driven incremental maintenance of the
  * postings table — atomic replacement, delta stats, markers, and the
  * refusal paths. (The end-to-end bucketed/pruned search over a churned
  * corpus is the `text_index_refresh` oracle query.) */
class TextIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixture(): (String, String) = {
    val corpus = Files.createTempDirectory("graft-tis-corpus").toString
    TableMetadata.commit(corpus, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(corpus,
      Seq((1L, "a b"), (2L, "b c"), (3L, "c d e")).toDF("doc_id", "text")
        .coalesce(1))
    val idx = Files.createTempDirectory("graft-tis-idx").toString
    TableMetadata.commit(idx, TableSnapshot(1, 1, 0, Nil))
    val docs = graft.sources.TableReader.read(spark, corpus)
    TableWrites.appendData(idx, TextIndex.postings(docs).coalesce(1))
    val (n, t) = TextIndex.stats(docs)
    new graft.txn.CommitManager(idx).setTableProperties(Map(
      TextIndex.StatsProp -> s"$n,$t",
      TextIndex.SourceProp -> corpus,
      TextIndex.SyncedProp ->
        FileTableCatalog.loadOrThrow(corpus).version.toString),
      Set.empty,
      expectedSchemaId = FileTableCatalog.loadOrThrow(idx).schemaId)
    (corpus, idx)
  }

  private def postingsOf(idx: String): Set[(String, Long, Long, Long)] =
    graft.sources.TableReader.read(spark, idx)
      .select("term", "doc_id", "dl", "tf")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("refresh is a no-op when current, applies pure-delete churn as " +
    "one commit with exact delta stats, and updates replace postings " +
    "wholesale") {
    val (corpus, idx) = fixture()
    val v0 = FileTableCatalog.loadOrThrow(corpus).version
    // already current: no commit happens
    val idxV0 = FileTableCatalog.loadOrThrow(idx).version
    assert(TextIndex.refresh(spark, corpus, idx) == v0)
    assert(FileTableCatalog.loadOrThrow(idx).version == idxV0)
    // pure delete of doc 3 (dl=3): postings vanish, stats shrink, ONE commit
    TableWrites.appendEqualityDeletes(corpus,
      Seq(3L).toDF("doc_id"), Seq("doc_id"))
    assert(TextIndex.refresh(spark, corpus, idx) ==
      FileTableCatalog.loadOrThrow(corpus).version)
    val after = FileTableCatalog.loadOrThrow(idx)
    assert(after.version == idxV0 + 1, "pure-delete refresh = one commit")
    assert(after.properties(TextIndex.StatsProp) == "2,4")
    assert(postingsOf(idx) == Set(
      ("a", 1L, 2L, 1L), ("b", 1L, 2L, 1L),
      ("b", 2L, 2L, 1L), ("c", 2L, 2L, 1L)))
    // update doc 1 to "a a": old postings replaced, tf=2, stats keep N
    TableWrites.upsert(corpus, Seq((1L, "a a")).toDF("doc_id", "text"),
      keyCols = Seq("doc_id"))
    TextIndex.refresh(spark, corpus, idx)
    assert(FileTableCatalog.loadOrThrow(idx)
      .properties(TextIndex.StatsProp) == "2,4")
    assert(postingsOf(idx) == Set(
      ("a", 1L, 2L, 2L),
      ("b", 2L, 2L, 1L), ("c", 2L, 2L, 1L)))
  }

  test("refresh refuses duplicate doc_ids even when their texts differ " +
    "(netting is per row VALUE — the guard must group per id)") {
    val (corpus, idx) = fixture()
    // two inserts of doc_id 7 with DIFFERENT texts: each row nets to
    // count 1, so a per-row-value guard passes them and the index
    // double-counts the doc (arbitrary dl via first(), summed tf, N+2)
    TableWrites.appendData(corpus,
      Seq((7L, "p q"), (7L, "q r s")).toDF("doc_id", "text").coalesce(1))
    val e = intercept[graft.core.CompactionError.Config] {
      TextIndex.refresh(spark, corpus, idx)
    }
    assert(e.getMessage.contains("not unique per doc_id"))
    // and the index is untouched: marker + stats still at the old version
    assert(FileTableCatalog.loadOrThrow(idx)
      .properties(TextIndex.StatsProp) == "3,7")
  }

  test("refresh still accepts an UPDATE (delete+insert of one id) and " +
    "same-value double-insert stays refused") {
    val (corpus, idx) = fixture()
    // update = delete+insert of the same id: per (id, type) counts are 1
    TableWrites.upsert(corpus, Seq((2L, "b c c")).toDF("doc_id", "text"),
      keyCols = Seq("doc_id"))
    TextIndex.refresh(spark, corpus, idx)
    assert(postingsOf(idx) == Set(
      ("a", 1L, 2L, 1L), ("b", 1L, 2L, 1L),
      ("b", 2L, 3L, 1L), ("c", 2L, 3L, 2L),
      ("c", 3L, 3L, 1L), ("d", 3L, 3L, 1L), ("e", 3L, 3L, 1L)))
    // identical duplicate rows net to one row with count 2: refused too
    TableWrites.appendData(corpus,
      Seq((8L, "t u"), (8L, "t u")).toDF("doc_id", "text").coalesce(1))
    val e = intercept[graft.core.CompactionError.Config] {
      TextIndex.refresh(spark, corpus, idx)
    }
    assert(e.getMessage.contains("not unique per doc_id"))
  }

  test("phraseMatch: anchored position intersection — 3-word phrases, " +
    "overlapping occurrences, repeated-term phrases, empty result") {
    val docs = Seq(
      (1L, "a b c a b c"),   // "a b c" twice
      (2L, "a a a"),         // "a a" at pos 0 and 1 (overlap counts)
      (3L, "a c b"),         // no consecutive "a b"
      (4L, "b c")).toDF("doc_id", "text")
    val pp = TextIndex.positionalPostings(docs)
    def hits(phrase: Seq[String]): Map[Long, Long] =
      TextIndex.phraseMatch(pp, phrase).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits(Seq("a", "b", "c")) == Map(1L -> 2L))
    assert(hits(Seq("a", "a")) == Map(2L -> 2L))
    assert(hits(Seq("b", "c")) == Map(1L -> 2L, 4L -> 1L))
    assert(hits(Seq("c", "a")) == Map(1L -> 1L))
    assert(hits(Seq("a", "c")) == Map(3L -> 1L))
    assert(hits(Seq("z", "a")).isEmpty)
  }

  test("phraseNear: in-order proximity chains — slop 0 equals the " +
    "exact phrase, slop widens the band, out-of-order never matches, " +
    "branching chains all count") {
    val docs = Seq(
      (1L, "a x b"),       // a..b gap 2: slop 1 matches, slop 0 not
      (2L, "a x x x b"),   // gap 4: needs slop >= 3
      (3L, "b x a"),       // out of order: never a match
      (4L, "a b b"),       // branching: a chains to BOTH b's at slop 1
      (5L, "a b c"))       // 3-term chain under slop
      .toDF("doc_id", "text")
    val pp = TextIndex.positionalPostings(docs)
    def hits(phrase: Seq[String], slop: Int): Map[Long, Long] =
      TextIndex.phraseNear(pp, phrase, slop).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // slop 0 == exact phrase
    assert(hits(Seq("a", "b"), 0) == Map(4L -> 1L, 5L -> 1L))
    assert(hits(Seq("a", "b"), 1) == Map(1L -> 1L, 4L -> 2L, 5L -> 1L))
    assert(hits(Seq("a", "b"), 3) ==
      Map(1L -> 1L, 2L -> 1L, 4L -> 2L, 5L -> 1L))
    assert(!hits(Seq("a", "b"), 10).contains(3L), "order is required")
    // 3-term chain: each step's band is relative to the PREVIOUS match
    assert(hits(Seq("a", "b", "c"), 0) == Map(5L -> 1L))
    assert(hits(Seq("a", "x", "b"), 2) ==
      Map(1L -> 1L, 2L -> 3L), "doc 2 branches over three x positions")
  }

  test("refresh refuses an index built over a different corpus, and a " +
    "marker-less index") {
    val (corpus, idx) = fixture()
    val other = Files.createTempDirectory("graft-tis-other").toString
    TableMetadata.commit(other, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(other,
      Seq((9L, "x y")).toDF("doc_id", "text").coalesce(1))
    val e = intercept[graft.core.CompactionError.Config] {
      TextIndex.refresh(spark, other, idx)
    }
    assert(e.getMessage.contains("does not index"))
  }
}
