package graft.pipeline

import graft.SparkTestSession
import graft.streaming.StreamingIngest
import graft.txn.{FileTableCatalog, TableMetadata, TableSnapshot, TableWrites}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** [[IndexMaintenance]] + [[StreamingIngest.withIndexMaintenance]]:
  * registry round-trip, kind dispatch (text vs ANN), inline refresh
  * per committed batch, stale-not-wrong failure semantics, replay
  * no-op. (The end-to-end bucketed/pruned streamed search is the
  * `text_index_stream` oracle query.) */
class IndexMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def textCorpusAndIndex(): (String, String) = {
    val corpus = Files.createTempDirectory("graft-ims-corpus").toString
    TableMetadata.commit(corpus, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(corpus,
      Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text").coalesce(1))
    val idx = Files.createTempDirectory("graft-ims-idx").toString
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

  test("registry round-trips, de-dups, and unregister drops the prop " +
    "when empty") {
    val (corpus, idx) = textCorpusAndIndex()
    IndexMaintenance.register(corpus, idx)
    IndexMaintenance.register(corpus, idx) // idempotent
    assert(FileTableCatalog.loadOrThrow(corpus)
      .properties(IndexMaintenance.RegisteredProp) == idx)
    IndexMaintenance.register(corpus, "/other/idx")
    assert(IndexMaintenance.parseList(FileTableCatalog.loadOrThrow(corpus)
      .properties(IndexMaintenance.RegisteredProp)) == Seq(idx, "/other/idx"))
    IndexMaintenance.unregister(corpus, "/other/idx")
    IndexMaintenance.unregister(corpus, idx)
    assert(!FileTableCatalog.loadOrThrow(corpus)
      .properties.contains(IndexMaintenance.RegisteredProp))
  }

  test("refreshAll dispatches by index kind: a text index and an ANN " +
    "index of the same corpus both catch up in one call") {
    // a corpus carrying BOTH a text column and an embedding column
    val corpus = Files.createTempDirectory("graft-ims2-corpus").toString
    TableMetadata.commit(corpus, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(corpus,
      Seq((1L, "a b", Seq(1f, 1f)), (2L, "b c", Seq(9f, 9f)))
        .toDF("doc_id", "text", "embedding").coalesce(1))
    val v0 = FileTableCatalog.loadOrThrow(corpus).version
    // text index
    val tidx = Files.createTempDirectory("graft-ims2-tidx").toString
    TableMetadata.commit(tidx, TableSnapshot(1, 1, 0, Nil))
    val docs = graft.sources.TableReader.read(spark, corpus)
      .select("doc_id", "text")
    TableWrites.appendData(tidx, TextIndex.postings(docs).coalesce(1))
    val (n, t) = TextIndex.stats(docs)
    new graft.txn.CommitManager(tidx).setTableProperties(Map(
      TextIndex.StatsProp -> s"$n,$t",
      TextIndex.SourceProp -> corpus,
      TextIndex.SyncedProp -> v0.toString),
      Set.empty,
      expectedSchemaId = FileTableCatalog.loadOrThrow(tidx).schemaId)
    // ANN index over the SAME corpus, keyed by its doc_id column (the
    // IdColProp/VecColProp metadata names the corpus columns)
    val cents = Seq(100L -> Seq(0L, 0L), 200L -> Seq(10000000L, 10000000L))
    val aidx = Files.createTempDirectory("graft-ims2-aidx").toString
    TableMetadata.commit(aidx, TableSnapshot(1, 1, 0, Nil))
    val vecs = graft.sources.TableReader.read(spark, corpus)
      .select(col("doc_id").as("vec_id"), col("embedding").as("v"))
    TableWrites.appendData(aidx,
      AnnIndex.assignTo(vecs, cents)
        .select(col("vec_id"), col("v").cast("array<float>").as("v"),
          col("cid")).coalesce(1))
    new graft.txn.CommitManager(aidx).setTableProperties(Map(
      AnnIndex.CentroidsProp -> AnnIndex.encodeCentroids(cents),
      AnnIndex.SourceProp -> corpus,
      AnnIndex.SyncedProp -> v0.toString,
      AnnIndex.IdColProp -> "doc_id",
      AnnIndex.VecColProp -> "embedding"),
      Set.empty,
      expectedSchemaId = FileTableCatalog.loadOrThrow(aidx).schemaId)
    IndexMaintenance.register(corpus, tidx)
    IndexMaintenance.register(corpus, aidx)
    // churn the corpus, then ONE refreshAll
    TableWrites.appendData(corpus,
      Seq((3L, "c d", Seq(8f, 8f))).toDF("doc_id", "text", "embedding")
        .coalesce(1))
    IndexMaintenance.refreshAll(spark, corpus)
    val vCur = FileTableCatalog.loadOrThrow(corpus).version.toString
    assert(FileTableCatalog.loadOrThrow(tidx)
      .properties(TextIndex.SyncedProp) == vCur)
    assert(FileTableCatalog.loadOrThrow(aidx)
      .properties(AnnIndex.SyncedProp) == vCur)
    // the new vector landed at its nearest centroid
    assert(graft.sources.TableReader.read(spark, aidx)
      .filter(col("vec_id") === 3L).select("cid").head().getLong(0) == 200L)
    // refusal: a registered dir that is not an index
    val junk = Files.createTempDirectory("graft-ims2-junk").toString
    TableMetadata.commit(junk, TableSnapshot(1, 1, 0, Nil))
    IndexMaintenance.register(corpus, junk)
    TableWrites.appendData(corpus,
      Seq((4L, "d e", Seq(0f, 1f))).toDF("doc_id", "text", "embedding")
        .coalesce(1))
    val e = intercept[graft.core.CompactionError.Config] {
      IndexMaintenance.refreshAll(spark, corpus)
    }
    assert(e.getMessage.contains("not a maintainable index"))
  }

  test("refreshAll dispatches a COMPRESSED (IVF-PQ) index to refreshPq: " +
    "the codebook property wins over the centroids property it rides " +
    "beside, and inserts re-encode as codes, not raw vectors") {
    val corpus = Files.createTempDirectory("graft-ims3-corpus").toString
    TableMetadata.commit(corpus, TableSnapshot(1, 1, 0, Nil))
    val vecs0 = Seq(
      (1L, Seq(0f, 0f, 0f, 0f)), (2L, Seq(1f, 1f, 1f, 1f)),
      (3L, Seq(9f, 9f, 9f, 9f)), (4L, Seq(8f, 8f, 8f, 8f)))
      .toDF("vec_id", "embedding")
    TableWrites.appendData(corpus, vecs0.coalesce(1))
    val (cents, cb, codes) = Similarity.ivfPqIndex(
      vecs0.select(col("vec_id"), col("embedding").as("v")),
      dims = 4, numCentroids = 2, lloydIters = 1,
      numSubs = 2, codebookSize = 2)
    val pidx = Files.createTempDirectory("graft-ims3-pidx").toString
    TableMetadata.commit(pidx, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(pidx, codes.coalesce(1))
    new graft.txn.CommitManager(pidx).setTableProperties(Map(
      AnnIndex.CentroidsProp -> AnnIndex.encodeCentroids(cents),
      AnnIndex.CodebookProp -> AnnIndex.encodeCodebook(cb),
      AnnIndex.SourceProp -> corpus,
      AnnIndex.SyncedProp ->
        FileTableCatalog.loadOrThrow(corpus).version.toString),
      Set.empty,
      expectedSchemaId = FileTableCatalog.loadOrThrow(pidx).schemaId)
    IndexMaintenance.register(corpus, pidx)
    TableWrites.appendData(corpus,
      Seq((5L, Seq(7f, 7f, 7f, 7f))).toDF("vec_id", "embedding").coalesce(1))
    IndexMaintenance.refreshAll(spark, corpus) // must NOT route to refresh()
    assert(FileTableCatalog.loadOrThrow(pidx)
      .properties(AnnIndex.SyncedProp) ==
      FileTableCatalog.loadOrThrow(corpus).version.toString,
      "the PQ index must auto-maintain via refreshPq")
    val row5 = graft.sources.TableReader.read(spark, pidx)
      .filter(col("vec_id") === 5L).head()
    assert(row5.getSeq[Long](row5.fieldIndex("codes")).size == 2,
      "the insert must re-encode against the frozen 2-subspace codebook")
    // numSubs is derived from the stored codebook, never a caller input:
    // the refresh above was parameterless and still split residuals 2-way
    assert(cb.map(_._1).max + 1 == 2)
  }

  test("refreshAll runs the opt-in drift policy: an ANN index carrying " +
    "a rebuild budget retrains inline when churn drifts past it, and " +
    "stays frozen inside the budget") {
    val corpus = Files.createTempDirectory("graft-ims5-corpus").toString
    TableMetadata.commit(corpus, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(corpus,
      Seq((1L, Seq(1f, 1f)), (2L, Seq(9f, 9f)))
        .toDF("vec_id", "embedding").coalesce(1))
    val cents = Seq(100L -> Seq(0L, 0L), 200L -> Seq(10000000L, 10000000L))
    val aidx = Files.createTempDirectory("graft-ims5-aidx").toString
    TableMetadata.commit(aidx, TableSnapshot(1, 1, 0, Nil))
    val vecs = graft.sources.TableReader.read(spark, corpus)
      .select(col("vec_id").as("vec_id"), col("embedding").as("v"))
    TableWrites.appendData(aidx,
      AnnIndex.assignTo(vecs, cents)
        .select(col("vec_id"), col("v").cast("array<float>").as("v"),
          col("cid")).coalesce(1))
    new graft.txn.CommitManager(aidx).setTableProperties(Map(
      AnnIndex.CentroidsProp -> AnnIndex.encodeCentroids(cents),
      AnnIndex.SourceProp -> corpus,
      AnnIndex.SyncedProp ->
        FileTableCatalog.loadOrThrow(corpus).version.toString,
      AnnIndex.RebuildBudgetProp -> "1500"),
      Set.empty,
      expectedSchemaId = FileTableCatalog.loadOrThrow(aidx).schemaId)
    IndexMaintenance.register(corpus, aidx)
    // near-centroid churn: refresh stamps telemetry, budget holds
    TableWrites.appendData(corpus,
      Seq((3L, Seq(0.1f, 0.1f))).toDF("vec_id", "embedding").coalesce(1))
    IndexMaintenance.refreshAll(spark, corpus)
    assert(AnnIndex.decodeCentroids(FileTableCatalog.loadOrThrow(aidx)
      .properties(AnnIndex.CentroidsProp)) == cents,
      "inside the budget the model stays frozen")
    // far churn: the inline policy fires — centroids retrain, marker
    // stays current, and the budget prop survives the swap
    TableWrites.appendData(corpus,
      Seq((4L, Seq(900f, -900f))).toDF("vec_id", "embedding").coalesce(1))
    IndexMaintenance.refreshAll(spark, corpus)
    val after = FileTableCatalog.loadOrThrow(aidx)
    assert(AnnIndex.decodeCentroids(
      after.properties(AnnIndex.CentroidsProp)) != cents,
      "past the budget the maintenance pass must retrain inline")
    assert(after.properties(AnnIndex.SyncedProp) ==
      FileTableCatalog.loadOrThrow(corpus).version.toString)
    assert(after.properties(AnnIndex.RebuildBudgetProp) == "1500")
    assert(after.properties(AnnIndex.BaseErrProp) ==
      after.properties(AnnIndex.LastErrProp), "baseline re-armed")
  }

  test("refreshAll attempts every registered index: one broken entry " +
    "does not starve the indexes listed after it") {
    val (corpus, idx) = textCorpusAndIndex()
    val junk = Files.createTempDirectory("graft-ims4-junk").toString
    TableMetadata.commit(junk, TableSnapshot(1, 1, 0, Nil))
    IndexMaintenance.register(corpus, junk) // broken entry FIRST
    IndexMaintenance.register(corpus, idx)
    TableWrites.appendData(corpus,
      Seq((3L, "c d")).toDF("doc_id", "text").coalesce(1))
    val e = intercept[graft.core.CompactionError.Config] {
      IndexMaintenance.refreshAll(spark, corpus)
    }
    assert(e.getMessage.contains("not a maintainable index"))
    assert(FileTableCatalog.loadOrThrow(idx)
      .properties(TextIndex.SyncedProp) ==
      FileTableCatalog.loadOrThrow(corpus).version.toString,
      "the text index after the broken entry must still have refreshed")
  }

  test("withIndexMaintenance refreshes inline per committed batch; a " +
    "failing refresh leaves the index STALE (detected by the serving " +
    "gate), and the next batch's refresh covers the missed delta") {
    val (corpus, idx) = textCorpusAndIndex()
    IndexMaintenance.register(corpus, idx)
    val sink = StreamingIngest.withIndexMaintenance(spark, corpus,
      inner = StreamingIngest.upsertWriter(corpus, schemaId = 1,
        keyCols = Seq("doc_id")))
    sink(Seq((3L, "c d")).toDF("doc_id", "text"), 1L)
    val vCorpus1 = FileTableCatalog.loadOrThrow(corpus).version
    assert(FileTableCatalog.loadOrThrow(idx)
      .properties(TextIndex.SyncedProp) == vCorpus1.toString)
    // break the NEXT refresh: move the marker so the refresh validate
    // sees a concurrent-move and throws — the wrapper must swallow it
    val idxSnap = FileTableCatalog.loadOrThrow(idx)
    new graft.txn.CommitManager(idx).setTableProperties(
      Map(TextIndex.SourceProp -> "/not/the/corpus"), Set.empty,
      expectedSchemaId = idxSnap.schemaId)
    sink(Seq((4L, "d e")).toDF("doc_id", "text"), 2L)
    // data committed, index stale — and the gate detects it
    val vCorpus2 = FileTableCatalog.loadOrThrow(corpus).version
    assert(vCorpus2 > vCorpus1, "the data commit must not be blocked")
    assert(FileTableCatalog.loadOrThrow(idx)
      .properties(TextIndex.SyncedProp) == vCorpus1.toString,
      "failed refresh leaves the marker behind (stale, never wrong)")
    // repair the source prop; the NEXT batch covers batch 2's delta too
    val idxSnap2 = FileTableCatalog.loadOrThrow(idx)
    new graft.txn.CommitManager(idx).setTableProperties(
      Map(TextIndex.SourceProp -> corpus), Set.empty,
      expectedSchemaId = idxSnap2.schemaId)
    sink(Seq((5L, "e f")).toDF("doc_id", "text"), 3L)
    assert(FileTableCatalog.loadOrThrow(idx)
      .properties(TextIndex.SyncedProp) ==
      FileTableCatalog.loadOrThrow(corpus).version.toString)
    val terms = graft.sources.TableReader.read(spark, idx)
      .select("term").distinct().as[String].collect().toSet
    assert(Set("d", "e", "f").subsetOf(terms),
      "the catch-up refresh must include the batch whose refresh failed")
    // replayed batch: no commit, refresh no-ops, marker unchanged
    val vIdx = FileTableCatalog.loadOrThrow(idx).version
    sink(Seq((5L, "e f")).toDF("doc_id", "text"), 3L)
    assert(FileTableCatalog.loadOrThrow(idx).version == vIdx)
  }

  test("refreshAll dispatches a registered DEDUP bands index and the " +
    "probe serves the post-refresh corpus") {
    val corpus = Files.createTempDirectory("graft-ims-dd-corpus").toString
    TableMetadata.commit(corpus, TableSnapshot(1, 1, 0, Nil))
    def txt(seed: Int): String =
      (0 until 25).map(i => s"w${(seed + i) % 28}").mkString(" ")
    TableWrites.appendData(corpus,
      Seq((1L, txt(0)), (2L, txt(100))).toDF("doc_id", "text").coalesce(1))
    val idx = Files.createTempDirectory("graft-ims-dd-idx").toString
    TableMetadata.commit(idx, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(idx, Dedup.bandRows(
      graft.sources.TableReader.read(spark, corpus), 32, 4).coalesce(1))
    new graft.txn.CommitManager(idx).setTableProperties(Map(
      DedupIndex.ParamsProp -> "32,4",
      DedupIndex.SourceProp -> corpus,
      DedupIndex.SyncedProp ->
        FileTableCatalog.loadOrThrow(corpus).version.toString),
      Set.empty,
      expectedSchemaId = FileTableCatalog.loadOrThrow(idx).schemaId)
    IndexMaintenance.register(corpus, idx)
    // a near-copy of doc 1 lands; refreshAll catches the bands index up
    TableWrites.appendData(corpus,
      Seq((3L, txt(0) + " tail")).toDF("doc_id", "text").coalesce(1))
    IndexMaintenance.refreshAll(spark, corpus)
    assert(FileTableCatalog.loadOrThrow(idx)
      .properties(DedupIndex.SyncedProp) ==
      FileTableCatalog.loadOrThrow(corpus).version.toString)
    val pairs = DedupIndex.probePairs(spark, corpus, idx,
        col("doc_id") === 3L, 500)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 3L)), s"expected the planted near-dup: $pairs")
  }

  test("delta-fold policy: refreshAll folds layout-less refresh deltas " +
    "back into the bucket layout only when the budget is exceeded, and " +
    "probes stay exact across the fold") {
    def txt(seed: Int): String =
      (0 until 25).map(i => s"w${(seed + i) % 28}").mkString(" ")
    val corpus = Files.createTempDirectory("graft-ims-fold-corpus").toString
    TableMetadata.commit(corpus, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(corpus,
      Seq((1L, txt(0)), (2L, txt(100))).toDF("doc_id", "text").coalesce(1))
    // bucketed bands index via the catalog (the production layout)
    val name = "imsfoldidx"
    val wh = Files.createTempDirectory("graft-ims-fold-wh").toString
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $name.db")
    spark.sql(s"CREATE TABLE $name.db.didx " +
      "(band BIGINT, band_key STRING, doc_id BIGINT) " +
      "PARTITIONED BY (bucket(16, band_key))")
    val idx = s"$wh/db/didx"
    Dedup.bandRows(graft.sources.TableReader.read(spark, corpus), 32, 4)
      .createOrReplaceTempView("ims_fold_src")
    spark.sql(s"INSERT INTO $name.db.didx SELECT * FROM ims_fold_src")
    spark.sql(s"ALTER TABLE $name.db.didx SET TBLPROPERTIES (" +
      s"'${DedupIndex.ParamsProp}' = '32,4', " +
      s"'${DedupIndex.SourceProp}' = '$corpus', " +
      s"'${IndexMaintenance.CompactOverProp}' = '1000', " +
      s"'${DedupIndex.SyncedProp}' = " +
      s"'${FileTableCatalog.loadOrThrow(corpus).version}')")
    IndexMaintenance.register(corpus, idx)
    assert(IndexMaintenance.deltaFileCount(
      FileTableCatalog.loadOrThrow(idx)) == 0, "a fresh build has no deltas")
    // two churn batches under a huge budget: deltas accumulate, no fold
    TableWrites.appendData(corpus,
      Seq((3L, txt(0) + " tail")).toDF("doc_id", "text").coalesce(1))
    IndexMaintenance.refreshAll(spark, corpus)
    TableWrites.appendData(corpus,
      Seq((4L, txt(100) + " tail")).toDF("doc_id", "text").coalesce(1))
    IndexMaintenance.refreshAll(spark, corpus)
    val deltas = IndexMaintenance.deltaFileCount(
      FileTableCatalog.loadOrThrow(idx))
    assert(deltas > 0, "refresh commits must have written delta files")
    // tighten the budget to 0: the next maintenance pass must fold —
    // even with NO new corpus change (the refresh no-ops, the policy
    // still inspects the backlog)
    new graft.txn.CommitManager(idx).setTableProperties(
      Map(IndexMaintenance.CompactOverProp -> "0"), Set.empty,
      FileTableCatalog.loadOrThrow(idx).schemaId)
    IndexMaintenance.refreshAll(spark, corpus)
    assert(IndexMaintenance.deltaFileCount(
      FileTableCatalog.loadOrThrow(idx)) == 0,
      "the fold must return every delta to the bucket layout")
    // probes stay exact across the fold, served from the folded layout
    val got = DedupIndex.probePairs(spark, corpus, idx, lit(true), 500)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 3L), (2L, 4L)), s"post-fold probe: $got")
  }
}
