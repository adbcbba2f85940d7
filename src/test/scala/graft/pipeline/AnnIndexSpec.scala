package graft.pipeline

import graft.SparkTestSession
import graft.txn.{FileTableCatalog, TableMetadata, TableSnapshot, TableWrites}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** [[AnnIndex]]: changelog-driven incremental maintenance of the
  * persisted IVF assignments table — frozen centroids, atomic
  * replacement, markers, and the refusal paths. (The end-to-end
  * pruned search over a churned corpus is the `ann_index_refresh`
  * oracle query.) */
class AnnIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // two frozen 2-dim centroids: cid 100 at (0,0), cid 200 at (10,10)
  private val cents: Seq[(Long, Seq[Long])] = Seq(
    100L -> Seq(0L, 0L),
    200L -> Seq(10000000L, 10000000L))

  private def vec(x: Float, y: Float): Seq[Float] = Seq(x, y)

  private def fixture(): (String, String) = {
    val corpus = Files.createTempDirectory("graft-ais-corpus").toString
    TableMetadata.commit(corpus, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(corpus,
      Seq((1L, vec(1f, 1f)), (2L, vec(9f, 9f)), (3L, vec(0f, 2f)))
        .toDF("vec_id", "embedding").coalesce(1))
    val idx = Files.createTempDirectory("graft-ais-idx").toString
    TableMetadata.commit(idx, TableSnapshot(1, 1, 0, Nil))
    val vecs = graft.sources.TableReader.read(spark, corpus)
      .select(col("vec_id"), col("embedding").as("v"))
    TableWrites.appendData(idx,
      AnnIndex.assignTo(vecs, cents)
        .select(col("vec_id"), col("v").cast("array<float>").as("v"),
          col("cid"))
        .coalesce(1))
    new graft.txn.CommitManager(idx).setTableProperties(Map(
      AnnIndex.CentroidsProp -> AnnIndex.encodeCentroids(cents),
      AnnIndex.SourceProp -> corpus,
      AnnIndex.SyncedProp ->
        FileTableCatalog.loadOrThrow(corpus).version.toString),
      Set.empty,
      expectedSchemaId = FileTableCatalog.loadOrThrow(idx).schemaId)
    (corpus, idx)
  }

  private def assignmentsOf(idx: String): Set[(Long, Long)] =
    graft.sources.TableReader.read(spark, idx)
      .select("vec_id", "cid")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet

  test("centroid codec round-trips") {
    assert(AnnIndex.decodeCentroids(AnnIndex.encodeCentroids(cents)) == cents)
  }

  test("refresh is a no-op when current; delete/insert/update churn " +
    "lands as ONE commit of assignments against the FROZEN centroids") {
    val (corpus, idx) = fixture()
    assert(assignmentsOf(idx) == Set((1L, 100L), (2L, 200L), (3L, 100L)))
    val v0 = FileTableCatalog.loadOrThrow(corpus).version
    val idxV0 = FileTableCatalog.loadOrThrow(idx).version
    // already current: no commit happens
    assert(AnnIndex.refresh(spark, corpus, idx) == v0)
    assert(FileTableCatalog.loadOrThrow(idx).version == idxV0)
    // churn: delete 3; UPDATE 1 across the centroid boundary (its old
    // assignment row must be eq-deleted, the new one lands at cid 200);
    // insert 4 near centroid 100 — then ONE refresh, ONE commit
    TableWrites.appendEqualityDeletes(corpus,
      Seq(3L).toDF("vec_id"), Seq("vec_id"))
    TableWrites.upsert(corpus,
      Seq((1L, vec(8f, 8f))).toDF("vec_id", "embedding"),
      keyCols = Seq("vec_id"))
    TableWrites.appendData(corpus,
      Seq((4L, vec(2f, 0f))).toDF("vec_id", "embedding").coalesce(1))
    assert(AnnIndex.refresh(spark, corpus, idx) ==
      FileTableCatalog.loadOrThrow(corpus).version)
    val after = FileTableCatalog.loadOrThrow(idx)
    assert(after.version == idxV0 + 1, "whole churn = one atomic commit")
    assert(after.properties(AnnIndex.SyncedProp) ==
      FileTableCatalog.loadOrThrow(corpus).version.toString)
    // centroids stayed frozen
    assert(AnnIndex.decodeCentroids(
      after.properties(AnnIndex.CentroidsProp)) == cents)
    assert(assignmentsOf(idx) == Set((1L, 200L), (2L, 200L), (4L, 100L)))
    // the updated vector's stored v is the NEW embedding
    val v1 = graft.sources.TableReader.read(spark, idx)
      .filter(col("vec_id") === 1L).select("v").head()
      .getSeq[Float](0)
    assert(v1 == Seq(8f, 8f))
  }

  test("refresh refuses duplicate vec_ids even when embeddings differ " +
    "(netting is per row VALUE — the guard must group per id)") {
    val (corpus, idx) = fixture()
    TableWrites.appendData(corpus,
      Seq((7L, vec(1f, 0f)), (7L, vec(0f, 1f)))
        .toDF("vec_id", "embedding").coalesce(1))
    val e = intercept[graft.core.CompactionError.Config] {
      AnnIndex.refresh(spark, corpus, idx)
    }
    assert(e.getMessage.contains("not unique per vec_id"))
    // index untouched
    assert(assignmentsOf(idx) == Set((1L, 100L), (2L, 200L), (3L, 100L)))
  }

  test("refresh refuses an index built over a different corpus and a " +
    "marker-less index; same-id update stays accepted") {
    val (corpus, idx) = fixture()
    val other = Files.createTempDirectory("graft-ais-other").toString
    TableMetadata.commit(other, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(other,
      Seq((9L, vec(5f, 5f))).toDF("vec_id", "embedding").coalesce(1))
    val e = intercept[graft.core.CompactionError.Config] {
      AnnIndex.refresh(spark, other, idx)
    }
    assert(e.getMessage.contains("does not index"))
    // update = delete+insert of one id: per (id, type) counts are 1
    TableWrites.upsert(corpus,
      Seq((2L, vec(0.5f, 0.5f))).toDF("vec_id", "embedding"),
      keyCols = Seq("vec_id"))
    AnnIndex.refresh(spark, corpus, idx)
    assert(assignmentsOf(idx) == Set((1L, 100L), (2L, 100L), (3L, 100L)))
  }

  test("drift lifecycle: refreshes stamp quantization-error telemetry; " +
    "churn far from the frozen centroids trips rebuildIfDrifted, which " +
    "retrains + swaps in ONE commit and resets the baseline; a " +
    "below-budget index no-ops") {
    val (corpus, idx) = fixture()
    // first refresh: inserts NEAR a centroid — low error; BaseErr
    // self-initializes to LastErr (drift ratio 1.0 -> no rebuild)
    TableWrites.appendData(corpus,
      Seq((4L, vec(0.1f, 0.1f))).toDF("vec_id", "embedding").coalesce(1))
    AnnIndex.refresh(spark, corpus, idx)
    val p1 = FileTableCatalog.loadOrThrow(idx).properties
    val base = p1(AnnIndex.BaseErrProp).toLong
    assert(p1(AnnIndex.LastErrProp).toLong == base,
      "first refresh self-initializes the baseline")
    assert(AnnIndex.rebuildIfDrifted(spark, corpus, idx,
      whenDriftOverX1000 = 1500).isEmpty,
      "no rebuild inside the drift budget")
    // churn FAR from both frozen centroids: the refresh's encode error
    // explodes vs the baseline and the drift trigger fires
    TableWrites.appendData(corpus,
      Seq((5L, vec(500f, -500f)), (6L, vec(-400f, 600f)))
        .toDF("vec_id", "embedding").coalesce(1))
    AnnIndex.refresh(spark, corpus, idx)
    val p2 = FileTableCatalog.loadOrThrow(idx).properties
    assert(BigInt(p2(AnnIndex.LastErrProp).toLong) * 1000 > BigInt(base) * 1500,
      s"far churn must trip the budget: last=${p2(AnnIndex.LastErrProp)} " +
        s"base=$base")
    val vBefore = FileTableCatalog.loadOrThrow(idx).version
    val served = AnnIndex.rebuildIfDrifted(spark, corpus, idx,
      whenDriftOverX1000 = 1500)
    assert(served.contains(FileTableCatalog.loadOrThrow(corpus).version))
    val after = FileTableCatalog.loadOrThrow(idx)
    assert(after.version == vBefore + 1,
      "rebuild must be ONE atomic overwrite commit")
    // model swapped: centroids retrained over the churned corpus...
    val newCents = AnnIndex.decodeCentroids(
      after.properties(AnnIndex.CentroidsProp))
    assert(newCents != cents, "the frozen centroids must be replaced")
    // ...and SERVING EQUIVALENCE: the swapped rows equal a from-scratch
    // assignment of the current corpus against the new centroids
    val vecsNow = graft.sources.TableReader.read(spark, corpus)
      .select(col("vec_id"), col("embedding").as("v"))
    val want = AnnIndex.assignTo(vecsNow, newCents)
      .select("vec_id", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(assignmentsOf(idx) == want)
    // baseline reset: drift ratio is 1 again, trigger re-arms
    val p3 = after.properties
    assert(p3(AnnIndex.BaseErrProp) == p3(AnnIndex.LastErrProp))
    assert(AnnIndex.rebuildIfDrifted(spark, corpus, idx,
      whenDriftOverX1000 = 1500).isEmpty)
  }
}
