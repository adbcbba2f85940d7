package graft.pipeline

import graft.core.CompactionError
import graft.sources.TableReader
import graft.txn.{FileTableCatalog, TableCatalog, TableWrites}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INCREMENTALLY MAINTAINED persisted IVF index: the assignments table
  * (vec_id, v, cid) built by [[Similarity.ivfIndex]] kept in sync with
  * its source corpus by the corpus CHANGELOG — the same delta+base
  * lifecycle as [[TextIndex]], applied to vector search:
  *
  *  - the trained centroids are FROZEN index metadata (the
  *    [[CentroidsProp]] table property). A refresh never retrains: new
  *    and updated vectors are assigned to their nearest EXISTING
  *    centroid with the same integer-exact distance
  *    ([[Similarity.IntKMeans]]) the build used, so an incrementally
  *    refreshed index is bit-identical to rebuilding the assignment
  *    pass over the churned corpus against those centroids. (Centroid
  *    RETRAINING is a separate, rarer lifecycle event — rebuild via
  *    [[Similarity.ivfIndex]] when drift warrants it, exactly like a
  *    periodic full compaction.)
  *  - [[refresh]] applies the corpus's net changes since the index's
  *    marker as ONE atomic upsert commit: equality-delete every changed
  *    vec_id's assignment row, insert the new assignments, and advance
  *    the synced-version marker in the SAME commit — a reader always
  *    sees a complete index of SOME corpus version, never a
  *    half-refreshed one. Cost ∝ changed vectors, never the corpus.
  *  - Refresh commits write UNPARTITIONED delta files (the row-level
  *    upsert path), so centroid-partition pruning keeps holding for the
  *    base files while deltas ride alongside; a periodic compaction
  *    folds deltas back into the identity(cid) layout and restores full
  *    per-centroid pruning (the fold-the-backlog lifecycle streaming
  *    auto-compaction uses).
  *
  * The searcher gates on the marker ([[Similarity.ivfSearchIndexed]]
  * callers assert synced-version == corpus current version), so a
  * lagging index is detected, not silently stale.
  */
object AnnIndex {

  val CentroidsProp = "graft.ann.centroids"
  val SourceProp = "graft.ann.source"
  val SyncedProp = "graft.ann.synced-version"
  /** IVF-PQ index metadata: frozen residual codebook (rides beside
    * [[CentroidsProp]]; its presence marks a COMPRESSED index whose
    * refresh re-ENCODES instead of re-assigning). */
  val CodebookProp = "graft.ann.pq.codebook"

  def encodeCodebook(cb: Seq[(Int, Long, Seq[Long])]): String =
    cb.map { case (m, code, cq) => s"$m:$code:${cq.mkString(",")}" }
      .mkString(";")

  def decodeCodebook(s: String): Seq[(Int, Long, Seq[Long])] =
    s.split(";").toSeq.map { part =>
      val Array(m, code, cq) = part.split(":", 3)
      (m.toInt, code.toLong, cq.split(",").toSeq.map(_.toLong))
    }
  /** Corpus column names, as index metadata (a real corpus rarely
    * calls its key `vec_id`) — default vec_id / embedding. */
  val IdColProp = "graft.ann.id-col"
  val VecColProp = "graft.ann.vec-col"

  /** Drift telemetry: mean integer quantization error of the index at
    * BUILD time ([[Similarity.ivfQuantError]] / [[Similarity
    * .ivfPqQuantError]] over the built rows) and of the most recent
    * refresh's newly encoded rows. Every refresh stamps [[LastErrProp]]
    * in the SAME atomic commit (self-initializing [[BaseErrProp]] when
    * the builder did not stamp it); [[rebuildIfDrifted]] compares the
    * two — frozen centroids degrade SILENTLY as the corpus churns, so
    * the error trend is the rebuild trigger a frozen-model lifecycle
    * needs. */
  val BaseErrProp = "graft.ann.base-err"
  val LastErrProp = "graft.ann.last-err"

  /** Opt-in AUTO-REBUILD budget (a drift ratio x1000, e.g. "1500" =
    * rebuild when last-err > 1.5x base-err): when an index carries
    * this property, [[IndexMaintenance.refreshAll]] runs
    * [[rebuildIfDrifted]] with it after each refresh — the whole
    * frozen-model lifecycle (serve -> refresh -> measure -> retrain)
    * then rides the ingest path with zero scheduling. */
  val RebuildBudgetProp = "graft.ann.rebuild-over-x1000"

  /** Centroid metadata codec: `cid:q1,q2,...;cid:...` — the quantized
    * centroid components ARE the index directory (numCentroids x dims
    * longs), small enough to ride as a table property. */
  def encodeCentroids(cs: Seq[(Long, Seq[Long])]): String =
    cs.map { case (cid, cq) => s"$cid:${cq.mkString(",")}" }.mkString(";")

  def decodeCentroids(s: String): Seq[(Long, Seq[Long])] =
    s.split(";").toSeq.map { part =>
      val Array(cid, cq) = part.split(":", 2)
      cid.toLong -> cq.split(",").toSeq.map(_.toLong)
    }

  /** Assign (vec_id, v) rows to their nearest stored centroid —
    * integer-exact, identical to the build pass, so refreshed rows are
    * indistinguishable from built rows. Returns (vec_id, v, cid). */
  def assignTo(
      vectors: DataFrame, // (vec_id, v)
      centroids: Seq[(Long, Seq[Long])]
  ): DataFrame =
    Similarity.IntKMeans
      .assignLit(vectors.withColumn("px", Similarity.IntKMeans.quant(col("v"))),
        "px", centroids)
      .drop("px")

  /** Bring the COMPRESSED (IVF-PQ) index at `idxDir` up to the
    * corpus's current version: the same one-atomic-commit changelog
    * catch-up as [[refresh]], but inserted vectors are re-ENCODED
    * against the frozen centroids AND frozen residual codebook
    * ([[Similarity.ivfPqEncode]] — bit-identical to the build pass).
    * `dims` comes from the stored centroid width and `numSubs` from the
    * stored codebook's subspace count — BOTH are properties of the
    * frozen model, never caller inputs (a caller-supplied subspace
    * split that disagreed with the build would re-encode inserts
    * against the wrong residual slicing, silently corrupting codes). */
  def refreshPq(
      spark: SparkSession,
      corpusDir: String,
      idxDir: String,
      catalog: TableCatalog = FileTableCatalog
  ): Long = {
    val idx = catalog.loadOrThrow(idxDir)
    val cb = decodeCodebook(idx.properties.getOrElse(CodebookProp,
      throw CompactionError.Config(s"$idxDir carries no $CodebookProp")))
    val numSubs = cb.map(_._1).max + 1
    refreshWith(spark, corpusDir, idxDir, catalog,
      errOf = (ins, cents) => Similarity.ivfPqQuantError(ins,
        cents.head._2.size, cents, cb, numSubs)) { (ins, cents) =>
      val dims = cents.head._2.size
      Similarity.ivfPqEncode(ins, dims, cents, cb, numSubs)
        .select(col("vec_id"), col("codes"), col("cid"))
    }
  }

  /** Bring the index at `idxDir` up to the corpus's current version by
    * applying the NET changelog since the index marker, as ONE atomic
    * upsert commit. Returns the new synced corpus version (no-op when
    * already current). The corpus must be keyed by unique `vec_id` — a
    * net multiplicity above 1 means duplicate ids and is refused. */
  def refresh(
      spark: SparkSession,
      corpusDir: String,
      idxDir: String,
      catalog: TableCatalog = FileTableCatalog
  ): Long =
    refreshWith(spark, corpusDir, idxDir, catalog,
      errOf = (ins, cents) => Similarity.ivfQuantError(ins, cents)) {
      (ins, cents) =>
        assignTo(ins, cents)
          .select(col("vec_id"), col("v").cast("array<float>").as("v"),
            col("cid"))
    }

  /** Shared ANN changelog catch-up over [[IndexMaintenance
    * .changelogRefresh]] (the one lifecycle skeleton): decode the
    * frozen centroids, re-encode net inserts against them, and stamp
    * drift telemetry in the same atomic commit — `encodeRows` turns
    * (vec_id, v) inserts into the index's row shape. */
  private def refreshWith(
      spark: SparkSession,
      corpusDir: String,
      idxDir: String,
      catalog: TableCatalog,
      /** Mean quantization error of the refresh's newly encoded rows
        * against the frozen model — stamped as [[LastErrProp]] in the
        * same atomic commit (drift telemetry; None for delete-only
        * batches, which leave the marker untouched). */
      errOf: (DataFrame, Seq[(Long, Seq[Long])]) => Option[Long]
  )(encodeRows: (DataFrame, Seq[(Long, Seq[Long])]) => DataFrame): Long = {
    val idx = catalog.loadOrThrow(idxDir)
    // the frozen model decodes from the SAME load the marker guard
    // protects (and before the no-op short-circuit: an index without
    // centroids is malformed even when current)
    val cents = decodeCentroids(idx.properties.getOrElse(CentroidsProp,
      throw CompactionError.Config(s"$idxDir carries no $CentroidsProp")))
    val idCol = idx.properties.getOrElse(IdColProp, "vec_id")
    val vecCol = idx.properties.getOrElse(VecColProp, "embedding")
    IndexMaintenance.changelogRefresh(spark, corpusDir, idxDir, catalog,
      idx, SourceProp, SyncedProp, corpusIdCol = idCol,
      indexKeyCol = "vec_id", indexNoun = "an ANN index") { net =>
      val ins = net.filter(col("_change_type") === "insert")
        .select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      // drift telemetry: the error of the newly encoded rows, stamped
      // with the marker; BaseErr self-initializes on the first refresh
      // when the builder did not stamp a build-time baseline
      val errProps = errOf(ins, cents).map { e =>
        Map(LastErrProp -> e.toString) ++
          (if (idx.properties.contains(BaseErrProp)) Map.empty
           else Map(BaseErrProp -> e.toString))
      }.getOrElse(Map.empty)
      (encodeRows(ins, cents), errProps)
    }
  }

  /** Retrain the index over the CURRENT corpus and atomically swap its
    * contents + model metadata in ONE overwriteAll commit — the
    * frozen-model lifecycle's periodic "full compaction": incremental
    * refresh keeps serving consistent between rebuilds, this resets
    * the coarse quantizer (and codebook, for a compressed index) once
    * drift warrants it. Dispatches on the stored metadata: a codebook
    * marks IVF-PQ (re-trains centroids AND residual codebooks with the
    * build-time subspace/codebook shape), else plain IVF. The rebuild
    * writes unpartitioned files (like refresh deltas) — run compaction
    * afterwards to restore the identity(cid) pruning layout. Returns
    * the corpus version the rebuilt index serves. */
  def rebuild(
      spark: SparkSession,
      corpusDir: String,
      idxDir: String,
      catalog: TableCatalog = FileTableCatalog,
      lloydIters: Int = 2
  ): Long = {
    val idx = catalog.loadOrThrow(idxDir)
    if (!idx.properties.get(SourceProp).contains(corpusDir))
      throw CompactionError.Config(
        s"$idxDir does not index $corpusDir (build it first)")
    val oldCents = decodeCentroids(idx.properties.getOrElse(CentroidsProp,
      throw CompactionError.Config(s"$idxDir carries no $CentroidsProp")))
    val lastV = idx.properties.get(SyncedProp).flatMap(_.toLongOption)
      .getOrElse(throw CompactionError.Config(
        s"$idxDir carries no synced-version marker"))
    val idCol = idx.properties.getOrElse(IdColProp, "vec_id")
    val vecCol = idx.properties.getOrElse(VecColProp, "embedding")
    val corpusV = catalog.loadOrThrow(corpusDir).version
    val vecs = TableReader.read(spark, corpusDir,
        asOfVersion = Some(corpusV), catalog = catalog)
      .select(col(idCol).as("vec_id"), col(vecCol).as("v"))
    val dims = oldCents.head._2.size
    val (rows, modelProps, newErr) =
      idx.properties.get(CodebookProp) match {
        case Some(rawCb) =>
          val oldCb = decodeCodebook(rawCb)
          val numSubs = oldCb.map(_._1).max + 1
          val codebookSize = oldCb.count(_._1 == 0)
          val (cents, cb, codes) = Similarity.ivfPqIndex(vecs, dims,
            numCentroids = oldCents.size, lloydIters = lloydIters,
            numSubs = numSubs, codebookSize = codebookSize)
          (codes.select("vec_id", "codes", "cid"),
            Map(CentroidsProp -> encodeCentroids(cents),
              CodebookProp -> encodeCodebook(cb)),
            Similarity.ivfPqQuantError(vecs, dims, cents, cb, numSubs))
        case None =>
          val (cents, assignments) = Similarity.ivfIndex(vecs,
            numCentroids = oldCents.size, lloydIters = lloydIters)
          (assignments.select(col("vec_id"),
              col("v").cast("array<float>").as("v"), col("cid")),
            Map(CentroidsProp -> encodeCentroids(cents)),
            Similarity.ivfQuantError(vecs, cents))
      }
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val files = TableWrites.writeParquet(rows,
      s"$idxDir/data/rebuild-$tag",
      graft.core.CompactionConfig().parquetCompression)
    val errStr = newErr.getOrElse(0L).toString
    new graft.txn.CommitManager(idxDir, catalog = catalog).overwriteAll(
      files.filter(_._3 > 0).map { case (p, len, rc) =>
        graft.sources.ParquetStats.stampBounds(
          graft.txn.FileEntry(p, "data", len, rc, -1L))
      },
      expectedSchemaId = idx.schemaId,
      setProperties = modelProps ++ Map(
        SyncedProp -> corpusV.toString,
        // the rebuilt model IS the new baseline: drift resets to 1
        BaseErrProp -> errStr,
        LastErrProp -> errStr),
      validate = reloaded => {
        val nowV = reloaded.properties.get(SyncedProp)
          .flatMap(_.toLongOption).getOrElse(-1L)
        if (nowV != lastV) throw CompactionError.Config(
          s"concurrent index change: marker moved v$lastV -> v$nowV; " +
            "re-evaluate drift against the newer state")
      })
    corpusV
  }

  /** The drift-gated rebuild policy: retrain + swap via [[rebuild]]
    * when the last refresh's quantization error exceeds
    * `whenDriftOverX1000`/1000 x the build-time baseline (stamped
    * [[BaseErrProp]]/[[LastErrProp]]). No-ops (returns None) when the
    * telemetry is absent — a never-refreshed index has no drift signal
    * — or when the trend is inside the budget; returns the served
    * corpus version after a rebuild. */
  def rebuildIfDrifted(
      spark: SparkSession,
      corpusDir: String,
      idxDir: String,
      whenDriftOverX1000: Long = 1500,
      catalog: TableCatalog = FileTableCatalog
  ): Option[Long] = {
    val props = catalog.loadOrThrow(idxDir).properties
    val drifted = for {
      base <- props.get(BaseErrProp).flatMap(_.toLongOption)
      last <- props.get(LastErrProp).flatMap(_.toLongOption)
    } yield BigInt(last) * 1000 > BigInt(base) * whenDriftOverX1000 // no overflow: errors are squared-L2 sums near 2^60
    if (drifted.contains(true))
      Some(rebuild(spark, corpusDir, idxDir, catalog))
    else None
  }
}
