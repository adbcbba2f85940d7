package graft.pipeline

import graft.txn.{FileTableCatalog, TableCatalog}
import org.apache.spark.sql.SparkSession

/** Registry + dispatch for SERVING INDEXES maintained from a corpus
  * table's changelog — the glue that makes index freshness a property
  * of the INGEST path instead of a scheduler:
  *
  *  - a corpus table lists its indexes under [[RegisteredProp]] (the
  *    [[graft.mv.MaterializedView.RegisteredProp]] discipline — a
  *    zero-conf registry riding on the table itself);
  *  - [[refreshAll]] brings every registered index up to the corpus's
  *    current version, dispatching on the index's own metadata: a
  *    [[AnnIndex.CentroidsProp]] marks an IVF vector index, a
  *    [[TextIndex.StatsProp]] an inverted text index — each refresh is
  *    that index's ONE-atomic-commit changelog catch-up, cost ∝ the
  *    net change, never the corpus;
  *  - [[graft.streaming.StreamingIngest.withIndexMaintenance]] wraps a
  *    streaming sink with refreshAll, giving the same failure
  *    semantics as MV maintenance: a refresh failure after the data
  *    commit leaves the index STALE, never wrong — the serving gate
  *    (synced-version == corpus version) detects the lag and the next
  *    batch catches up.
  */
object IndexMaintenance {

  /** Comma-separated index dirs on the CORPUS table. */
  val RegisteredProp = "graft.index.registered"

  /** One registered index kind: the marker property that identifies it,
    * its display name, the property naming its source corpus, and its
    * changelog catch-up. */
  final case class IndexKind(
      markerProp: String,
      kind: String,
      sourceProp: String,
      refresh: (SparkSession, String, String, TableCatalog) => Long)

  /** THE index-kind dispatch table — refreshAll, `CALL refresh_index`,
    * and `CALL rebuild_index` all resolve through this, so a new index
    * kind is added in exactly one place. ORDER MATTERS: an IVF-PQ index
    * carries BOTH CodebookProp and CentroidsProp, so the codebook row
    * must come first (the plain IVF path would write (vec_id, v, cid)
    * rows into a (vec_id, codes, cid) table). */
  val kinds: Seq[IndexKind] = Seq(
    IndexKind(AnnIndex.CodebookProp, "ann-ivfpq", AnnIndex.SourceProp,
      AnnIndex.refreshPq(_, _, _, _)),
    IndexKind(AnnIndex.CentroidsProp, "ann-ivf", AnnIndex.SourceProp,
      AnnIndex.refresh(_, _, _, _)),
    IndexKind(TextIndex.StatsProp, "text-tf", TextIndex.SourceProp,
      TextIndex.refresh(_, _, _, _)),
    IndexKind(TextIndex.PosProp, "text-positional", TextIndex.SourceProp,
      TextIndex.refreshPositional(_, _, _, _)),
    IndexKind(DedupIndex.ParamsProp, "dedup-bands", DedupIndex.SourceProp,
      DedupIndex.refresh(_, _, _, _)))

  /** Resolve an index's kind from its table properties (first marker
    * match wins — see the ordering note on [[kinds]]). */
  def kindOf(props: Map[String, String]): Option[IndexKind] =
    kinds.find(k => props.contains(k.markerProp))

  /** [[kindOf]] that throws the standard structured error. */
  def kindOfOrThrow(props: Map[String, String], idxDir: String): IndexKind =
    kindOf(props).getOrElse(throw graft.core.CompactionError.Config(
      s"$idxDir carries no index metadata (none of " +
        s"${kinds.map(_.markerProp).mkString(", ")}) — not a " +
        "maintainable index"))

  /** The index's stored source corpus, structurally validated. */
  def sourceOf(kind: IndexKind, props: Map[String, String],
      idxDir: String): String =
    props.getOrElse(kind.sourceProp, throw graft.core.CompactionError
      .Config(s"$idxDir carries no ${kind.sourceProp} — index without " +
        "a source corpus"))

  def parseList(raw: String): Seq[String] =
    raw.split(",").map(_.trim).filter(_.nonEmpty).toSeq
  def encodeList(dirs: Seq[String]): String = dirs.mkString(",")

  /** Add `idxDir` to the corpus's registry (idempotent, CAS-safe). */
  def register(corpusDir: String, idxDir: String,
      catalog: TableCatalog = FileTableCatalog): Unit = {
    val cur = catalog.loadOrThrow(corpusDir)
    new graft.txn.CommitManager(corpusDir, catalog = catalog)
      .updateTableProperties(cur.schemaId) { reloaded =>
        val existing = reloaded.properties.get(RegisteredProp)
          .map(parseList).getOrElse(Nil)
        (Map(RegisteredProp -> encodeList((existing :+ idxDir).distinct)),
          Set.empty)
      }
  }

  /** Remove `idxDir` from the registry (no-op when absent). */
  def unregister(corpusDir: String, idxDir: String,
      catalog: TableCatalog = FileTableCatalog): Unit = {
    val cur = catalog.loadOrThrow(corpusDir)
    new graft.txn.CommitManager(corpusDir, catalog = catalog)
      .updateTableProperties(cur.schemaId) { reloaded =>
        val remaining = reloaded.properties.get(RegisteredProp)
          .map(parseList).getOrElse(Nil).filterNot(_ == idxDir)
        if (remaining.isEmpty)
          (Map.empty[String, String], Set(RegisteredProp))
        else (Map(RegisteredProp -> encodeList(remaining)),
          Set.empty[String])
      }
  }

  /** Bring every registered index of `corpusDir` to the corpus's
    * current version. EVERY registered index is attempted — one broken
    * registry entry must not starve the indexes listed after it —
    * then a single aggregate error rethrows the failures (callers that
    * must not fail — the streaming wrapper — catch per policy).
    * Dispatch reads the index's own metadata; a compressed IVF-PQ
    * index carries BOTH [[AnnIndex.CodebookProp]] and
    * [[AnnIndex.CentroidsProp]], so the codebook check runs first
    * (the plain IVF path would write (vec_id, v, cid) rows into a
    * (vec_id, codes, cid) table). */
  def refreshAll(spark: SparkSession, corpusDir: String,
      catalog: TableCatalog = FileTableCatalog): Unit = {
    val failures = catalog.load(corpusDir).toSeq
      .flatMap(_.properties.get(RegisteredProp))
      .flatMap(parseList)
      .flatMap { idxDir =>
        try {
          val props = catalog.loadOrThrow(idxDir).properties
          kindOfOrThrow(props, idxDir)
            .refresh(spark, corpusDir, idxDir, catalog)
          // opt-in drift policy: an ANN index carrying a rebuild budget
          // re-trains + swaps right here when the refresh's stamped
          // error trend exceeds it — the full frozen-model lifecycle on
          // the ingest path, no scheduler
          props.get(AnnIndex.RebuildBudgetProp).flatMap(_.toLongOption)
            .foreach { budget =>
              AnnIndex.rebuildIfDrifted(spark, corpusDir, idxDir,
                whenDriftOverX1000 = budget, catalog = catalog)
            }
          None
        } catch {
          case scala.util.control.NonFatal(e) =>
            Some(s"$idxDir: ${e.getMessage}")
        }
      }
    if (failures.nonEmpty) throw graft.core.CompactionError.Config(
      s"index maintenance failed for ${failures.size} of the registered " +
        s"indexes (the rest refreshed):\n  ${failures.mkString("\n  ")}")
  }
}
