package graft.pipeline

import graft.core.CompactionError
import graft.txn.{FileTableCatalog, TableCatalog, TableSnapshot, TableWrites}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Opt-in DELTA-FOLD budget on an INDEX table: refresh commits write
    * UNPARTITIONED delta files (correct, but a bucket/identity-pruned
    * probe must read every delta alongside its pruned base buckets), so
    * under continuous ingest pruning degrades without bound. An index
    * carrying this property (a file count N) gets a Full compaction —
    * folding every delta back into the table's partition layout —
    * whenever [[refreshAll]] leaves it with more than N layout-less
    * data files: the same fold-the-backlog lifecycle streaming
    * auto-compaction gives data tables, and the automated form of
    * `CALL rebuild_index`'s delta fold, riding the ingest path with
    * zero scheduling (the [[AnnIndex.RebuildBudgetProp]] discipline). */
  val CompactOverProp = "graft.index.compact-over-deltas"

  /** Count of `idx`'s data files OUTSIDE its partition layout (no
    * parsed partition prefix — refresh deltas); for an unpartitioned
    * index every data file counts, so the same budget folds small
    * files. */
  def deltaFileCount(idx: TableSnapshot): Int = {
    val spec = graft.core.PartitionSpecCodec.of(Some(idx))
    val data = idx.files.filter(_.content == "data")
    if (spec.isEmpty) data.size
    else data.count(f => graft.core.PartitionKey.parse(f.path).isEmpty)
  }

  /** Fold `idxDir`'s refresh deltas into its partition layout when the
    * budget is exceeded; returns true when a compaction ran. */
  def foldDeltasIfOver(spark: SparkSession, idxDir: String, over: Int,
      catalog: TableCatalog = FileTableCatalog): Boolean = {
    val deltas = deltaFileCount(catalog.loadOrThrow(idxDir))
    if (deltas <= over) false
    else {
      graft.compaction.Compaction.builder()
        .withSpark(spark)
        .withTableDir(idxDir)
        .withCatalog(catalog)
        .withConfig(graft.core.CompactionConfig(
          compactionType = graft.core.CompactionType.Full))
        .build().compact()
      true
    }
  }

  /** THE one changelog-refresh lifecycle every index kind shares —
    * [[TextIndex.refresh]], [[TextIndex.refreshPositional]],
    * [[AnnIndex.refresh]]/[[AnnIndex.refreshPq]], and
    * [[DedupIndex.refresh]] are all this skeleton with a different
    * row derivation:
    *
    *  1. validate the index's stored source corpus and synced-version
    *     marker (`sourceProp` / `syncedProp`); no-op when the corpus
    *     hasn't advanced;
    *  2. net the corpus changelog since the marker (cost ∝ the change,
    *     never the corpus) and refuse a corpus that isn't keyed by
    *     unique `corpusIdCol` (net per-id multiplicity > 1 — an index
    *     keyed by id cannot represent duplicates);
    *  3. `derive` the index's new rows (and any extra properties —
    *     corpus constants, drift telemetry) from the net changelog;
    *  4. commit as ONE atomic upsert: equality-delete EVERY net-changed
    *     id's index rows (a pure insert's key deletes nothing —
    *     harmless), insert the derived rows, advance the marker and the
    *     extra properties in the SAME commit, and abort under the
    *     marker guard if a concurrent refresh moved it first — a reader
    *     always sees a complete index of SOME corpus version, never a
    *     half-refreshed one.
    *
    * A lifecycle fix lands here exactly once; the kinds in [[kinds]]
    * differ only in their `derive`.
    *
    * @param idx         the CALLER-loaded index snapshot — model
    *                    metadata (centroids, banding params, corpus
    *                    constants) must be decoded from the same load
    *                    the marker guard protects, or a rebuild racing
    *                    between two loads could pair a fresh marker
    *                    with stale model metadata
    * @param corpusIdCol the corpus's unique-key column
    * @param indexKeyCol the derived rows' key column (the upsert's
    *                    equality-delete key; net-changed corpus ids are
    *                    renamed onto it)
    * @param indexNoun   error-message noun ("an inverted index", …)
    * @param derive      net changelog → (new index rows, extra
    *                    properties committed atomically with the marker)
    * @return the new synced corpus version
    */
  def changelogRefresh(
      spark: SparkSession,
      corpusDir: String,
      idxDir: String,
      catalog: TableCatalog,
      idx: TableSnapshot,
      sourceProp: String,
      syncedProp: String,
      corpusIdCol: String,
      indexKeyCol: String,
      indexNoun: String
  )(derive: DataFrame => (DataFrame, Map[String, String])): Long = {
    if (!idx.properties.get(sourceProp).contains(corpusDir))
      throw CompactionError.Config(
        s"$idxDir does not index $corpusDir (build it first)")
    val lastV = idx.properties.get(syncedProp).flatMap(_.toLongOption)
      .getOrElse(throw CompactionError.Config(
        s"$idxDir carries no synced-version marker"))
    val curV = catalog.loadOrThrow(corpusDir).version
    if (curV <= lastV) return lastV

    val net = graft.sources.TableReader
      .netChangelog(spark, corpusDir, lastV, curV, catalog).persist()
    try {
      // duplicate-id guard: netChangelog nets per full ROW value, so two
      // inserts of one id with DIFFERENT payloads each net to count 1 —
      // group by id per change type (an update is a legitimate
      // delete+insert pair of one id), the Replicate.sync key contract
      val dup = net.groupBy(corpusIdCol, "_change_type")
        .agg(sum(col("_change_count")).as("c"))
        .filter(col("c") > 1L)
      if (!dup.isEmpty) throw CompactionError.Config(
        s"corpus rows are not unique per $corpusIdCol (net multiplicity " +
          s"> 1); $indexNoun keyed by $corpusIdCol cannot represent " +
          "duplicates")
      val (rows, extraProps) = derive(net)
      // every changed id's index rows are replaced wholesale
      val changedIds = net.select(col(corpusIdCol).as(indexKeyCol)).distinct()
      TableWrites.upsert(idxDir, rows, keyCols = Seq(indexKeyCol),
        catalog = catalog,
        deleteKeys = Some(changedIds),
        setProperties = Map(syncedProp -> curV.toString) ++ extraProps,
        validate = reloaded => {
          val nowV = reloaded.properties.get(syncedProp)
            .flatMap(_.toLongOption).getOrElse(-1L)
          if (nowV != lastV) throw CompactionError.Config(
            s"concurrent index refresh: marker moved v$lastV -> v$nowV; " +
              "re-run refresh (the newer state already covers this delta)")
        })
      curV
    } finally net.unpersist()
  }

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
          // opt-in delta-fold policy: too many layout-less refresh
          // deltas -> Full compaction back into the pruning layout
          props.get(CompactOverProp).flatMap(_.toIntOption)
            .foreach(foldDeltasIfOver(spark, idxDir, _, catalog))
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
