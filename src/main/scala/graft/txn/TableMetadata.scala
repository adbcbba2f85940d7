package graft.txn

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import graft.core._
import graft.io.FileIO

/** Snapshot-versioned table metadata over a filesystem — the stand-in for
  * an Iceberg catalog where no Iceberg runtime jar exists (SURVEY §7.1:
  * "an Iceberg-backed TablePlanner/CommitManager slots in where the jar
  * exists"). Matches the Iceberg model the reference manipulates:
  * a current snapshot that references data + delete files, each with a
  * data sequence number, under a schema id
  * (reference core/src/compaction/mod.rs:363-392,464-614).
  *
  * All IO goes through [[graft.io.FileIO]] (Hadoop FileSystem), so the
  * table directory can live on any scheme the classpath supports
  * (`file:`, `hdfs://`, `s3a://`, ...), mirroring the reference's
  * `FileIO` abstraction (core/src/executor/mod.rs:38-45).
  *
  * Layout:
  * {{{
  *   tableDir/metadata/v<N>.json    // snapshot N (monotonically increasing)
  *   tableDir/data/...              // parquet files (any layout)
  * }}}
  *
  * Commit protocol: publish `v<N+1>.json` via [[FileIO.casCreate]] — an
  * atomic create-if-absent (hard link on local FS, create(overwrite=false)
  * elsewhere). A concurrent committer that created v<N+1> first wins and
  * the create throws, surfacing as a retryable
  * [[CompactionError.CommitConflict]] (compare-and-swap on the version
  * number, the same optimistic concurrency Iceberg catalogs provide).
  */
final case class FileEntry(
    path: String,
    content: String, // "data" | "position-deletes" | "equality-deletes" | "deletion-vectors"
    sizeBytes: Long,
    recordCount: Long,
    sequenceNumber: Long,
    equalityIds: Seq[String] = Nil,
    /** Schema id this file was written under (see
      * [[graft.core.FileScanTask.schemaId]]); stamped by the commit. */
    schemaId: Long = -1L,
    /** PARTITION-SPEC id this file was written under (the Iceberg
      * per-file spec-id model): after a partition-spec evolution,
      * pruning consults each file's OWN spec — comparing a bucket(8)
      * ordinal against a file laid out under bucket(4) would silently
      * drop matching files. Stamped by the commit from the snapshot's
      * current spec id; -1 in memory = "stamp me"; files persisted
      * before this field existed reload as 0 (Jackson primitive
      * default), which correctly names the table's FIRST spec. */
    specId: Long = -1L,
    /** Per-column `[lo, hi]` footer bounds stamped at WRITE time (the
      * Iceberg-manifest model): scan planning prunes files from snapshot
      * METADATA alone instead of one footer round-trip per file per
      * query — the difference between O(files) driver IO and O(1) at
      * 100k files. Value-domain for int/long/date columns
      * ([[graft.sources.ParquetStats]] trust rules); keyed by the
      * write-time column names. Empty = not stamped (pre-feature file or
      * no trustworthy columns) → planning falls back to the footer. */
    bounds: Map[String, Seq[Long]] = Map.empty,
    /** Like [[bounds]] but for decimal(≤18) columns, in UNSCALED space —
      * kept separate because only type-aware consumers whose constraints
      * are already unscaled may compare against these. */
    decimalBounds: Map[String, Seq[Long]] = Map.empty,
    /** Per-column null counts stamped at WRITE time — TOP-LEVEL columns
      * of any type (the Iceberg `null_value_counts` model). Drives
      * COUNT(col) metadata aggregation and IS [NOT] NULL file pruning.
      * Empty = not stamped (pre-feature file) → consumers fall back. */
    nullCounts: Map[String, Long] = Map.empty,
    /** Like [[bounds]] but for STRING columns: base64 of the raw
      * `[lo, hi]` byte bounds in parquet's unsigned lexicographic
      * order, truncated to 16 bytes Iceberg-style (the upper bound is
      * incremented when truncated, so it stays a valid upper bound).
      * Consumers compare candidate UTF-8 bytes unsigned. */
    stringBounds: Map[String, Seq[String]] = Map.empty,
    /** Per-column KMV distinct-count sketches stamped by the ROW-LEVEL
      * writers ([[graft.core.NdvSketch]]): base64 of the K smallest
      * distinct unsigned xxHash64 values of the column IN THIS FILE.
      * Merged at plan time into an append-surviving table NDV
      * ([[TableAnalyze.sketchNdv]]). Empty = unsketched (pre-feature
      * file, Spark-native write, or ineligible column types) — which
      * DISABLES the sketch estimate for the whole table rather than
      * undercounting. */
    ndvSketch: Map[String, String] = Map.empty,
    /** Physical row order of THIS file, [[graft.core.WriteOrderCodec]]
      * encoding ("" = unknown/unsorted — every pre-feature or
      * Spark-native file). Stamped by writers that PROVE the layout:
      * the sorted DSv2 write (required distribution+ordering, so each
      * file is a contiguous slice of a task's sorted stream) and the
      * sort-layout compaction rewrite. Read by the scan's
      * `SupportsReportOrdering` gate — claims per-file sortedness, so
      * it must never be stamped speculatively. */
    sortedBy: String = "",
    /** Deletion-vector entries only (content "deletion-vectors"): the
      * one data file this vector's ordinals reference, and the blob's
      * byte address inside the Puffin container at `path` (Iceberg v3
      * `referenced_data_file` / `content_offset` /
      * `content_size_in_bytes`). `recordCount` is the vector's
      * cardinality. */
    referencedDataFile: Option[String] = None,
    contentOffset: Long = 0L,
    contentSizeBytes: Long = 0L
) {
  def toTask: FileScanTask = FileScanTask(
    filePath = path,
    content = content match {
      case "data"              => FileContent.Data
      case "position-deletes"  => FileContent.PositionDeletes
      case "equality-deletes"  => FileContent.EqualityDeletes
      case "deletion-vectors"  => FileContent.DeletionVectors
      case other => throw CompactionError.Config(s"unknown content type: $other")
    },
    lengthBytes = sizeBytes,
    recordCount = recordCount,
    sequenceNumber = sequenceNumber,
    equalityIds = equalityIds,
    schemaId = schemaId,
    referencedDataFile = referencedDataFile,
    contentOffset = contentOffset,
    contentSizeBytes = contentSizeBytes
  )
}

object FileEntry {
  /** Decode one stamped `[lo, hi]` pair. Jackson's type-erased
    * deserialization materializes the inner Seq[Long] as boxed Integers
    * when values fit — read through Number so a reloaded snapshot
    * compares identically to a freshly stamped one. */
  def loHi(v: Seq[Long]): Option[(Long, Long)] = {
    val s = v.asInstanceOf[Seq[Any]]
    if (s.length != 2) None
    else Some((s(0).asInstanceOf[Number].longValue,
      s(1).asInstanceOf[Number].longValue))
  }

  /** Read one stamped count through the same type-erasure guard: a
    * reloaded snapshot's `Map[String, Long]` values may be boxed
    * Integers at runtime. */
  def longAt(m: Map[String, Long], c: String): Option[Long] =
    m.asInstanceOf[Map[String, Any]].get(c)
      .map(_.asInstanceOf[Number].longValue)
}

final case class TableSnapshot(
    version: Long,
    schemaId: Long,
    /** Highest data sequence number assigned so far. */
    lastSequenceNumber: Long,
    files: Seq[FileEntry],
    /** Snapshot-carried table properties (e.g. the streaming-ingest
      * replay marker). Commits PRESERVE these unless told otherwise —
      * a compaction must not erase an ingest sink's idempotence state. */
    properties: Map[String, String] = Map.empty,
    /** Schema HISTORY (empty until the first [[SchemaEvolution.evolve]]):
      * every schema version ever current, by id. `schemaId` above names
      * the current one. Files resolve to the current schema by field id
      * through this history — the Iceberg evolution model. */
    schemas: Seq[graft.core.TableSchema] = Nil,
    /** Wall-clock commit time (epoch millis), stamped by
      * [[CommitManager]] at CAS time — drives `TIMESTAMP AS OF` time
      * travel and snapshot-age expiry policies. Snapshots written
      * before this field existed deserialize as 0 (primitive default):
      * "unknown, treat as older than any timestamp". */
    committedAtMs: Long = 0L
) {
  def currentSchema: Option[graft.core.TableSchema] =
    schemas.find(_.schemaId == schemaId)

  /** Whether `f`'s physical column names mean what the CURRENT schema
    * says — the guard every name-keyed optimization (bounds pruning,
    * eq-delete skipping) must consult on an evolved table. Legacy ids
    * (-1) are trustworthy only because evolve-commits stamp every file
    * they leave behind ([[CommitManager.evolveSchema]]). */
  def isCurrentSchema(f: FileEntry): Boolean =
    schemas.isEmpty || f.schemaId < 0 || f.schemaId == schemaId
}

object TableMetadata {
  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  private val VersionFile = "^v(\\d+)\\.json$".r

  def metadataDir(tableDir: String) = s"$tableDir/metadata"

  def versionPath(tableDir: String, version: Long): String =
    s"${metadataDir(tableDir)}/v$version.json"

  /** Newest version NUMBER on disk — including WAP-staged snapshots;
    * current-STATE resolution is [[load]], which skips staged. */
  def currentVersion(tableDir: String): Option[Long] = {
    val vs = versions(tableDir)
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** Canonical snapshot JSON — the wire format shared by the metadata
    * files and the network catalog client ([[RestTableCatalog]]). */
  def snapshotToJson(s: TableSnapshot): String =
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(s)

  def snapshotFromJson(json: String): TableSnapshot =
    norm(mapper.readValue(json, classOf[TableSnapshot]))

  /** Snapshots written before the `properties`/`schemas` fields (or the
    * per-entry `equalityIds`/`bounds`/`decimalBounds`/`nullCounts`
    * stamps) existed deserialize with null collections — normalize to
    * empty so every consumer can assume non-null. */
  private def norm(s: TableSnapshot): TableSnapshot = {
    val p0 = if (s.properties == null) s.copy(properties = Map.empty) else s
    val p1 = if (p0.schemas == null) p0.copy(schemas = Nil) else p0
    // schema JSON written before column defaults existed deserializes
    // the Option fields as null — normalize to None
    val p = p1.copy(schemas = p1.schemas.map(sc => sc.copy(
      fields = sc.fields.map { f =>
        var g = f
        if (g.initialDefault == null) g = g.copy(initialDefault = None)
        if (g.writeDefault == null) g = g.copy(writeDefault = None)
        g
      })))
    if (p.files == null) p.copy(files = Nil)
    else p.copy(files = p.files.map { f =>
      var e = f
      if (e.equalityIds == null) e = e.copy(equalityIds = Nil)
      if (e.bounds == null) e = e.copy(bounds = Map.empty)
      if (e.decimalBounds == null) e = e.copy(decimalBounds = Map.empty)
      if (e.nullCounts == null) e = e.copy(nullCounts = Map.empty)
      if (e.stringBounds == null) e = e.copy(stringBounds = Map.empty)
      if (e.ndvSketch == null) e = e.copy(ndvSketch = Map.empty)
      if (e.referencedDataFile == null) e = e.copy(referencedDataFile = None)
      e
    })
  }

  /** Resolve the CURRENT snapshot: the newest version that is not a
    * WAP-staged or branch commit ([[Branch.isOutOfMain]] — both hold
    * real version numbers but are outside the main lineage until
    * published / fast-forwarded).
    * The walk-back is one extra read per live staged tip, and zero when
    * nothing is staged.
    *
    * A version listed but GONE by read time is skipped: the only
    * versions that can vanish under a reader are staged tombstones
    * being reaped by snapshot expiration (expiration never deletes the
    * newest MAIN version — the keep-last floor is 1). Any other read
    * failure (corrupt file, IO error) still propagates — silently
    * serving an older snapshot would be a wrong answer. */
  def load(tableDir: String): Option[TableSnapshot] =
    versions(tableDir).reverseIterator
      .flatMap { v =>
        try Some(norm(mapper.readValue(
          FileIO.readString(versionPath(tableDir, v)), classOf[TableSnapshot])))
        catch { case _: java.io.FileNotFoundException => None }
      }
      .find(!Branch.isOutOfMain(_))

  def loadOrThrow(tableDir: String): TableSnapshot =
    load(tableDir).getOrElse(
      throw CompactionError.Config(s"no table metadata under $tableDir"))

  /** CAS-commit `snapshot` as the next version. Throws
    * [[CompactionError.CommitConflict]] if that version already exists
    * (see [[FileIO.casCreate]] for the per-scheme atomic primitive). */
  def commit(tableDir: String, snapshot: TableSnapshot): Unit = {
    val target = versionPath(tableDir, snapshot.version)
    val body = mapper.writerWithDefaultPrettyPrinter().writeValueAsString(snapshot)
    try FileIO.casCreate(target, body)
    catch {
      case e: FileIO.AlreadyExists =>
        throw CompactionError.CommitConflict(
          s"snapshot v${snapshot.version} already exists (concurrent commit): ${e.getMessage}")
    }
  }

  /** Load a SPECIFIC snapshot version (shared mapper). */
  def loadVersion(tableDir: String, version: Long): Option[TableSnapshot] = {
    val p = versionPath(tableDir, version)
    if (!FileIO.exists(p)) None
    else Some(norm(mapper.readValue(FileIO.readString(p), classOf[TableSnapshot])))
  }

  /** List snapshot versions, oldest first. */
  def versions(tableDir: String): Seq[Long] =
    FileIO.listFiles(metadataDir(tableDir))
      .flatMap { case (path, _) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        VersionFile.findFirstMatchIn(name).map(_.group(1).toLong)
      }
      .sorted
}
