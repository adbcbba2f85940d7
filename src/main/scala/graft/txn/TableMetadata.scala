package graft.txn

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import graft.core._

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Snapshot-versioned table metadata over a filesystem — the stand-in for
  * an Iceberg catalog where no Iceberg runtime jar exists (SURVEY §7.1:
  * "an Iceberg-backed TablePlanner/CommitManager slots in where the jar
  * exists"). Matches the Iceberg model the reference manipulates:
  * a current snapshot that references data + delete files, each with a
  * data sequence number, under a schema id
  * (reference core/src/compaction/mod.rs:363-392,464-614).
  *
  * Layout:
  * {{{
  *   tableDir/metadata/v<N>.json    // snapshot N (monotonically increasing)
  *   tableDir/data/...              // parquet files (any layout)
  * }}}
  *
  * Commit protocol: write `v<N+1>.json.tmp`, then atomically move to
  * `v<N+1>.json` WITHOUT replace — a concurrent committer that created
  * v<N+1> first wins and the move throws, surfacing as a retryable
  * [[CompactionError.CommitConflict]] (compare-and-swap on the version
  * number, the same optimistic concurrency Iceberg catalogs provide).
  */
final case class FileEntry(
    path: String,
    content: String, // "data" | "position-deletes" | "equality-deletes"
    sizeBytes: Long,
    recordCount: Long,
    sequenceNumber: Long,
    equalityIds: Seq[String] = Nil
) {
  def toTask: FileScanTask = FileScanTask(
    filePath = path,
    content = content match {
      case "data"              => FileContent.Data
      case "position-deletes"  => FileContent.PositionDeletes
      case "equality-deletes"  => FileContent.EqualityDeletes
      case other => throw CompactionError.Config(s"unknown content type: $other")
    },
    lengthBytes = sizeBytes,
    recordCount = recordCount,
    sequenceNumber = sequenceNumber,
    equalityIds = equalityIds
  )
}

final case class TableSnapshot(
    version: Long,
    schemaId: Long,
    /** Highest data sequence number assigned so far. */
    lastSequenceNumber: Long,
    files: Seq[FileEntry]
)

object TableMetadata {
  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  def metadataDir(tableDir: String) = s"$tableDir/metadata"

  def currentVersion(tableDir: String): Option[Long] = {
    val dir = new File(metadataDir(tableDir))
    val versions = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.isFile)
      .flatMap(f => "^v(\\d+)\\.json$".r.findFirstMatchIn(f.getName).map(_.group(1).toLong))
    if (versions.isEmpty) None else Some(versions.max)
  }

  def load(tableDir: String): Option[TableSnapshot] =
    currentVersion(tableDir).map { v =>
      val p = Paths.get(metadataDir(tableDir), s"v$v.json")
      mapper.readValue(Files.readString(p), classOf[TableSnapshot])
    }

  def loadOrThrow(tableDir: String): TableSnapshot =
    load(tableDir).getOrElse(
      throw CompactionError.Config(s"no table metadata under $tableDir"))

  /** CAS-commit `snapshot` as the next version. Throws
    * [[CompactionError.CommitConflict]] if that version already exists.
    *
    * The publish step is an atomic HARD LINK of the fully-written temp
    * file: POSIX `link()` fails with EEXIST when the target exists, which
    * a rename does NOT (on Linux, `Files.move(..., ATOMIC_MOVE)` silently
    * REPLACES an existing regular file — a rename-based CAS would let a
    * losing concurrent committer overwrite the winner's snapshot). */
  def commit(tableDir: String, snapshot: TableSnapshot): Unit = {
    val dir = Paths.get(metadataDir(tableDir))
    Files.createDirectories(dir)
    val target = dir.resolve(s"v${snapshot.version}.json")
    val tmp = dir.resolve(s"v${snapshot.version}.json.${java.util.UUID.randomUUID()}.tmp")
    Files.writeString(tmp, mapper.writerWithDefaultPrettyPrinter().writeValueAsString(snapshot))
    try
      Files.createLink(target, tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw CompactionError.CommitConflict(
          s"snapshot v${snapshot.version} already exists (concurrent commit)")
      case e: java.nio.file.FileSystemException if Files.exists(target) =>
        throw CompactionError.CommitConflict(
          s"snapshot v${snapshot.version} already exists: ${e.getMessage}")
    } finally
      Files.deleteIfExists(tmp)
  }

  /** Load a SPECIFIC snapshot version (shared mapper). */
  def loadVersion(tableDir: String, version: Long): Option[TableSnapshot] = {
    val p = Paths.get(metadataDir(tableDir), s"v$version.json")
    if (!Files.exists(p) || !Files.isRegularFile(p)) None
    else Some(mapper.readValue(Files.readString(p), classOf[TableSnapshot]))
  }

  /** List snapshot versions, oldest first. */
  def versions(tableDir: String): Seq[Long] = {
    val dir = new File(metadataDir(tableDir))
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.isFile)
      .flatMap(f => "^v(\\d+)\\.json$".r.findFirstMatchIn(f.getName).map(_.group(1).toLong))
      .sorted.toSeq
  }
}
