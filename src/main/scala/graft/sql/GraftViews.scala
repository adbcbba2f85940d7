package graft.sql

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import graft.io.FileIO
import org.apache.spark.sql.types.StructType

/** Persisted SQL VIEW metadata — the Iceberg view-spec shape
  * (view versions, each carrying a schema snapshot and one SQL
  * representation with a dialect, plus a current-version pointer)
  * serialized as immutable per-version JSON files under
  * `<viewDir>/viewmeta/view.v<N>.json`, committed with the same
  * create-if-absent CAS as table snapshots ([[FileIO.casCreate]]) —
  * a racing CREATE OR REPLACE loses cleanly instead of tearing.
  *
  * Views are metadata-only: nothing under the directory but the JSON,
  * so RENAME is a directory move (tables refuse rename because data
  * files are addressed absolutely; views hold no paths).
  */
object GraftViews {

  /** One view version (spec: view-version). `schemaJson` is the Spark
    * StructType JSON (lossless round-trip); `sql` is the single
    * representation, dialect "spark". */
  final case class ViewVersion(
      versionId: Long,
      timestampMs: Long,
      sql: String,
      dialect: String,
      schemaJson: String,
      currentCatalog: String,
      currentNamespace: Seq[String],
      queryColumnNames: Seq[String],
      columnAliases: Seq[String],
      columnComments: Seq[String])

  /** The whole view document (spec: view metadata). */
  final case class ViewDoc(
      viewUuid: String,
      formatVersion: Int,
      currentVersionId: Long,
      versions: Seq[ViewVersion],
      properties: Map[String, String])

  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(com.fasterxml.jackson.databind.DeserializationFeature
      .FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  def metaDir(viewDir: String): String = s"$viewDir/viewmeta"
  private def metaPath(viewDir: String, n: Long): String =
    s"${metaDir(viewDir)}/view.v$n.json"
  private val MetaFile = "^view\\.v(\\d+)\\.json$".r

  /** Metadata file numbers under the view dir, oldest first (each file
    * holds the FULL doc; newest wins — the table-version pattern). */
  def metaNumbers(viewDir: String): Seq[Long] =
    FileIO.listFiles(metaDir(viewDir)).flatMap { case (path, _) =>
      val name = path.substring(path.lastIndexOf('/') + 1)
      MetaFile.findFirstMatchIn(name).map(_.group(1).toLong)
    }.sorted

  def exists(viewDir: String): Boolean = metaNumbers(viewDir).nonEmpty

  def load(viewDir: String): Option[ViewDoc] =
    metaNumbers(viewDir).lastOption.map { n =>
      norm(mapper.readValue(FileIO.readString(metaPath(viewDir, n)),
        classOf[ViewDoc]))
    }

  private def norm(d: ViewDoc): ViewDoc = {
    val p = if (d.properties == null) d.copy(properties = Map.empty) else d
    if (p.versions == null) p.copy(versions = Nil) else p
  }

  /** CAS-commit `doc` as metadata file number `n` (create-if-absent —
    * a concurrent writer to the same number throws). */
  def commit(viewDir: String, n: Long, doc: ViewDoc): Unit =
    try FileIO.casCreate(metaPath(viewDir, n),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(doc))
    catch {
      case e: FileIO.AlreadyExists =>
        throw graft.core.CompactionError.CommitConflict(
          s"view metadata v$n already exists (concurrent commit): ${e.getMessage}")
    }

  def schemaOf(v: ViewVersion): StructType =
    org.apache.spark.sql.types.DataType.fromJson(v.schemaJson)
      .asInstanceOf[StructType]

  def currentVersion(doc: ViewDoc): ViewVersion =
    doc.versions.find(_.versionId == doc.currentVersionId).getOrElse(
      throw graft.core.CompactionError.Config(
        s"view current-version-id ${doc.currentVersionId} not in versions " +
          s"(${doc.versions.map(_.versionId).mkString(", ")})"))

  /** Delete every metadata file of the view (DROP VIEW). */
  def drop(viewDir: String): Boolean = {
    val ns = metaNumbers(viewDir)
    ns.foreach(n => FileIO.delete(metaPath(viewDir, n)))
    ns.nonEmpty
  }
}

/** The DSv2 [[org.apache.spark.sql.connector.catalog.View]] handed to
  * Spark: the CURRENT version of a persisted view document. Spark
  * re-parses `query` under (`currentCatalog`, `currentNamespace`) at
  * every read, so views track their underlying tables' data AND schema
  * evolution automatically — the stored schema is the create-time
  * snapshot, used by Spark for column-count validation. */
final class GraftView(
    ident: org.apache.spark.sql.connector.catalog.Identifier,
    doc: GraftViews.ViewDoc)
    extends org.apache.spark.sql.connector.catalog.View {
  private val cur = GraftViews.currentVersion(doc)
  override def name(): String = ident.toString
  override def query(): String = cur.sql
  override def currentCatalog(): String = cur.currentCatalog
  override def currentNamespace(): Array[String] = cur.currentNamespace.toArray
  override def schema(): StructType = GraftViews.schemaOf(cur)
  override def queryColumnNames(): Array[String] = cur.queryColumnNames.toArray
  override def columnAliases(): Array[String] = cur.columnAliases.toArray
  override def columnComments(): Array[String] = cur.columnComments.toArray
  override def properties(): java.util.Map[String, String] = {
    import scala.jdk.CollectionConverters._
    doc.properties.asJava
  }
}
