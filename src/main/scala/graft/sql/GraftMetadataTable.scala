package graft.sql

import graft.txn.{FileTableCatalog, TableCatalog}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util
import scala.jdk.CollectionConverters._

/** Inspection (metadata) tables, the Iceberg pattern:
  * `SELECT * FROM <cat>.db.t.files` / `....snapshots` — resolved by
  * [[GraftCatalog.loadTable]] when the identifier's namespace is itself
  * a table. Rows come straight from snapshot METADATA on the driver
  * ([[LocalScan]] — no Spark job, no file IO beyond the catalog load),
  * which is exactly the cost profile table inspection should have at
  * 100 TB: proportional to the metadata, not the data.
  */
object GraftMetadataTable {

  val Kinds: Set[String] =
    Set("files", "snapshots", "refs", "partitions", "manifests", "history")

  def apply(tableDir: String, kind: String,
      catalog: TableCatalog = FileTableCatalog): Table =
    new GraftMetadataTable(tableDir, kind, catalog)

  private[sql] val filesSchema = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("content", StringType, nullable = false),
    StructField("size_bytes", LongType, nullable = false),
    StructField("record_count", LongType, nullable = false),
    StructField("sequence_number", LongType, nullable = false),
    StructField("schema_id", LongType, nullable = false),
    // write-time stamps (Iceberg files-table surface): per-column null
    // counts, and min/max of the trusted integral columns ([[graft
    // .sources.ParquetStats.fileFacts]]; decimals are in UNSCALED space)
    StructField("null_value_counts",
      MapType(StringType, LongType, valueContainsNull = false), nullable = false),
    StructField("lower_bounds",
      MapType(StringType, LongType, valueContainsNull = false), nullable = false),
    StructField("upper_bounds",
      MapType(StringType, LongType, valueContainsNull = false), nullable = false),
    // deletion-vector entries: the data file the vector references
    // (null for every other content kind)
    StructField("referenced_data_file", StringType, nullable = true),
    // string-column byte bounds as stored (base64, 16-byte truncated,
    // incremented upper) — faithful to the stamp, not decoded, since
    // truncation can cut mid-codepoint
    StructField("string_lower_bounds",
      MapType(StringType, StringType, valueContainsNull = false), nullable = false),
    StructField("string_upper_bounds",
      MapType(StringType, StringType, valueContainsNull = false), nullable = false)))

  private[sql] val refsSchema = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("type", StringType, nullable = false),
    StructField("version", LongType, nullable = false)))

  /** Iceberg's manifests-table surface: the CURRENT snapshot's
    * manifest files (shared across snapshots under incremental
    * commits). Empty for graft-format tables — one JSON file list per
    * snapshot, no manifests to inspect. */
  private[sql] val manifestsSchema = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("content", StringType, nullable = false),
    StructField("length", LongType, nullable = false),
    StructField("added_snapshot_id", LongType, nullable = false),
    StructField("added_files_count", IntegerType, nullable = false),
    StructField("existing_files_count", IntegerType, nullable = false)))

  /** Iceberg's history-table surface: when each retained version became
    * current, its parent, and whether it is an ancestor of the CURRENT
    * state (out-of-line WAP/branch commits are not — they were never on
    * the main line). */
  private[sql] val historySchema = StructType(Seq(
    StructField("made_current_at_ms", LongType, nullable = false),
    StructField("version", LongType, nullable = false),
    StructField("parent_version", LongType, nullable = true),
    StructField("is_current_ancestor", BooleanType, nullable = false)))

  private[sql] val snapshotsSchema = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("committed_at_ms", LongType, nullable = false),
    StructField("schema_id", LongType, nullable = false),
    StructField("last_sequence_number", LongType, nullable = false),
    StructField("data_files", LongType, nullable = false),
    StructField("delete_files", LongType, nullable = false),
    // null when any data file's record count is unknown (pre-stamp
    // snapshots) — a partial sum would silently under-report
    StructField("total_records", LongType, nullable = true),
    // WAP surface: staged snapshots are outside main lineage until
    // published ([[graft.txn.Wap]]); wap_id is null on main commits
    StructField("staged", BooleanType, nullable = false),
    StructField("wap_id", StringType, nullable = true),
    // branch commits carry their branch name; null on main commits
    StructField("branch", StringType, nullable = true),
    // shape-derived operation ([[graft.txn.CommitShape]]); null when
    // the base snapshot is unresolvable (expired parent)
    StructField("operation", StringType, nullable = true)))

  /** Iceberg's partitions-table surface: per-partition health (file and
    * record counts, bytes) of the CURRENT snapshot, from metadata alone.
    * `partition` renders `field=value,...` in the file's OWN spec
    * (per-file spec ids — a mixed-layout table lists both layouts);
    * unpartitioned data rows under the empty string. */
  private[sql] val partitionsSchema = StructType(Seq(
    StructField("partition", StringType, nullable = false),
    StructField("spec_id", LongType, nullable = false),
    StructField("data_files", LongType, nullable = false),
    StructField("records", LongType, nullable = true),
    StructField("total_bytes", LongType, nullable = false),
    StructField("last_sequence_number", LongType, nullable = false)))
}

final class GraftMetadataTable(
    tableDir: String, kind: String, catalog: TableCatalog
) extends Table with SupportsRead {
  import GraftMetadataTable._

  override def name(): String = s"graft.`$tableDir`.$kind"
  override def schema(): StructType = kind match {
    case "files"      => filesSchema
    case "refs"       => refsSchema
    case "snapshots"  => snapshotsSchema
    case "partitions" => partitionsSchema
    case "manifests"  => manifestsSchema
    case "history"    => historySchema
    case other => throw graft.core.CompactionError.Config(
      s"unknown metadata table kind: $other")
  }
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        override def readSchema(): StructType = schema()
        override def rows(): Array[InternalRow] = computeRows()
        override def description(): String = name()
      }
    }

  /** The version a commit was BUILT ON: the explicit parent for
    * out-of-line (WAP/branch) commits, else the previous retained main
    * version — ONE derivation shared by `.snapshots` and `.history`. */
  private def parentVersionOf(loaded: Seq[graft.txn.TableSnapshot])(
      s: graft.txn.TableSnapshot): Option[Long] =
    if (graft.txn.Branch.isOutOfMain(s))
      (s.properties.get(graft.txn.Wap.ParentProp) orElse
        s.properties.get(graft.txn.Branch.ParentProp))
        .flatMap(_.toLongOption)
    else loaded.view
      .filter(p => p.version < s.version &&
        !graft.txn.Branch.isOutOfMain(p))
      .lastOption.map(_.version)

  private def computeRows(): Array[InternalRow] = kind match {
    case "files" =>
      // bounds merge the plain and the decimal (unscaled) stamp maps —
      // keys are disjoint by construction (a column stamps in one or
      // the other); deterministic key order for stable inspection output
      def mapData(m: Map[String, Long]): org.apache.spark.sql.catalyst.util.MapData = {
        val ks = m.keys.toSeq.sorted
        new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
          new org.apache.spark.sql.catalyst.util.GenericArrayData(
            ks.map(UTF8String.fromString)),
          new org.apache.spark.sql.catalyst.util.GenericArrayData(
            ks.map(k => graft.txn.FileEntry.longAt(m, k).get)))
      }
      def side(m: Map[String, Seq[Long]], lo: Boolean): Map[String, Long] =
        m.flatMap { case (k, v) => graft.txn.FileEntry.loHi(v)
          .map(b => k -> (if (lo) b._1 else b._2)) }
      def boundAt(f: graft.txn.FileEntry, lo: Boolean): Map[String, Long] =
        side(f.bounds, lo) ++ side(f.decimalBounds, lo)
      catalog.loadOrThrow(tableDir).files.sortBy(_.path).map { f =>
        def strSide(lo: Boolean): org.apache.spark.sql.catalyst.util.MapData = {
          // malformed entries (hand-edited metadata) are skipped, not a
          // crash — same defensive shape the pruning consumer uses
          val pairs = f.stringBounds.toSeq.collect {
            case (k, v) if v.toSeq.length == 2 =>
              k -> v.toSeq(if (lo) 0 else 1)
          }.sortBy(_._1)
          new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
            new org.apache.spark.sql.catalyst.util.GenericArrayData(
              pairs.map(p => UTF8String.fromString(p._1))),
            new org.apache.spark.sql.catalyst.util.GenericArrayData(
              pairs.map(p => UTF8String.fromString(p._2))))
        }
        InternalRow.fromSeq(Seq(
          UTF8String.fromString(f.path), UTF8String.fromString(f.content),
          f.sizeBytes, f.recordCount, f.sequenceNumber, f.schemaId,
          mapData(f.nullCounts),
          mapData(boundAt(f, lo = true)), mapData(boundAt(f, lo = false)),
          f.referencedDataFile.map(UTF8String.fromString).orNull,
          strSide(lo = true), strSide(lo = false)))
      }.toArray
    case "refs" =>
      // malformed values (a hand-set property that is not a version)
      // surface as type "invalid"/version -1 rather than hiding — the
      // inspection table must agree with what create_tag sees
      val cur = catalog.loadOrThrow(tableDir)
      val tagRows = cur.properties.toSeq.collect {
        case (k, v) if k.startsWith(graft.sql.GraftCatalog.RefPropPrefix) =>
          InternalRow.fromSeq(Seq(
            UTF8String.fromString(k.stripPrefix(graft.sql.GraftCatalog.RefPropPrefix)),
            UTF8String.fromString(v.toLongOption.fold("invalid")(_ => "tag")),
            v.toLongOption.getOrElse(-1L)))
      }
      // open branches resolve to their HEAD version (the snapshot a
      // `VERSION AS OF 'branch:<name>'` read pins), like Iceberg's
      // refs table reports branch tips
      val listing = catalog.versions(tableDir)
      val branchRows = graft.txn.Branch.refs(cur).toSeq.map {
        case (name, _) => InternalRow.fromSeq(Seq(
          UTF8String.fromString(name),
          UTF8String.fromString("branch"),
          graft.txn.Branch.headFrom(catalog, tableDir, cur, name, listing)
            .version))
      }
      (tagRows ++ branchRows)
        .sortBy(_.getUTF8String(0).toString).toArray
    case "snapshots" =>
      // flatMap: a version expired between the listing and the load
      // (concurrent expireSnapshots) just drops from the inspection —
      // routine maintenance must not fail a metadata query
      val loaded = catalog.versions(tableDir)
        .flatMap(catalog.loadVersion(tableDir, _))
      val byVersion = loaded.map(s => s.version -> s).toMap
      def baseOf(s: graft.txn.TableSnapshot): Option[graft.txn.TableSnapshot] =
        parentVersionOf(loaded)(s).flatMap(byVersion.get)
      loaded.map { s =>
        val data = s.files.filter(_.content == "data")
        val operation: AnyRef =
          if (s.version == loaded.head.version && s.files.isEmpty)
            UTF8String.fromString("create")
          else baseOf(s) match {
            case Some(base) =>
              UTF8String.fromString(graft.txn.CommitShape.classify(base, s))
            case None if s.version == 1L =>
              // the genuine FIRST commit: its base is exactly empty, so
              // the shape classifier is still truthful
              UTF8String.fromString(graft.txn.CommitShape.classify(
                graft.txn.TableSnapshot(0, s.schemaId, 0, Nil), s))
            case None =>
              // base expired (oldest retained > v1): the shape is
              // UNKNOWN — an overwrite/delete/upsert commit must not be
              // mislabeled 'append' after routine expiry
              null
          }
        InternalRow.fromSeq(Seq(
          s.version, s.committedAtMs, s.schemaId, s.lastSequenceNumber,
          data.size.toLong, (s.files.size - data.size).toLong,
          // same unknown-rows guard as the partitions table below
          if (data.forall(_.recordCount >= 0))
            Long.box(data.map(_.recordCount).sum)
          else null,
          graft.txn.Wap.isStaged(s),
          s.properties.get(graft.txn.Wap.IdProp)
            .map(UTF8String.fromString).orNull,
          s.properties.get(graft.txn.Branch.NameProp)
            .map(UTF8String.fromString).orNull,
          operation))
      }.toArray
    case "history" =>
      // same tolerant loading as .snapshots (concurrent expiry drops
      // rows, never fails the query)
      val loaded = catalog.versions(tableDir)
        .flatMap(catalog.loadVersion(tableDir, _))
      loaded.map { s =>
        InternalRow.fromSeq(Seq(
          s.committedAtMs, s.version,
          parentVersionOf(loaded)(s).map(Long.box).orNull,
          !graft.txn.Branch.isOutOfMain(s)))
      }.toArray
    case "manifests" =>
      (catalog match {
        case c: graft.txn.IcebergTableCatalog.type => c.manifestRecords(tableDir)
        case _ => Nil // graft format: no manifests
      }).map { case (p, content, len, addedSnap, af, ef) =>
        InternalRow.fromSeq(Seq(
          UTF8String.fromString(p),
          UTF8String.fromString(if (content == 0) "data" else "deletes"),
          len, addedSnap, af, ef))
      }.toArray
    case "partitions" =>
      val snap = catalog.loadOrThrow(tableDir)
      val specFor = graft.core.PartitionSpecCodec.specForFile(Some(snap))
      snap.files.filter(_.content == "data")
        .groupBy { f =>
          val fields = graft.core.PartitionKey.parse(f.path)
          val key = specFor(f)
            .map(t => s"${t.fieldName}=${fields.getOrElse(t.fieldName, "null")}")
            .mkString(",")
          (key, math.max(f.specId, 0L))
        }
        .toSeq.sortBy { case ((key, specId), _) => (key, specId) }
        .map { case ((key, specId), fs) =>
          InternalRow.fromSeq(Seq(
            UTF8String.fromString(key), specId, fs.size.toLong,
            // a pre-stamp file with unknown rows makes the sum a lie —
            // surface null instead
            if (fs.forall(_.recordCount >= 0)) Long.box(fs.map(_.recordCount).sum)
            else null,
            fs.map(_.sizeBytes).sum,
            fs.map(_.sequenceNumber).max))
        }.toArray
    case other => throw graft.core.CompactionError.Config(
      s"unknown metadata table kind: $other")
  }
}
