package graft.sql

import graft.core.{CompactionError, RetryConfig}
import graft.io.FileIO
import graft.sinks.{GraftBatchWrite, GraftCommitMessage, GraftDataWriterFactory}
import graft.txn.{CommitManager, FileEntry, TableCatalog}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException
import org.apache.spark.sql.connector.catalog.{Identifier, StagedTable, SupportsWrite, TableCapability}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util
import scala.jdk.CollectionConverters._

/** The staged half of atomic `CREATE TABLE … AS SELECT` / `[CREATE OR]
  * REPLACE TABLE [AS SELECT]` ([[GraftCatalog.stageCreate]] /
  * `stageReplace` / `stageCreateOrReplace`).
  *
  * Spark's atomic CTAS protocol: the catalog returns this table, Spark
  * writes the query's rows through its write builder, then calls
  * `commitStagedChanges` — or `abortStagedChanges` if anything failed.
  * The write half publishes its winning attempt files under the table
  * directory and buffers the resulting [[FileEntry]]s DRIVER-SIDE; the
  * snapshot chain is untouched until the staged commit lands everything
  * in ONE CAS commit:
  *
  *  - CREATE: the bootstrap snapshot (version 1, schema history v1)
  *    already CARRIES the written files ([[GraftCatalog.StagedPlan
  *    .bootstrap]]). A racing plain CREATE TABLE or second CTAS loses
  *    the version-1 CAS and surfaces as [[TableAlreadyExistsException]];
  *    a failed CTAS leaves NO table (no staged markers, no metadata —
  *    there is nothing to clean but the data directory).
  *  - REPLACE: ONE commit swaps schema (fresh field ids), partition
  *    spec (fresh spec id through the layout history), file set, and
  *    user properties ([[CommitManager.replaceTable]]); concurrent
  *    readers see the old table until that commit, and a failed RTAS
  *    leaves it untouched. Any concurrent commit since `stageReplace`
  *    aborts the replace (serializable-by-version) rather than clobber
  *    rows the staged plan never saw.
  *
  * The write path itself is the live append path re-used verbatim —
  * [[GraftDataWriterFactory]] rolling/fanout writers, the same
  * distribution+ordering contract ([[GraftBatchWrite.requiredDistribution]]),
  * write-time CHECK constraints and bloom filters bound from the
  * PENDING table properties (a CTAS with `graft.constraints` validates
  * every row before the table even exists). */
object GraftStagedTable {
  sealed trait Mode
  /** Stage a brand-new table (atomic CTAS). */
  case object Create extends Mode
  /** Stage a whole-table replace pinned to the snapshot the statement
    * planned against (atomic RTAS / REPLACE TABLE). */
  final case class Replace(baseVersion: Long, baseSchemaId: Long) extends Mode
}

final class GraftStagedTable(
    ident: Identifier,
    plan: GraftCatalog.StagedPlan,
    snapCatalog: TableCatalog,
    mode: GraftStagedTable.Mode
) extends StagedTable with SupportsWrite {

  /** Published-but-uncommitted file entries, buffered between the batch
    * write's `commit` and `commitStagedChanges`. Driver-side state is
    * bounded: one FileEntry per written file, same order of magnitude
    * as any commit's metadata. */
  @volatile private var stagedEntries: Seq[FileEntry] = Nil
  @volatile private var stagedWriteDir: Option[String] = None

  /** Declared write order from the pending TBLPROPERTIES (validated in
    * [[GraftCatalog.stagePlan]]). */
  private val writeOrder: Seq[graft.core.SortField] =
    plan.userProps.get(graft.core.WriteOrderCodec.Property)
      .map(graft.core.WriteOrderCodec.decode).getOrElse(Nil)

  // parse-safe (Spark feeds table names through its attribute parser
  // when rendering write-path errors — backticks/spaces would throw
  // INVALID_ATTRIBUTE_NAME_SYNTAX instead of the real message)
  override def name(): String = ident.toString
  override def schema(): StructType = plan.schema
  override def properties(): util.Map[String, String] = plan.userProps.asJava
  override def partitioning(): Array[Transform] = {
    import org.apache.spark.sql.connector.expressions.Expressions
    plan.spec.map {
      case graft.core.IdentityTransform(c)    => Expressions.identity(c)
      case graft.core.BucketTransform(n, c)   => Expressions.bucket(n, c)
      case graft.core.TruncateTransform(w, c) =>
        Expressions.apply("truncate",
          Expressions.literal(Int.box(w)), Expressions.column(c))
      case graft.core.DayTransform(c)         => Expressions.days(c)
    }.toArray
  }
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder
        with org.apache.spark.sql.connector.write.SupportsTruncate {
      // RTAS plans its write as truncate-then-append against the staged
      // table; a staged table holds nothing yet, so truncate is a no-op
      // (the replace-by-construction happens at commitStagedChanges)
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write with RequiresDistributionAndOrdering {
        override def requiredDistribution()
            : org.apache.spark.sql.connector.distributions.Distribution =
          GraftBatchWrite.requiredDistribution(plan.spec, writeOrder)
        override def requiredOrdering()
            : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
          if (writeOrder.isEmpty) Array.empty
          else GraftBatchWrite.orderingExprs(plan.spec, writeOrder)
        override def toBatch: BatchWrite = {
          val targetBytes = Option(info.options().get("targetFileSizeBytes"))
            .map(_.toLong)
            .getOrElse(graft.core.CompactionConfig().targetFileSizeBytes)
          val compression =
            Option(info.options().get("compression")).getOrElse("snappy")
          new StagedBatchWrite(targetBytes, compression)
        }
      }
    }

  /** The executor half is the live append path verbatim; only `commit`
    * differs — publish winners, then BUFFER the entries for the staged
    * commit instead of committing a snapshot. */
  private final class StagedBatchWrite(
      targetBytes: Long, compression: String) extends BatchWrite {
    private val writeDir =
      s"${plan.dir}/data/dsv2-${java.util.UUID.randomUUID().toString.take(8)}"

    override def createBatchWriterFactory(
        info: PhysicalWriteInfo): DataWriterFactory = {
      FileIO.mkdirs(writeDir)
      // bloom config + constraints come from the PENDING properties —
      // there is no snapshot to consult yet
      val conf = FileIO.hadoopConfEntries() ++
        plan.userProps.get(graft.core.BloomColumns.Property)
          .map(graft.core.BloomColumns.Property -> _)
      new GraftDataWriterFactory(writeDir, plan.schema, targetBytes,
        compression, conf, plan.spec,
        constraints = graft.core.Constraints.bindAll(
          SparkSession.active, plan.userProps, plan.schema))
    }

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val msgs = messages.toSeq.map(_.asInstanceOf[GraftCommitMessage])
      val entries0 = GraftBatchWrite.publishWinners(
        msgs.flatMap(_.files), writeDir,
        sketches = msgs.flatMap(_.sketches).toMap)
      val sortedBy =
        if (writeOrder.isEmpty) ""
        else graft.core.WriteOrderCodec.encode(
          graft.core.WriteOrderCodec.physical(plan.spec, writeOrder))
      stagedEntries =
        if (sortedBy.isEmpty) entries0
        else entries0.map(_.copy(sortedBy = sortedBy))
      stagedWriteDir = Some(writeDir)
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit =
      FileIO.deleteRecursive(writeDir)
  }

  override def commitStagedChanges(): Unit = {
    // staged DDL commits define table state directly; the WAP/branch
    // audit protocols describe APPENDS relative to existing state and
    // do not compose with a create/replace — refuse, as the overwrite
    // paths do
    GraftBatchWrite.activeWapId().foreach { id =>
      throw CompactionError.Config(
        s"session ${graft.txn.Wap.SessionConf}='$id' is set: CREATE/REPLACE " +
          "TABLE AS SELECT cannot be WAP-staged; unset the wap id")
    }
    GraftBatchWrite.activeBranch().foreach { b =>
      throw CompactionError.Config(
        s"session ${graft.txn.Branch.SessionConf}='$b' is set: CREATE/REPLACE " +
          "TABLE AS SELECT cannot target a branch; unset the branch")
    }
    mode match {
      case GraftStagedTable.Create =>
        try snapCatalog.commitCas(plan.dir, plan.bootstrap(stagedEntries))
        catch {
          case _: CompactionError.CommitConflict =>
            // a concurrent CREATE won version 1 — this CTAS's files are
            // orphans under the winner's directory; sweep them
            stagedWriteDir.foreach(FileIO.deleteRecursive)
            throw new TableAlreadyExistsException(ident)
        }
      case GraftStagedTable.Replace(baseVersion, baseSchemaId) =>
        try new CommitManager(plan.dir, RetryConfig(), catalog = snapCatalog)
          .replaceTable(stagedEntries, plan.fields, plan.spec, plan.userProps,
            expectedVersion = baseVersion, expectedSchemaId = baseSchemaId)
        catch {
          case e: Throwable =>
            // terminal (CommitManager already retried the retryables):
            // the staged files will never be referenced — sweep them,
            // the current table is untouched
            stagedWriteDir.foreach(FileIO.deleteRecursive)
            throw e
        }
    }
  }

  override def abortStagedChanges(): Unit = {
    stagedWriteDir.foreach(FileIO.deleteRecursive)
    mode match {
      case GraftStagedTable.Create =>
        // sweep only EMPTY leftover directories (this CTAS's own
        // mkdirs). Non-recursive deletes REFUSE non-empty directories,
        // so a table a concurrent CREATE committed between our check
        // and the delete can never be destroyed — the
        // load-then-deleteRecursive alternative is a TOCTOU window
        // onto someone else's committed data
        def dropIfEmpty(p: String): Unit =
          try FileIO.delete(p) catch { case _: Exception => () }
        dropIfEmpty(s"${plan.dir}/data")
        dropIfEmpty(plan.dir)
      case _: GraftStagedTable.Replace => () // old table intact
    }
  }
}
