package graft.sources

import graft.core.CompactionError
import graft.txn.{FileEntry, TableCatalog, TableSnapshot}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.schema.MessageType
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.util.OptionalLong
import scala.jdk.CollectionConverters._

/** DSv2 BATCH read of a graft table — `spark.read.format("graft")
  * .load(tableDir)` returns the table's LIVE rows (merge-on-read), the
  * same result [[TableReader.read]] assembles with anti-joins, realized
  * the way Iceberg's own Spark source does it: **per-task delete
  * application**. Each input partition is one data file plus the delete
  * files that apply to it; the reader loads that task's position-delete
  * ordinals and equality-delete key sets into memory and filters rows
  * as it streams the file. No join, no shuffle — a full-table read is
  * embarrassingly parallel across data files.
  *
  * Scale posture:
  *  - *Statistics* ([[SupportsReportStatistics]]) come from snapshot
  *    metadata (no IO), so Catalyst sees a real `sizeInBytes` for a
  *    graft table under a join and can choose to BROADCAST it — the
  *    decision that matters most at 100 TB.
  *  - *Column pruning* ([[SupportsPushDownRequiredColumns]]) reaches the
  *    parquet reader as a requested-projection schema (column chunks of
  *    unused columns are never read).
  *  - *Filters* ([[SupportsPushDownFilters]]) are used for FILE-level
  *    min/max pruning (write-time stamped bounds, footer stats as the
  *    fallback — [[ScanPruning]]) and for ROW-GROUP statistics skipping
  *    inside the vectorized reader ([[ParquetPredicate]], ordinals kept
  *    file-absolute via the page store's row index offset); everything
  *    is returned to Spark as residuals — `Inexact` pushdown, the same
  *    contract as the reference's provider (SURVEY §2.2 P2).
  *  - Per-task delete load is bounded by the live delete backlog, which
  *    [[graft.compaction.DeleteCompaction]] keeps converged to a few
  *    sorted files — the same memory model as Iceberg's `DeleteFilter`.
  *
  * Schema evolution is handled per task (the row-level mirror of
  * [[graft.plans.SchemaReconcile]]'s plan-level union): planning
  * resolves each file's columns to the CURRENT schema by field id —
  * renames become a physical-name mapping, added columns null-fill,
  * dropped ids are not projected, and equality-delete keys recorded
  * under old names are id-translated — so a read straddling an ALTER
  * TABLE needs no extra scan nodes. Schemas are the engine's
  * flat-primitive table model.
  */
object GraftBatchScan {

  /** Metadata column exposing each row's physical data file — the
    * grouping handle for copy-on-write row-level operations (the same
    * role as Iceberg's `_file`). */
  val FileColumn = "_file"

  /** Metadata column exposing each row's file-absolute ordinal — with
    * [[FileColumn]] it forms the row id of the delta (merge-on-read)
    * row-level path (the same role as Iceberg's `_pos`): a delta DELETE
    * writes these two columns back as a position-delete file. */
  val PosColumn = "_pos"

  /** Files above this size split into row-group-aligned range tasks
    * (the engine's own read fan-out decision — ScanPlanner.splitTask's
    * default, realized here for the DSv2 path). */
  val DefaultSplitTargetBytes: Long = 128L * 1024 * 1024

  /** String columns eligible for byte-bound pruning — THE definition,
    * shared by the builder's pushdown acceptance and the scan's
    * plan-time/runtime pruning so they can never diverge. */
  private[sources] def stringColsOf(schema: StructType): Set[String] =
    schema.fields.collect {
      case f if f.dataType == StringType => f.name
    }.toSet

  /** Spark-type-driven extraction of one field from a parquet example
    * [[Group]], tolerant of INT32-backed long columns. Shared by the
    * batch reader and the streaming tail reader. */
  private[graft] def groupValue(g: Group, gi: Int, dt: DataType, name: String): Any =
    if (g.getFieldRepetitionCount(gi) == 0) null
    else dt match {
      case LongType | TimestampType | TimestampNTZType =>
        g.getType.getType(gi).asPrimitiveType().getPrimitiveTypeName match {
          case org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT32 =>
            g.getInteger(gi, 0).toLong
          case _ => g.getLong(gi, 0)
        }
      case IntegerType | DateType => g.getInteger(gi, 0)
      case StringType  => g.getString(gi, 0)
      case DoubleType  => // FLOAT physical = a file predating a widen
        g.getType.getType(gi).asPrimitiveType().getPrimitiveTypeName match {
          case org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.FLOAT =>
            g.getFloat(gi, 0).toDouble
          case _ => g.getDouble(gi, 0)
        }
      case FloatType   => g.getFloat(gi, 0)
      case BooleanType => g.getBoolean(gi, 0)
      case BinaryType  => g.getBinary(gi, 0).getBytes
      case d: DecimalType =>
        // physical ladder mirrors [[graft.sinks.ExactRollingWriter
        // .toMessageType]]: INT32/INT64 carry the unscaled value,
        // FLBA/BINARY a two's-complement big-endian encoding
        g.getType.getType(gi).asPrimitiveType().getPrimitiveTypeName match {
          case org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT32 =>
            Decimal(g.getInteger(gi, 0).toLong, d.precision, d.scale)
          case org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64 =>
            Decimal(g.getLong(gi, 0), d.precision, d.scale)
          case _ =>
            val bytes = g.getBinary(gi, 0).getBytes
            Decimal(new java.math.BigDecimal(
              new java.math.BigInteger(bytes), d.scale), d.precision, d.scale)
        }
      // nested compositions (the writer's standard 3-level LIST / MAP /
      // struct group shapes, ExactRollingWriter.toParquetType) build
      // CATALYST values directly — unlike the primitive cases there is
      // no later [[toCatalyst]] boxing pass inside an array
      case ArrayType(et, _) =>
        val lg = g.getGroup(gi, 0)
        requireChild(lg, "list", name)
        val n = lg.getFieldRepetitionCount(0)
        val out = new Array[Any](n)
        var i = 0
        while (i < n) {
          val entry = lg.getGroup(0, i)
          out(i) =
            if (entry.getFieldRepetitionCount(0) == 0) null
            else toCatalyst(groupValue(entry, 0, et, s"$name.element"))
          i += 1
        }
        new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
      case MapType(kt, vt, _) =>
        val mg = g.getGroup(gi, 0)
        requireChild(mg, "key_value", name)
        val n = mg.getFieldRepetitionCount(0)
        val keys = new Array[Any](n); val vals = new Array[Any](n)
        var i = 0
        while (i < n) {
          val kv = mg.getGroup(0, i)
          keys(i) = toCatalyst(groupValue(kv, 0, kt, s"$name.key"))
          vals(i) =
            if (kv.getFieldRepetitionCount(1) == 0) null
            else toCatalyst(groupValue(kv, 1, vt, s"$name.value"))
          i += 1
        }
        new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
          new org.apache.spark.sql.catalyst.util.GenericArrayData(keys),
          new org.apache.spark.sql.catalyst.util.GenericArrayData(vals))
      case st: StructType =>
        val sg = g.getGroup(gi, 0)
        val vals = new Array[Any](st.length)
        var i = 0
        while (i < st.length) {
          // resolve struct members by NAME against the file's group —
          // robust to member reordering by other writers; a missing
          // member is a loud schema error, not a silent null (nested
          // evolution is out of scope — columns evolve as a whole)
          val idx =
            try sg.getType.getFieldIndex(st(i).name)
            catch { case _: org.apache.parquet.io.InvalidRecordException =>
              throw CompactionError.Config(
                s"struct member ${st(i).name} absent from column $name in the file")
            }
          vals(i) = toCatalyst(groupValue(sg, idx, st(i).dataType, s"$name.${st(i).name}"))
          i += 1
        }
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
      case other => throw CompactionError.Config(
        s"graft source supports primitive and array/struct/map columns; " +
          s"column $name has unsupported type $other")
    }

  /** The nested group shapes this reader resolves are positional under
    * a NAMED wrapper (list / key_value); a different wrapper name means
    * a legacy 2-level or nonstandard encoding — refuse loudly rather
    * than misread. */
  private def requireChild(g: Group, expect: String, col: String): Unit = {
    val t = g.getType
    if (t.getFieldCount != 1 || t.getType(0).getName != expect)
      throw CompactionError.Config(
        s"column $col uses a nonstandard parquet nested encoding " +
          s"(expected a single repeated '$expect' group in ${t.getName})")
  }

  /** Catalyst boxing for [[groupValue]] output (strings → UTF8String). */
  private[graft] def toCatalyst(v: Any): Any = v match {
    case s: String => UTF8String.fromString(s)
    case other     => other
  }

  /** [[groupValue]]+[[toCatalyst]] SPECIALIZED for one field of a known
    * file group type: the per-row Spark-type dispatch, physical-type
    * probes, and name→index lookups all hoist out of the row loop into
    * closure construction (once per reader, not once per value). Strings
    * build the UTF8String straight from the stored UTF-8 bytes — no
    * String decode/encode round-trip; byte-identical output (the engine
    * writes well-formed UTF-8, under which fromBytes ∘ encode =
    * fromString ∘ decode). Decimal/nested shapes delegate to
    * [[groupValue]] per row — cold next to the primitive columns.
    * Extractors return CATALYST values (no [[toCatalyst]] needed). */
  private[graft] def fieldExtractor(
      fileType: org.apache.parquet.schema.GroupType,
      gi: Int, dt: DataType, name: String): Group => Any = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    def prim = fileType.getType(gi).asPrimitiveType().getPrimitiveTypeName
    dt match {
      case LongType | TimestampType | TimestampNTZType =>
        if (prim == PrimitiveTypeName.INT32)
          g => if (g.getFieldRepetitionCount(gi) == 0) null
               else g.getInteger(gi, 0).toLong
        else
          g => if (g.getFieldRepetitionCount(gi) == 0) null
               else g.getLong(gi, 0)
      case IntegerType | DateType =>
        g => if (g.getFieldRepetitionCount(gi) == 0) null
             else g.getInteger(gi, 0)
      case StringType =>
        g => if (g.getFieldRepetitionCount(gi) == 0) null
             else UTF8String.fromBytes(g.getBinary(gi, 0).getBytes)
      case DoubleType =>
        if (prim == PrimitiveTypeName.FLOAT)
          g => if (g.getFieldRepetitionCount(gi) == 0) null
               else g.getFloat(gi, 0).toDouble
        else
          g => if (g.getFieldRepetitionCount(gi) == 0) null
               else g.getDouble(gi, 0)
      case FloatType =>
        g => if (g.getFieldRepetitionCount(gi) == 0) null
             else g.getFloat(gi, 0)
      case BooleanType =>
        g => if (g.getFieldRepetitionCount(gi) == 0) null
             else g.getBoolean(gi, 0)
      case BinaryType =>
        g => if (g.getFieldRepetitionCount(gi) == 0) null
             else g.getBinary(gi, 0).getBytes
      case _ =>
        g => toCatalyst(groupValue(g, gi, dt, name))
    }
  }

  /** [[fieldExtractor]]'s twin for EQUALITY-DELETE KEY probes: returns
    * the [[groupValue]] JVM representation (strings as String, not
    * UTF8String — the loaded key sets are built through groupValue)
    * already normalized through [[eqKeyComponent]] (NaN → [[NaNKey]],
    * byte arrays → content-equality Binary), so the per-row probe is
    * extractor calls into a reused buffer — no name→index lookup, no
    * type dispatch, no normalization pass per row. */
  private[graft] def eqKeyExtractor(
      fileType: org.apache.parquet.schema.GroupType,
      gi: Int, dt: DataType, name: String): Group => Any = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    def prim = fileType.getType(gi).asPrimitiveType().getPrimitiveTypeName
    dt match {
      case LongType | TimestampType | TimestampNTZType =>
        if (prim == PrimitiveTypeName.INT32)
          g => if (g.getFieldRepetitionCount(gi) == 0) null
               else java.lang.Long.valueOf(g.getInteger(gi, 0).toLong)
        else
          g => if (g.getFieldRepetitionCount(gi) == 0) null
               else java.lang.Long.valueOf(g.getLong(gi, 0))
      case IntegerType | DateType =>
        g => if (g.getFieldRepetitionCount(gi) == 0) null
             else java.lang.Integer.valueOf(g.getInteger(gi, 0))
      case StringType =>
        g => if (g.getFieldRepetitionCount(gi) == 0) null
             else g.getString(gi, 0)
      case DoubleType =>
        if (prim == PrimitiveTypeName.FLOAT)
          g => if (g.getFieldRepetitionCount(gi) == 0) null
               else {
                 val d = g.getFloat(gi, 0).toDouble
                 if (d.isNaN) NaNKey else java.lang.Double.valueOf(d)
               }
        else
          g => if (g.getFieldRepetitionCount(gi) == 0) null
               else {
                 val d = g.getDouble(gi, 0)
                 if (d.isNaN) NaNKey else java.lang.Double.valueOf(d)
               }
      case FloatType =>
        g => if (g.getFieldRepetitionCount(gi) == 0) null
             else {
               val f = g.getFloat(gi, 0)
               if (f.isNaN) NaNKey else java.lang.Float.valueOf(f)
             }
      case BooleanType =>
        g => if (g.getFieldRepetitionCount(gi) == 0) null
             else java.lang.Boolean.valueOf(g.getBoolean(gi, 0))
      case _ =>
        g => if (g.getFieldRepetitionCount(gi) == 0) null
             else eqKeyComponent(groupValue(g, gi, dt, name))
    }
  }

  /** Dead-ordinal membership for one task: a window-filtered hash set
    * from parquet position-delete files, plus (when the file carries a
    * deletion vector) a roaring bitmap probed directly — the bitmap IS
    * the compact representation, so it needs no window filter. Both can
    * be present on one file (parquet deletes from before a format
    * switch). Instances are task-local; probes are single-threaded. */
  private[graft] final class DeadPositions(
      set: java.util.HashSet[Long],
      bitmap: org.roaringbitmap.longlong.Roaring64Bitmap) {
    def isEmpty: Boolean = set.isEmpty && (bitmap == null || bitmap.isEmpty)
    def contains(pos: Long): Boolean =
      set.contains(pos) || (bitmap != null && bitmap.contains(pos))

    /** Batch form for the columnar reader: `keep(i) = !dead(base+i)`
      * for the window `[base, base+n)`. The bitmap path walks the range
      * ONCE — run-encoded stretches fill the mask in O(runs), not a
      * tree probe per row; the hash-set path stays per-row. */
    def fillAlive(base: Long, n: Int, keep: Array[Boolean]): Unit = {
      if (isEmpty) { java.util.Arrays.fill(keep, 0, n, true); return }
      if (bitmap == null) java.util.Arrays.fill(keep, 0, n, true)
      else bitmap.forAllInRange(base, n, new org.roaringbitmap.RelativeRangeConsumer {
        override def acceptPresent(rel: Int): Unit = keep(rel) = false
        override def acceptAbsent(rel: Int): Unit = keep(rel) = true
        override def acceptAllPresent(from: Int, to: Int): Unit =
          java.util.Arrays.fill(keep, from, to, false)
        override def acceptAllAbsent(from: Int, to: Int): Unit =
          java.util.Arrays.fill(keep, from, to, true)
      })
      if (!set.isEmpty) {
        var i = 0
        while (i < n) {
          if (keep(i) && set.contains(base + i)) keep(i) = false
          i += 1
        }
      }
    }
  }

  /** Ordinals of this split's rows killed by its position-delete files
    * (only the `[baseOrdinal, ordinalEnd)` window — bounds memory when
    * a large file fans out into many range tasks) and/or its deletion
    * vector. Shared by the row and columnar readers. Parquet delete
    * files parse once per JVM through [[DeleteFileCache]] with a
    * per-task binary-search window; deletion-vector BLOB BYTES cache
    * once per JVM (one ranged read of this file's own blob — O(own
    * blob), never the table's whole delete corpus) and each task
    * deserializes its own bitmap, because roaring bitmaps are not safe
    * for concurrent probing. */
  private[graft] def loadDeadPositions(part: GraftMorPartition,
      taskConf: Configuration): DeadPositions = {
    val dataPathNorm = ScanPlanner.normalizePath(part.dataPath)
    val set = new java.util.HashSet[Long]()
    part.posDeletes.foreach { pd =>
      val byPath = DeleteFileCache.getOrLoad(pd.path, pd.sizeBytes, "pos") {
        parsePosDeleteFile(pd.path, taskConf)
      }
      val arr = byPath.get(dataPathNorm)
      if (arr != null) {
        var i = lowerBound(arr, part.baseOrdinal)
        while (i < arr.length && arr(i) < part.ordinalEnd) {
          set.add(arr(i)); i += 1
        }
      }
    }
    val bitmap = part.dv.map { d =>
      // same plausibility window readDvBlob enforces — an implausible
      // snapshot-recorded size must fail as a deliberate error, not a
      // negative-array-size crash inside the ranged read
      if (d.contentSizeBytes < 12 || d.contentSizeBytes > Int.MaxValue)
        throw CompactionError.Io(
          s"implausible deletion-vector blob size ${d.contentSizeBytes} " +
            s"for ${d.path}@${d.contentOffset}")
      val bytes = DeleteFileCache.getOrLoad(
        d.path, d.sizeStamp, s"dv:${d.contentOffset}") {
        graft.io.FileIO.readBytesRange(
          d.path, d.contentOffset, d.contentSizeBytes.toInt, taskConf)
      }
      graft.io.Puffin.decodeDvBlob(bytes, s"${d.path}@${d.contentOffset}")
    }.orNull
    new DeadPositions(set, bitmap)
  }

  /** NORMALIZED data-file paths a position-delete file references —
    * plan-time scoping for the snapshot diff ([[TableReader.changes]]):
    * delete files are small, and reading their referenced paths once
    * (same "pos" cache slot the task readers use, so one parse per JVM
    * serves both) scopes a pos-delete commit to exactly the files it
    * touches instead of every older-or-equal common file. */
  private[graft] def posDeleteReferencedPaths(path: String, sizeBytes: Long,
      conf: Configuration): Set[String] = {
    import scala.jdk.CollectionConverters._
    DeleteFileCache.getOrLoad(path, sizeBytes, "pos") {
      parsePosDeleteFile(path, conf)
    }.keySet.asScala.toSet
  }

  /** Parse one position-delete file completely: normalized data-file
    * path → its deleted ordinals, sorted ascending (enables the window
    * binary search above). Built once per file per JVM and shared
    * read-only across tasks. */
  private def parsePosDeleteFile(path: String, taskConf: Configuration)
      : java.util.HashMap[String, Array[Long]] = {
    val tmp = new java.util.HashMap[String, scala.collection.mutable.ArrayBuilder.ofLong]()
    val r = projectedReader(path, Seq("file_path", "pos"), taskConf)
    try {
      var g = r.read()
      while (g != null) {
        val fp = groupValue(g, g.getType.getFieldIndex("file_path"),
          StringType, "file_path").asInstanceOf[String]
        if (fp != null) {
          val p = groupValue(g, g.getType.getFieldIndex("pos"),
            LongType, "pos").asInstanceOf[Long]
          tmp.computeIfAbsent(ScanPlanner.normalizePath(fp),
            _ => new scala.collection.mutable.ArrayBuilder.ofLong) += p
        }
        g = r.read()
      }
    } finally r.close()
    val out = new java.util.HashMap[String, Array[Long]](
      math.max(16, tmp.size() * 2))
    tmp.forEach { (k, b) =>
      val a = b.result(); java.util.Arrays.sort(a); out.put(k, a)
    }
    out
  }

  /** First index in sorted `a` whose value is ≥ `target`. */
  private def lowerBound(a: Array[Long], target: Long): Int = {
    var lo = 0; var hi = a.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (a(mid) < target) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Canonical sentinel for NaN equality-key components — Spark's `===`
    * (and Iceberg's eq-delete semantics) treat NaN = NaN, but boxed
    * Scala `==` does not; both set build and probes normalize through
    * [[eqKeyComponent]] so the readers agree with the plan-level
    * anti-join. */
  private[graft] case object NaNKey

  /** Normalize one equality-key component for set/probe equality: byte
    * arrays wrap in content-equality [[org.apache.parquet.io.api
    * .Binary]] (raw arrays compare by reference inside Seq keys), NaN
    * canonicalizes to [[NaNKey]]. Applied at the set build AND every
    * probe. */
  private[graft] def eqKeyComponent(v: Any): Any = v match {
    case b: Array[Byte] =>
      org.apache.parquet.io.api.Binary.fromConstantByteArray(b)
    case d: java.lang.Double if d.isNaN => NaNKey
    case f: java.lang.Float if f.isNaN  => NaNKey
    case x => x
  }

  /** Per applicable equality-delete file: (current key column names,
    * key set). Keys read under the DELETE file's physical names, typed
    * by the current schema (`readTypes`), normalized through
    * [[eqKeyComponent]]. Keys containing null are dropped — they can
    * never match (`===` anti-join semantics) — and files whose set
    * comes out empty are dropped wholesale (a no-op file must not keep
    * cursors alive). Shared by the row and columnar readers; callers
    * pre-filter files keyed on columns the data file lacks. */
  private[graft] def loadEqKeySets(eqDeletes: Seq[EqDeleteSpec],
      readTypes: Map[String, DataType],
      taskConf: Configuration): Seq[(Seq[String], java.util.HashSet[Seq[Any]])] =
    eqDeletes.map { e =>
      val curNames = e.keyCols.map(_._1)
      val types = curNames.map { c =>
        readTypes.getOrElse(c, throw CompactionError.Config(
          s"equality-delete column $c not in table schema"))
      }
      // parse-once-per-JVM: the variant pins the key mapping AND the
      // read types, so the same file scanned under an evolved schema
      // (different current names or types) loads its own entry. The
      // cached set is probed concurrently by tasks — never mutated.
      val variant = "eq:" +
        e.keyCols.map { case (c, p) => s"$c=$p" }.mkString(",") + ";" +
        types.map(_.catalogString).mkString(",")
      val set = DeleteFileCache.getOrLoad(e.path, e.sizeBytes, variant) {
        val s = new java.util.HashSet[Seq[Any]]()
        val r = projectedReader(e.path, e.keyCols.map(_._2), taskConf)
        try {
          var g = r.read()
          while (g != null) {
            val key = e.keyCols.zip(types).map { case ((_, phys), t) =>
              groupValue(g, g.getType.getFieldIndex(phys), t, phys)
            }
            if (!key.contains(null)) s.add(key.map(eqKeyComponent))
            g = r.read()
          }
        } finally r.close()
        s
      }
      (curNames, set)
    }.filter(_._2.size() > 0)

  /** Build a ParquetReader over `path` restricted to `cols`, with the
    * requested projection derived from the FILE's own schema (exact
    * types/repetitions, so parquet's containment check always passes).
    * `base` must carry the session's hadoop settings
    * ([[graft.io.FileIO.confFrom]] on executors) — a bare Configuration
    * cannot open object-store paths. */
  private[graft] def projectedReader(
      path: String, cols: Seq[String],
      base: Configuration,
      range: Option[(Long, Long)] = None): ParquetReader[Group] = {
    val conf = new Configuration(base)
    val inFile = HadoopInputFile.fromPath(new HPath(path), conf)
    val fileSchema: MessageType = {
      val r = ParquetFileReader.open(inFile)
      try r.getFooter.getFileMetaData.getSchema finally r.close()
    }
    val missing = cols.filterNot(c => fileSchema.containsField(c))
    if (missing.nonEmpty) throw CompactionError.Config(
      s"columns ${missing.mkString(", ")} absent from $path " +
        "(file/metadata schema drift — was the file replaced outside a commit?)")
    val projection = new MessageType(fileSchema.getName,
      cols.map(c => fileSchema.getType(fileSchema.getFieldIndex(c))).asJava)
    conf.set(ReadSupport.PARQUET_READ_SCHEMA, projection.toString)
    val b = ParquetReader.builder(new GroupReadSupport(), new HPath(path))
      .withConf(conf)
    range.foreach { case (s, e) => b.withFileRange(s, e) }
    b.build()
  }
}

/** One equality-delete file applicable to a task's data file. Keys are
  * carried as (current logical name, physical name in the delete file)
  * pairs — identical for un-evolved tables, id-translated through the
  * schema history otherwise (same semantics as
  * [[graft.plans.SchemaReconcile]]). */
final case class EqDeleteSpec(path: String, sequenceNumber: Long,
    keyCols: Seq[(String, String)],
    /** Committed file length from the snapshot — the [[DeleteFileCache]]
      * staleness stamp (delete files are immutable once committed). */
    sizeBytes: Long = -1L)

/** One position-delete file applicable to a task's data file, with its
  * committed length as the [[DeleteFileCache]] staleness stamp. */
final case class PosDeleteSpec(path: String, sizeBytes: Long = -1L)

/** The deletion vector applicable to a task's data file — at most ONE
  * per data file (the invariant the write path maintains by OR-merging
  * bitmaps before commit). `path` is the Puffin container; the blob's
  * byte address comes from snapshot metadata, so the task does one
  * ranged read of exactly its own vector. `sizeStamp` is the
  * container's committed length ([[DeleteFileCache]] staleness). */
final case class DvSpec(path: String, contentOffset: Long,
    contentSizeBytes: Long, sizeStamp: Long = -1L)

/** One data file plus exactly the delete files that can affect it.
  * `columnMap` resolves each CURRENT column to its physical name in
  * THIS file (None = the file predates the column → null-fill), so a
  * read straddling renames/adds/drops needs no join or union — the
  * mapping is applied row-by-row in the reader.
  *
  * A LARGE file is split into several partitions over row-group-aligned
  * byte ranges: `[rangeStart, rangeEnd)` selects the row groups whose
  * midpoint falls inside (parquet's file-range rule) and `baseOrdinal`
  * is the count of rows in all PRECEDING row groups, so each split's
  * running position stays the file-absolute ordinal that
  * position-delete semantics require. */
final case class GraftMorPartition(
    dataPath: String,
    dataSeq: Long,
    posDeletes: Seq[PosDeleteSpec],
    eqDeletes: Seq[EqDeleteSpec],
    /** This data file's deletion vector, if the snapshot carries one. */
    dv: Option[DvSpec] = None,
    columnMap: Map[String, Option[String]],
    rangeStart: Long = 0L,
    rangeEnd: Long = Long.MaxValue,
    baseOrdinal: Long = 0L,
    /** Exclusive upper ordinal of this split (row count of its chunk's
      * groups added to `baseOrdinal`) — bounds the position-delete
      * ordinals the split's reader needs to hold in memory. */
    ordinalEnd: Long = Long.MaxValue,
    /** Pushed filters, for ROW-GROUP statistics skipping in the
      * vectorized reader ([[ParquetPredicate]]). Purely an optimization:
      * every filter is also re-applied by Spark above the scan. */
    filters: Seq[org.apache.spark.sql.sources.Filter] = Nil,
    /** Initial-DEFAULT fills for current columns THIS file predates
      * (current name → canonical literal text,
      * [[graft.core.ColumnDefaults]]): the reader emits the constant
      * instead of null, and equality-delete keys on such columns
      * compare against it — default-filled rows behave exactly like
      * physically-stored ones. Columns absent here AND from
      * `columnMap` null-fill as before. */
    defaultFill: Map[String, String] = Map.empty
) extends InputPartition

/** A [[GraftMorPartition]] stamped with its typed partition key — the
  * `HasPartitionKey` surface Spark groups by when the scan reports
  * [[org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning]]
  * (storage-partitioned joins). `keyVals` are Catalyst-typed values
  * (Long / Int / UTF8String / null) in partition-spec order, matching
  * the reported clustering expressions' evaluated types; splits of one
  * file share one key, and Spark's own grouping coalesces them. */
final case class GraftMorKeyedPartition(
    inner: GraftMorPartition,
    keyVals: Array[Any]
) extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(keyVals)
}

final class GraftScanBuilder(
    tableDir: String,
    tableSchema: StructType,
    asOfVersion: Option[Long],
    catalog: TableCatalog,
    // streaming options, threaded through to the micro-batch stream
    startingVersion: String,
    skipDeletes: Boolean,
    /** Set when this scan drives a row-level operation
      * ([[graft.sinks.GraftRowLevelOperation]]): the planned file set is
      * reported back so the copy-on-write commit replaces exactly the
      * groups that were read. */
    cowOwner: Option[graft.sinks.RowLevelScanOwner] = None,
    splitTargetBytes: Long = GraftBatchScan.DefaultSplitTargetBytes,
    /** Escape hatch (`.option("vectorizedRead", false)`): force the
      * row readers even where the columnar gate would allow batches. */
    vectorizedRead: Boolean = true,
    /** Streaming CDC mode ([[graft.streaming.ChangelogStream]]). */
    changelog: Boolean = false
) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit
    with org.apache.spark.sql.connector.read.SupportsPushDownTopN {

  private var requiredSchema: StructType = tableSchema
  private var includeFileColumn: Boolean = false
  private var includePosColumn: Boolean = false
  private var pushed: Array[sources.Filter] = Array.empty
  private var pushedAgg: Option[(StructType, Seq[org.apache.spark.sql.catalyst.InternalRow])] = None
  private var pushedLimitN: Int = -1
  private var pushedTopNCol: Option[(String, Boolean)] = None // (col, descending)

  /** LIMIT / TopN pushdown — PARTIAL always (Spark keeps its limit/sort
    * on top; the scan only sheds provably-irrelevant FILES, per
    * [[ScanPruning.truncateForLimit]] / [[ScanPruning.truncateForTopN]]).
    * Spark only pushes a limit when nothing between it and the relation
    * can drop rows, so no filter can invalidate the row guarantee; the
    * `pushed.isEmpty` check is belt-and-braces (this builder keeps every
    * filter residual, so a filtered query retains a Filter node and
    * never reaches here). Truncation soundness is re-decided at plan
    * time against the snapshot — accepting here only grants permission. */
  override def pushLimit(limit: Int): Boolean = {
    if (cowOwner.nonEmpty || changelog || pushed.nonEmpty || limit <= 0) false
    else { pushedLimitN = limit; true }
  }

  override def isPartiallyPushed(): Boolean = true

  override def pushTopN(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      limit: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.{NamedReference, NullOrdering, SortDirection}
    if (cowOwner.nonEmpty || changelog || pushed.nonEmpty || limit <= 0 ||
        orders.isEmpty) return false
    // the LEADING key alone decides file relevance (strict inequality on
    // it decides any longer lexicographic ordering); only the default
    // null placements are sound for the truncation rules
    val o = orders.head
    val colName = o.expression() match {
      case nr: NamedReference if nr.fieldNames().length == 1 =>
        Some(nr.fieldNames()(0))
      case _ => None
    }
    val desc = o.direction() == SortDirection.DESCENDING
    val nullsOk =
      (!desc && o.nullOrdering() == NullOrdering.NULLS_FIRST) ||
        (desc && o.nullOrdering() == NullOrdering.NULLS_LAST)
    val typeOk = colName.exists(c => tableSchema.fields.exists(f =>
      f.name == c && (f.dataType match {
        case LongType | IntegerType | ShortType | DateType => true
        case d: DecimalType => d.precision <= 18
        case _ => false
      })))
    if (nullsOk && typeOk) {
      pushedTopNCol = Some((colName.get, desc)); pushedLimitN = limit; true
    } else false
  }

  /** Metadata-only COUNT(*)/MIN/MAX ([[MetadataAgg]]). Spark only
    * attempts aggregate pushdown when no post-scan filters remain —
    * and every filter this builder accepts stays a residual — so the
    * `pushed.isEmpty` guard is belt-and-braces. Both entry points
    * recompute (Spark may probe completeness with a different
    * translation than it finally pushes); tryCompute is deterministic
    * per aggregation, so last-call-wins is safe. */
  private def computeAgg(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[(StructType, Seq[org.apache.spark.sql.catalyst.InternalRow])] =
    // changelog mode: a metadata COUNT would count LIVE rows, not
    // change rows — fall through to the (refusing) batch path instead
    if (cowOwner.nonEmpty || pushed.nonEmpty || changelog) None
    else
      try MetadataAgg.tryCompute(
        agg, TableReader.snapshot(tableDir, asOfVersion, catalog), tableSchema)
      catch { case scala.util.control.NonFatal(_) => None }

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    pushedAgg = computeAgg(agg)
    pushedAgg.isDefined
  }

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    pushedAgg = computeAgg(agg)
    pushedAgg.isDefined
  }

  override def pruneColumns(required: StructType): Unit = {
    // preserve TABLE column order (parquet projection order must be a
    // sub-sequence of the file schema); Spark reorders above if needed.
    // `_file` / `_pos` are metadata columns (emitted by the reader, not
    // read from parquet) — track them separately.
    includeFileColumn = required.fieldNames.contains(GraftBatchScan.FileColumn)
    includePosColumn = required.fieldNames.contains(GraftBatchScan.PosColumn)
    requiredSchema = StructType(
      tableSchema.fields.filter(f => required.fieldNames.contains(f.name)))
  }

  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    // Inexact pushdown (reference P2): keep what file-pruning can use
    // (integral bounds, exact-equality literals the partition
    // transforms can hash, or null predicates the null-count stamps
    // decide), hand EVERYTHING back to Spark to re-apply
    pushed = filters.filter { f =>
      lazy val nulls = ScanPruning.nullPredicateCols(Seq(f))
      boundsOf(Seq(f)).nonEmpty || equalityCandidates(Seq(f)).nonEmpty ||
        ScanPruning.stringConstraints(Seq(f), stringCols).nonEmpty ||
        nulls._1.nonEmpty || nulls._2.nonEmpty
    }
    filters
  }

  private lazy val stringCols: Set[String] =
    GraftBatchScan.stringColsOf(tableSchema)
  override def pushedFilters(): Array[sources.Filter] = pushed

  /** column → exact literal values allowed by `filters` (EqualTo / In,
    * conjunctions included) — the inputs of transform-aware partition
    * pruning ([[PartitionPruning]]). */
  private def equalityCandidates(
      filters: Seq[sources.Filter]): Map[String, Seq[Any]] =
    filters.foldLeft(Map.empty[String, Seq[Any]]) { (acc, f) =>
      val m: Map[String, Seq[Any]] = f match {
        case sources.EqualTo(a, v) => Map(a -> Seq(v))
        case sources.In(a, vs)     => Map(a -> vs.toSeq)
        case sources.And(l, r)     => equalityCandidates(Seq(l, r))
        case _                     => Map.empty
      }
      // conjunction: a column constrained twice keeps the TIGHTER set
      m.foldLeft(acc) { case (a, (k, vs)) =>
        a.get(k) match {
          case Some(prev) => a + (k -> prev.intersect(vs))
          case None       => a + (k -> vs)
        }
      }
    }

  /** sources.Filter → integral [lo, hi] bounds, same conservative rules
    * as [[ScanPruning.constraints]]: integral comparisons, plus
    * decimals of ≤18 digits compared in UNSCALED space (order-preserving
    * at the column's fixed scale; the footer stats of INT32/INT64-backed
    * decimal columns are unscaled values — [[ParquetStats]]). A literal
    * that doesn't land exactly on the column's scale contributes
    * nothing (conservative: the file is kept). */
  private def boundsOf(filters: Seq[sources.Filter]): ScanPruning.Bounds = {
    lazy val colTypes: Map[String, DataType] =
      tableSchema.fields.map(f => f.name -> f.dataType).toMap
    def lit(a: String, v: Any): Option[Long] = colTypes.get(a) match {
      case Some(d: DecimalType) if d.precision <= 18 =>
        val bd: Option[java.math.BigDecimal] = v match {
          case b: java.math.BigDecimal => Some(b)
          case b: scala.math.BigDecimal => Some(b.bigDecimal)
          case dec: Decimal => Some(dec.toJavaBigDecimal)
          case _ => None
        }
        bd.flatMap { b =>
          try Some(b.setScale(d.scale).unscaledValue().longValueExact())
          catch { case _: ArithmeticException => None }
        }
      case Some(_: DecimalType) => None // FLBA-backed: stats untrusted
      case Some(DateType) => v match {
        // date stats are INT32 epoch days — compare in that domain
        case d: java.sql.Date => Some(
          org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d).toLong)
        case d: java.time.LocalDate => Some(d.toEpochDay)
        case _ => None
      }
      case _ => v match {
        case i: Int => Some(i.toLong); case l: Long => Some(l)
        case s: Short => Some(s.toLong); case _ => None
      }
    }
    filters.foldLeft(Map.empty: ScanPruning.Bounds) { (acc, f) =>
      val b: ScanPruning.Bounds = f match {
        case sources.EqualTo(a, v)            => lit(a, v).map(x => Map(a -> (x, x))).getOrElse(Map.empty)
        // saturate at the extremes: `> Long.MaxValue` / `< Long.MinValue`
        // are impossible predicates — an empty range (lo > hi) prunes
        // every file rather than wrapping around and keeping all of them
        case sources.GreaterThan(a, v)        => lit(a, v).map(x => Map(a -> (if (x == Long.MaxValue) (1L, 0L) else (x + 1, Long.MaxValue)))).getOrElse(Map.empty)
        case sources.GreaterThanOrEqual(a, v) => lit(a, v).map(x => Map(a -> (x, Long.MaxValue))).getOrElse(Map.empty)
        case sources.LessThan(a, v)           => lit(a, v).map(x => Map(a -> (if (x == Long.MinValue) (1L, 0L) else (Long.MinValue, x - 1)))).getOrElse(Map.empty)
        case sources.LessThanOrEqual(a, v)    => lit(a, v).map(x => Map(a -> (Long.MinValue, x))).getOrElse(Map.empty)
        case sources.And(l, r)                => boundsOf(Seq(l, r))
        case _                                => Map.empty
      }
      ScanPruning.mergeBounds(acc, b)
    }
  }

  override def build(): Scan = pushedAgg match {
    case Some((schema, rows)) => new GraftAggScan(schema, rows, tableDir)
    case None =>
      new GraftScan(tableDir, tableSchema, requiredSchema, boundsOf(pushed.toSeq),
        asOfVersion, catalog, startingVersion, skipDeletes,
        includeFileColumn, cowOwner, splitTargetBytes, includePosColumn,
        vectorizedRead, equalityCandidates(pushed.toSeq), pushed.toSeq,
        changelog = changelog, pushedLimit = pushedLimitN,
        pushedTopN = pushedTopNCol)
  }
}

final class GraftScan(
    tableDir: String,
    tableSchema: StructType,
    requiredSchema: StructType,
    pruneBounds: ScanPruning.Bounds,
    asOfVersion: Option[Long],
    catalog: TableCatalog,
    startingVersion: String,
    skipDeletes: Boolean,
    includeFileColumn: Boolean = false,
    cowOwner: Option[graft.sinks.RowLevelScanOwner] = None,
    splitTargetBytes: Long = GraftBatchScan.DefaultSplitTargetBytes,
    includePosColumn: Boolean = false,
    vectorizedRead: Boolean = true,
    pushedEqCandidates: Map[String, Seq[Any]] = Map.empty,
    /** The pushed `sources.Filter`s verbatim — shipped to every task for
      * row-group statistics skipping ([[ParquetPredicate]]). */
    pushedSourceFilters: Seq[sources.Filter] = Nil,
    /** Streaming CDC mode ([[graft.streaming.ChangelogStream]]):
      * microbatches emit change rows; batch reads refuse. */
    changelog: Boolean = false,
    /** Pushed `LIMIT n` (−1 = none): permission to plan only files whose
      * guaranteed live rows cover n ([[ScanPruning.truncateForLimit]]).
      * Partial pushdown — Spark's own limit still runs on top. */
    pushedLimit: Int = -1,
    /** Pushed `ORDER BY col [DESC] LIMIT n` leading key: file truncation
      * by stamped bounds ([[ScanPruning.truncateForTopN]]). */
    pushedTopN: Option[(String, Boolean)] = None
) extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering with SupportsReportPartitioning
    with SupportsReportOrdering {

  override def readSchema(): StructType = {
    var fields = requiredSchema.fields
    if (includeFileColumn) fields = fields :+
      StructField(GraftBatchScan.FileColumn, StringType, nullable = false)
    if (includePosColumn) fields = fields :+
      StructField(GraftBatchScan.PosColumn, LongType, nullable = false)
    StructType(fields)
  }
  override def toBatch: Batch = {
    if (changelog) throw CompactionError.Config(
      "changelog=true is a streaming read mode (readStream); the batch " +
        "CDC read is TableReader.changelog()")
    this
  }
  override def description(): String =
    s"graft MoR $tableDir${asOfVersion.fold("")(v => s" @v$v")}"

  /** Runtime filtering (the DSv2 analog of dynamic partition pruning):
    * when a graft table is joined to a selective side, Spark executes
    * that side first and hands the join-key values back here as `In`
    * filters BEFORE tasks launch — each value set collapses to a
    * per-file footer-stats membership test, so a 100 TB fact table
    * joined to a pruned dimension scans only the files that can match.
    * Integral columns only (the same conservative envelope as
    * [[ScanPruning]]); anything else keeps every file. Spark resolves
    * these against the scan's pruned OUTPUT, so they must come from
    * `requiredSchema`, never the full table schema. The `_file`
    * metadata column (when projected) is also filterable — row-level
    * operations group-filter on it, and an `In(_file, …)` collapses to
    * an EXACT path-set selection with no footer reads at all. */
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] = {
    // string/date identity partitions benefit from transform pruning
    // too, so they are exposed alongside the integral columns (the
    // footer-stat path below simply ignores what it cannot compare)
    val dataCols = requiredSchema.fields.collect {
      case f if f.dataType == LongType || f.dataType == IntegerType ||
        f.dataType == ShortType || f.dataType == StringType ||
        f.dataType == DateType =>
        org.apache.spark.sql.connector.expressions.Expressions.column(f.name)
    }
    if (includeFileColumn)
      dataCols :+ org.apache.spark.sql.connector.expressions.Expressions
        .column(GraftBatchScan.FileColumn)
    else dataCols
  }

  @volatile private var runtimeInSets: Map[String, Array[Long]] = Map.empty
  @volatile private var runtimeEqCandidates: Map[String, Seq[Any]] = Map.empty
  @volatile private var runtimePathSet: Option[Set[String]] = None

  override def filter(filters: Array[sources.Filter]): Unit = {
    // integral view of a runtime value set — feeds FOOTER-STAT pruning,
    // so dates map to their epoch-day stats domain; strings drop out
    def longs(vs: Array[Any]): Option[Array[Long]] = {
      val out = vs.flatMap {
        case i: Int => Some(i.toLong); case l: Long => Some(l)
        case s: Short => Some(s.toLong); case null => None
        case d: java.sql.Date => Some(
          org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d).toLong)
        case d: java.time.LocalDate => Some(d.toEpochDay)
        case _ => return None // unusable for stats comparison
      }
      Some(out)
    }
    runtimePathSet = filters.collectFirst {
      case sources.In(attr, vs) if attr == GraftBatchScan.FileColumn =>
        vs.collect { case s: String => ScanPlanner.normalizePath(s) }.toSet
      case sources.EqualTo(attr, v: String) if attr == GraftBatchScan.FileColumn =>
        Set(ScanPlanner.normalizePath(v))
    }
    val sets = filters.collect {
      case sources.In(attr, vs) if attr != GraftBatchScan.FileColumn =>
        attr -> vs
      case sources.EqualTo(attr, v) if attr != GraftBatchScan.FileColumn =>
        attr -> Array(v)
    }
    runtimeInSets = sets.flatMap { case (a, vs) => longs(vs).map(a -> _) }.toMap
    // raw values for TRANSFORM pruning (PartitionPruning coerces per
    // column type; null candidates can never equal a partition value)
    runtimeEqCandidates = sets
      .map { case (a, vs) => a -> vs.filter(_ != null).toSeq }
      .filter(_._2.nonEmpty).toMap
  }

  override def toMicroBatchStream(
      checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new graft.streaming.GraftMicroBatchStream(
      tableDir, tableSchema, startingVersion, skipDeletes, catalog,
      changelog = changelog)

  private lazy val snap: TableSnapshot = TableReader.snapshot(tableDir, asOfVersion, catalog)

  /** Footer stats are keyed by PHYSICAL column names, so pruning only
    * applies to files written under the current schema (same guard as
    * [[TableReader.readOption]]); older files always survive. */
  private def pruneGuarded(data: Seq[FileEntry],
      prune: Seq[FileEntry] => Seq[FileEntry]): Seq[FileEntry] = {
    val (pr, keep) = data.partition(snap.isCurrentSchema)
    prune(pr) ++ keep
  }

  private lazy val partSpec: Seq[graft.core.PartitionTransform] =
    graft.core.PartitionSpecCodec.of(Some(snap))
  /** Per-file spec resolution for spec-evolved tables (identical to
    * partSpec for every file on a never-evolved table). */
  private lazy val specForFile: FileEntry => Seq[graft.core.PartitionTransform] =
    graft.core.PartitionSpecCodec.specForFile(Some(snap))
  /** Whether ANY spec can prune here: the current one, or — after an
    * evolution to unpartitioned — an OLD spec some files still carry
    * (their partitioned names prune under their own layout even though
    * the current spec is empty). */
  private lazy val anySpecPrunes: Boolean =
    partSpec.nonEmpty ||
      snap.properties.contains(graft.core.PartitionSpecCodec.HistoryProperty)
  private lazy val colTypes: Map[String, DataType] =
    tableSchema.fields.map(f => f.name -> f.dataType).toMap
  /** String columns eligible for byte-bound pruning — the ONE shared
    * definition ([[GraftBatchScan.stringColsOf]]), so the pushdown,
    * plan-time, and runtime paths can never diverge. */
  private lazy val scanStringCols: Set[String] =
    GraftBatchScan.stringColsOf(tableSchema)
  /** analyze_table NDVs, hash-validated ONCE per scan — the file-set
    * digest is O(files) and estimateStatistics can run several times
    * per planning pass. */
  private lazy val cachedNdv: Map[String, Long] =
    graft.txn.TableAnalyze.currentNdv(snap)
  private lazy val cachedHist: Map[String, graft.txn.TableAnalyze.Hist] =
    graft.txn.TableAnalyze.exactHistograms(snap)

  private lazy val staticPrunedDataFiles: Seq[FileEntry] = {
    val data = snap.files.filter(_.content == "data")
    // transform-aware partition pruning first: name-parse only, no IO;
    // per-file spec resolution handles spec-evolved tables
    val partPruned =
      if (!anySpecPrunes || pushedEqCandidates.isEmpty) data
      else PartitionPruning.prunePerFile(data, specForFile,
        pushedEqCandidates, colTypes)
    val boundsPruned =
      if (pruneBounds.isEmpty) partPruned
      else pruneGuarded(partPruned,
        ScanPruning.pruneDataFilesWithBounds(_, pruneBounds,
          // boundsOf expressed these columns' bounds in unscaled space
          tableSchema.fields.collect {
            case f if f.dataType.isInstanceOf[DecimalType] => f.name
          }.toSet))
    // string bounds (base64 byte stamps) answer string predicates —
    // equality/In/range/StartsWith — from snapshot metadata alone
    val strCs = ScanPruning.stringConstraints(pushedSourceFilters, scanStringCols)
    val strPruned =
      if (strCs.isEmpty) boundsPruned
      else pruneGuarded(boundsPruned,
        ScanPruning.pruneDataFilesWithStringBounds(_, strCs))
    // null-count stamps answer IS [NOT] NULL predicates metadata-only
    val (isNullCols, isNotNullCols) =
      ScanPruning.nullPredicateCols(pushedSourceFilters)
    if (isNullCols.isEmpty && isNotNullCols.isEmpty) strPruned
    else pruneGuarded(strPruned,
      ScanPruning.pruneDataFilesWithNullCounts(_, isNullCols, isNotNullCols))
  }

  /** True when NO delete (position / vector / later-sequence equality)
    * can remove rows from `f` — the gate for counting its full
    * `recordCount` toward a pushed-limit guarantee. */
  private lazy val cleanOfDeletes: FileEntry => Boolean = {
    val hasPos = snap.files.exists(_.content == "position-deletes")
    val dvRefs = snap.files.filter(_.content == "deletion-vectors")
      .flatMap(_.referencedDataFile).map(ScanPlanner.normalizePath).toSet
    val eqs = snap.files.filter(_.content == "equality-deletes")
    f =>
      !hasPos && !dvRefs.contains(ScanPlanner.normalizePath(f.path)) &&
        eqs.forall(e => e.sequenceNumber <= f.sequenceNumber ||
          (snap.isCurrentSchema(e) && snap.isCurrentSchema(f) &&
            !ScanPruning.eqDeleteMayApply(e, f)))
  }

  /** The planned file set: static pruning plus pushed LIMIT/TopN file
    * truncation. The truncated set feeds EVERY consumer — partitioning
    * and ordering reports, statistics, task planning — so the reports
    * stay mutually consistent (see the co-occurrence note in
    * [[planInputPartitions]] for why runtime join filters can never
    * invalidate a pushed limit's row guarantee). */
  private lazy val prunedDataFiles: Seq[FileEntry] = {
    val base = staticPrunedDataFiles
    if (pushedLimit <= 0 || changelog || cowOwner.nonEmpty) base
    else {
      val truncated = pushedTopN match {
        case Some((c, desc)) => ScanPruning.truncateForTopN(
          base, c, desc, pushedLimit.toLong, cleanOfDeletes,
          snap.isCurrentSchema)
        case None => ScanPruning.truncateForLimit(
          base, pushedLimit.toLong, cleanOfDeletes)
      }
      truncated.getOrElse(base)
    }
  }

  /** Storage-partitioned-join surface: the clustering expressions plus
    * each data file's TYPED partition key, parsed from the fanout
    * layout the writers stamped (file-name prefix / `__p_` dirs) — no
    * IO. Defined only when the whole spec is join-expressible (identity
    * over integral/string/date sources, bucket over hashable sources)
    * AND every pruned data file parses to a full key; one un-keyed file
    * (a pre-partitioning append) disables the report, never corrupts
    * it. Values are Catalyst-typed to match what Spark evaluates the
    * clustering expressions to: identity → the column's value domain,
    * bucket → the int bucket ordinal. The rendered-string round-trip is
    * identical on both sides of a join (one shared renderer), so
    * sanitization collisions cost only co-grouping — the join condition
    * still compares real values.
    *
    * Always reported when available: the physical grouping (and thus
    * any parallelism trade) only happens once the user opts in via
    * `spark.sql.sources.v2.bucketing.enabled`, and Catalyst drops the
    * report gracefully when the partition source column is pruned from
    * the scan output or the function catalog is absent. */
  private lazy val spjKeys: Option[(
      Array[org.apache.spark.sql.connector.expressions.Expression],
      Map[String, Array[Any]])] = {
    import graft.core.{BucketTransform, IdentityTransform, PartitionKey}
    import org.apache.spark.sql.connector.expressions.{Expressions => XE}
    // spec-evolved tables: an old-spec file's rendered fields can ALIAS
    // the current spec's field names (bucket(4) and bucket(8) both
    // render `c_bucket=k`) — reporting its key as a current-spec value
    // would co-group rows wrongly. Disable the report until compaction
    // migrates every file to the current spec.
    val curSpecId = graft.core.PartitionSpecCodec.currentId(Some(snap))
    val mixedSpecs = snap.properties
      .contains(graft.core.PartitionSpecCodec.HistoryProperty) &&
      prunedDataFiles.exists(f => math.max(f.specId, 0L) != curSpecId)
    if (partSpec.isEmpty || mixedSpecs) None
    else {
      val exprs = partSpec.map {
        case IdentityTransform(c) => colTypes.get(c).collect {
          case LongType | IntegerType | ShortType | StringType | DateType =>
            XE.column(c): org.apache.spark.sql.connector.expressions.Expression
        }
        case BucketTransform(n, c)
            if colTypes.get(c).exists(graft.sql.GraftV2Functions.bucketSupported) =>
          Some(XE.bucket(n, c): org.apache.spark.sql.connector.expressions.Expression)
        case _ => None
      }
      if (exprs.exists(_.isEmpty)) None
      else {
        def typed(t: graft.core.PartitionTransform, raw: String): Option[Any] =
          if (raw == "null") Some(null)
          else t match {
            case IdentityTransform(c) => colTypes(c) match {
              case LongType => raw.toLongOption
              case IntegerType => raw.toIntOption
              case ShortType => raw.toShortOption
              case StringType => Some(UTF8String.fromString(raw))
              case DateType =>
                try Some(java.time.LocalDate.parse(raw).toEpochDay.toInt)
                catch { case _: java.time.format.DateTimeParseException => None }
              case _ => None
            }
            case BucketTransform(_, _) => raw.toIntOption
            case _ => None
          }
        val byPath = prunedDataFiles.map { f =>
          val fields = PartitionKey.parse(f.path)
          val key = partSpec.map(t => fields.get(t.fieldName).flatMap(typed(t, _)))
          f.path -> (if (key.exists(_.isEmpty)) null
                     else key.map(_.get).toArray)
        }
        if (byPath.exists(_._2 == null)) None
        else Some((exprs.map(_.get).toArray, byPath.toMap))
      }
    }
  }

  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    spjKeys match {
      case Some((exprs, byPath)) =>
        new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
          exprs, byPath.values.map(_.toSeq).toSet.size)
      case None =>
        new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(0)
    }

  /** Sorted-scan report ([[SupportsReportOrdering]]): when every
    * surviving data file carries the SAME non-empty physical-order stamp
    * ([[graft.txn.FileEntry.sortedBy]] — written only by provably-sorted
    * writers), the scan's partitions are each sorted by it, and Spark
    * can ELIDE sorts downstream: a merge join over two co-bucketed,
    * co-sorted tables runs with no exchange AND no sort (the full
    * sorted-bucket-table fast path), and an ORDER BY over a compacted
    * single-file table collapses to the bare scan. The claim is
    * per-RDD-partition, so it must survive every partitioning step:
    *
    *  - each input partition is one file (or one contiguous row-group
    *    range of one file) — a filter-only reader never reorders rows,
    *    and delete application (pos/eq/DV) is a filter;
    *  - under SPJ key-grouping Spark may CONCATENATE same-key splits
    *    into one partition, so the report additionally requires one
    *    file per partition key, small enough not to split — compaction
    *    produces exactly that layout;
    *  - files written under an older schema (stamp names may alias) or
    *    without a stamp disable the report — declaring a write order on
    *    a table with pre-existing unsorted files stays honest until
    *    compaction rewrites them.
    *
    * The reported prefix stops at the first column missing from the
    * pruned output (a file sorted by (a, b) is sorted by (a)). */
  private lazy val orderingReport
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] = {
    import org.apache.spark.sql.connector.expressions.{Expressions => XE, SortDirection}
    val files = prunedDataFiles
    val stamp = files.headOption.map(_.sortedBy).getOrElse("")
    val uniform = stamp.nonEmpty && files.forall(f =>
      f.sortedBy == stamp && snap.isCurrentSchema(f))
    if (changelog || !uniform) Array.empty
    else {
      val groupedSafe = spjKeys match {
        case None => true // one RDD partition per file split
        case Some((_, byPath)) =>
          // key-grouping may merge same-key splits: require exactly one
          // unsplit file per key so a group is one sorted run
          byPath.values.map(_.toSeq).groupBy(identity).forall(_._2.size == 1) &&
            files.forall(_.sizeBytes <= splitTargetBytes)
      }
      if (!groupedSafe) Array.empty
      else {
        val out = requiredSchema.fieldNames.toSet
        graft.core.WriteOrderCodec.decode(stamp)
          .takeWhile(f => out.contains(f.column))
          .map(f => XE.sort(XE.column(f.column),
            if (f.descending) SortDirection.DESCENDING
            else SortDirection.ASCENDING))
          .toArray
      }
    }
  }

  override def outputOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    orderingReport

  /** Per-task position-delete scoping: [[graft.compaction
    * .DeleteCompaction]] lands position deletes SORTED by (file_path,
    * pos), so each delete file's footer carries a tight file_path
    * [min, max] — a task only loads the delete files whose range can
    * contain its data path. One driver-side footer read per delete
    * file, memoized across planning calls; a file without trustworthy
    * stats (or whose paths use a non-plain-absolute form the range test
    * cannot compare safely) is kept for every task — conservative,
    * never wrong. */
  private lazy val posDeleteRanges
      : Seq[(PosDeleteSpec, Option[(Array[Byte], Array[Byte])])] =
    snap.files.filter(_.content == "position-deletes")
      .sortBy(_.path)
      .map { f =>
        PosDeleteSpec(f.path, f.sizeBytes) ->
          (try ParquetStats.stringRange(f.path, "file_path") catch {
            case _: Exception => None
          })
      }

  /** Deletion vectors resolve to their data file EXACTLY from snapshot
    * metadata (`referencedDataFile`) — zero footer IO, unlike the
    * parquet path-range scoping above. At most one per data file; a
    * snapshot violating that invariant (e.g. hand-edited, or two
    * spellings of one path normalizing together) must fail the read
    * loudly — a silent last-wins map would drop the other vector's
    * deletes and resurrect rows. */
  private lazy val dvByData: Map[String, DvSpec] = {
    val pairs = snap.files.filter(_.content == "deletion-vectors").map { f =>
      ScanPlanner.normalizePath(f.referencedDataFile.getOrElse(
        throw CompactionError.Config(
          s"deletion-vector entry ${f.path} lacks a referenced data file"))) ->
        DvSpec(f.path, f.contentOffset, f.contentSizeBytes, f.sizeBytes)
    }
    pairs.groupBy(_._1).find(_._2.size > 1).foreach { case (ref, vs) =>
      throw CompactionError.Config(
        s"${vs.size} deletion vectors reference data file $ref " +
          s"(${vs.map(_._2.path).mkString(", ")}); the snapshot violates " +
          "the one-vector-per-file invariant")
    }
    pairs.toMap
  }

  private def posDeletesFor(d: FileEntry): Seq[PosDeleteSpec] = {
    val key = ScanPlanner.normalizePath(d.path)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    posDeleteRanges.collect {
      case (p, Some((mn, mx)))
        if mn.headOption.contains('/'.toByte) && mx.headOption.contains('/'.toByte) =>
        if (ParquetStats.unsignedLe(mn, key) && ParquetStats.unsignedLe(key, mx))
          Some(p)
        else None
      case (p, _) => Some(p) // no usable stats -> every task keeps it
    }.flatten
  }

  /** Metadata-only estimate: bytes of surviving data files; rows net of
    * position deletes (equality-delete selectivity is unknowable without
    * reading keys — leaving it out overestimates, which only errs on the
    * safe side of a broadcast decision). Position deletes are subtracted
    * only for an UNPRUNED scan — decided by comparing the surviving file
    * set against the snapshot's, so EVERY pruning mechanism (bounds,
    * partition, null-count) disables the subtraction: after file pruning
    * the deletes targeting pruned-away files would deflate the estimate
    * below the truth, and an underestimate is the dangerous direction
    * (it invites broadcasting a large side). */
  override def estimateStatistics(): Statistics = {
    val bytes = prunedDataFiles.map(_.sizeBytes).sum
    val posDeleted =
      if (prunedDataFiles.size != snap.files.count(_.content == "data")) 0L
      else snap.files.filter(f => f.content == "position-deletes" ||
          f.content == "deletion-vectors")
        .map(_.recordCount).sum
    val rows = math.max(0L, prunedDataFiles.map(_.recordCount).sum - posDeleted)
    val colStats = columnStatsFromStamps(prunedDataFiles)
    new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.of(bytes)
      override def numRows(): OptionalLong = OptionalLong.of(rows)
      override def columnStats(): java.util.Map[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics] =
        colStats
    }
  }

  /** Per-column CBO statistics straight from the write-time stamps —
    * min/max of the integral/date columns and null counts, merged
    * across the surviving files at plan time with ZERO file IO (the
    * DSv2 `columnStats` surface; Spark's cost-based join planning
    * consumes them when `spark.sql.cbo.enabled` is on). A statistic is
    * reported only when EVERY surviving data file stamps it: a partial
    * sum understates, and an understated null count or shrunken range
    * skews selectivity the dangerous way. Bounds stay valid under
    * deletes (they only shrink the true range — a superset bound is
    * conservative); files written under older schemas stamp under
    * old names, so evolved tables simply report nothing for the
    * affected columns. */
  private def columnStatsFromStamps(files: Seq[FileEntry]): java.util.Map[
      org.apache.spark.sql.connector.expressions.NamedReference,
      org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
    import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
    import org.apache.spark.sql.connector.read.colstats.ColumnStatistics
    val out = new java.util.HashMap[NamedReference, ColumnStatistics]()
    if (files.isEmpty) return out
    // stamps are keyed by WRITE-time column names — a file written under
    // an older schema could alias a since-reused name to different data
    // (same guard every pruning path applies via pruneGuarded); one such
    // file in scope suppresses all column statistics
    if (files.exists(f => snap.schemas.nonEmpty && f.schemaId >= 0 &&
        f.schemaId != snap.schemaId)) return out
    // write-time null counts cannot see later MoR deletes — with any
    // delete in the snapshot a stamped sum may exceed the reported
    // numRows (nullPercent > 1 skews CBO selectivity the dangerous
    // way), so suppress null counts; min/max stay (deletes only shrink
    // the true range — a superset bound is conservative)
    val nullsSafe = !snap.files.exists(_.content != "data")
    // analyze_table NDVs: exact-file-set-guarded (TableAnalyze), and
    // only for an UNPRUNED scan — table-level distinct counts over a
    // pruned subset overstate, which undersizes join outputs
    val unpruned = files.size == snap.files.count(_.content == "data")
    val ndv: Map[String, Long] = if (unpruned) cachedNdv else Map.empty
    // analyze-time equi-height histograms, same exact-file-set guard
    // and same no-pruned-subset rule (a table-level distribution over
    // a pruned scan misstates selectivity)
    val hist: Map[String, graft.txn.TableAnalyze.Hist] =
      if (unpruned) cachedHist else Map.empty
    tableSchema.fields.foreach { fld =>
      val c = fld.name
      // internal-typed min/max objects per Catalyst convention
      def boxed(v: Long): Option[AnyRef] = fld.dataType match {
        case org.apache.spark.sql.types.LongType      => Some(Long.box(v))
        case org.apache.spark.sql.types.IntegerType   => Some(Int.box(v.toInt))
        case org.apache.spark.sql.types.DateType      => Some(Int.box(v.toInt))
        case org.apache.spark.sql.types.TimestampType => Some(Long.box(v))
        case _                                        => None
      }
      val his = files.flatMap(f => FileEntry.loHi(f.bounds.getOrElse(c, Nil)))
      val minMax: Option[(AnyRef, AnyRef)] =
        if (his.size != files.size) None
        else for {
          lo <- boxed(his.map(_._1).min)
          hi <- boxed(his.map(_._2).max)
        } yield (lo, hi)
      val nulls: Option[Long] =
        if (!nullsSafe) None
        else {
          val ns = files.flatMap(f => FileEntry.longAt(f.nullCounts, c))
          if (ns.size != files.size) None else Some(ns.sum)
        }
      val distinct: Option[Long] = ndv.get(c)
      val histo: Option[graft.txn.TableAnalyze.Hist] = hist.get(c)
      if (minMax.isDefined || nulls.isDefined || distinct.isDefined ||
          histo.isDefined)
        out.put(Expressions.column(c), new ColumnStatistics {
          override def min(): java.util.Optional[Object] =
            minMax.fold(java.util.Optional.empty[Object]())(m =>
              java.util.Optional.of(m._1))
          override def max(): java.util.Optional[Object] =
            minMax.fold(java.util.Optional.empty[Object]())(m =>
              java.util.Optional.of(m._2))
          override def nullCount(): OptionalLong =
            nulls.fold(OptionalLong.empty())(OptionalLong.of)
          override def distinctCount(): OptionalLong =
            distinct.fold(OptionalLong.empty())(OptionalLong.of)
          override def histogram(): java.util.Optional[
              org.apache.spark.sql.connector.read.colstats.Histogram] =
            histo.fold(java.util.Optional.empty[
                org.apache.spark.sql.connector.read.colstats.Histogram]()) { h =>
              java.util.Optional.of(
                new org.apache.spark.sql.connector.read.colstats.Histogram {
                  override def height(): Double = h.height
                  override def bins(): Array[
                      org.apache.spark.sql.connector.read.colstats.HistogramBin] =
                    h.bins.map { case (l, u, n) =>
                      new org.apache.spark.sql.connector.read.colstats.HistogramBin {
                        override def lo(): Double = l
                        override def hi(): Double = u
                        override def ndv(): Long = n
                      }: org.apache.spark.sql.connector.read.colstats.HistogramBin
                    }.toArray
                })
            }
        })
    }
    out
  }

  override def planInputPartitions(): Array[InputPartition] = {
    // Schema-history resolution (the per-task mirror of
    // [[SchemaReconcile]]): files written under older schemas get an
    // id-translated column map; un-evolved tables get identity maps.
    val byId = snap.schemas.map(s => s.schemaId -> s).toMap
    val current = snap.currentSchema
    def oldSchemaOf(schemaId: Long): Option[graft.core.TableSchema] =
      current.flatMap { cur =>
        if (schemaId < 0 || schemaId == cur.schemaId) None
        else Some(byId.getOrElse(schemaId, throw CompactionError.Config(
          s"file written under unknown schema id $schemaId (history: " +
            s"${snap.schemas.map(_.schemaId).mkString(", ")})")))
      }
    val identityMap: Map[String, Option[String]] =
      tableSchema.fieldNames.map(n => n -> Some(n)).toMap
    def columnMapFor(f: FileEntry): Map[String, Option[String]] =
      oldSchemaOf(f.schemaId) match {
        case None => identityMap
        case Some(old) => current.get.fields.map(fl =>
          fl.name -> old.fieldById.get(fl.id).map(_.name)).toMap
      }
    def defaultFillFor(f: FileEntry): Map[String, String] =
      oldSchemaOf(f.schemaId) match {
        case None => Map.empty
        case Some(old) => current.get.fields.collect {
          case fl if !old.fieldById.contains(fl.id) &&
              fl.initialDefault.isDefined =>
            fl.name -> fl.initialDefault.get
        }.toMap
      }
    def keyColsFor(e: FileEntry): Seq[(String, String)] =
      oldSchemaOf(e.schemaId) match {
        case None => e.equalityIds.map(n => (n, n))
        case Some(old) => e.equalityIds.map { n =>
          val id = old.idByName.getOrElse(n, throw CompactionError.Config(
            s"equality column '$n' of ${e.path} not in its schema ${e.schemaId}"))
          val cur = current.get.fieldById.getOrElse(id,
            throw CompactionError.Config(
              s"equality-delete ${e.path} keys on field $id ('$n'), which " +
                "the current schema dropped — the delete cannot apply"))
          (cur.name, n)
        }
      }
    val eqFiles = snap.files.filter(_.content == "equality-deletes")
      .sortBy(f => (f.sequenceNumber, f.path))
    // NOTE on pushed limits vs runtime join filters: they never
    // co-occur. Spark only pushes a limit when nothing between it and
    // the relation can drop rows (our filters all stay residual, so a
    // WHERE blocks it), and runtime filters come from an equi-join
    // above — under which no limit is ever pushed to this scan. The
    // truncated set is also what outputPartitioning/outputOrdering
    // reported, so planning MUST use the same list — a divergent
    // fallback here would break the SPJ key-stamping below.
    val afterInSets1 =
      if (runtimeInSets.isEmpty) prunedDataFiles
      else pruneGuarded(prunedDataFiles,
        ScanPruning.pruneDataFilesWithInSets(_, runtimeInSets))
    // join-driven STRING key values prune by the stamped byte bounds —
    // the string half of runtime file skipping
    val strCands = ScanPruning.stringCandidateConstraints(
      runtimeEqCandidates, scanStringCols)
    val afterInSets0 =
      if (strCands.isEmpty) afterInSets1
      else pruneGuarded(afterInSets1,
        ScanPruning.pruneDataFilesWithStringBounds(_, strCands))
    // join-driven bucket pruning: runtime In values hash through the
    // partition transforms, dropping whole buckets before tasks launch
    // (raw candidate values — string/date identity sources prune here
    // even though footer stats cannot compare them)
    val afterInSets =
      if (!anySpecPrunes || runtimeEqCandidates.isEmpty) afterInSets0
      else PartitionPruning.prunePerFile(afterInSets0, specForFile,
        runtimeEqCandidates, colTypes)
    // _file group filter is EXACT — empty set means no group matched
    val afterRuntime = runtimePathSet.fold(afterInSets) { paths =>
      afterInSets.filter(f => paths.contains(ScanPlanner.normalizePath(f.path)))
    }
    // report the planned groups to the row-level operation: its
    // copy-on-write commit replaces exactly these files (distinct —
    // splitting emits several partitions per file), plus the full
    // snapshot path set its append-tolerant conflict guard compares
    cowOwner.foreach(_.recordScan(
      afterRuntime.map(_.path).distinct,
      snap.files.map(_.path).toSet, snap.schemaId))
    // fetched once per planning pass — calling this inside the flatMap
    // would re-read every oversized footer N times (O(N*K) driver
    // round-trips) and spin up a fresh pool per file
    val layouts = rowGroupLayouts(afterRuntime)
    // task-side ROW-GROUP skipping sees the pushed filters plus the
    // runtime In sets (reconstructed as In filters) — the same values
    // that pruned whole files above also skip row groups inside the
    // surviving files. NEVER when this scan drives a row-level
    // operation: a copy-on-write rewrite must read EVERY live row of
    // the files it replaces (file-level pruning merely leaves a file
    // out of the rewrite — still correct — but skipping row groups
    // inside a replaced file would silently drop their rows from the
    // rewritten data: data loss).
    val taskFilters: Seq[sources.Filter] =
      if (cowOwner.isDefined) Nil
      else pushedSourceFilters ++
        runtimeEqCandidates.collect {
          case (a, vs) if a != GraftBatchScan.FileColumn =>
            sources.In(a, vs.toArray)
        }
    afterRuntime.sortBy(_.path).flatMap { d =>
      val base = GraftMorPartition(
        dataPath = d.path,
        dataSeq = d.sequenceNumber,
        posDeletes = posDeletesFor(d),
        dv = dvByData.get(ScanPlanner.normalizePath(d.path)),
        eqDeletes = eqFiles.filter { e =>
          // key-bounds skipping (metadata-only): a delete whose stamped
          // key range provably misses this file's rows never ships to
          // the task. ONLY when both files are current-schema — an
          // evolved table's names may alias across schema versions.
          e.sequenceNumber > d.sequenceNumber &&
            (!(snap.isCurrentSchema(e) && snap.isCurrentSchema(d)) ||
              ScanPruning.eqDeleteMayApply(e, d))
        }.map(e => EqDeleteSpec(e.path, e.sequenceNumber, keyColsFor(e),
            e.sizeBytes)),
        columnMap = columnMapFor(d),
        filters = taskFilters,
        defaultFill = defaultFillFor(d)
      )
      val splits = splitByRowGroups(base, layouts.getOrElse(d.path, Nil))
      spjKeys match {
        // stamp the typed key so Spark can group tasks by partition
        // value (the HasPartitionKey half of the KeyGrouped report)
        case Some((_, byPath)) =>
          splits.map(p => GraftMorKeyedPartition(p, byPath(d.path)): InputPartition)
        case None => splits.map(p => p: InputPartition)
      }
    }.toArray
  }

  /** Footer row-group layouts of the OVERSIZED files, fetched on a
    * bounded driver pool (the same object-store-round-trip rationale as
    * [[ParquetStats.minMaxLong]]); an unreadable footer maps to Nil and
    * the file stays one task. */
  private def rowGroupLayouts(
      files: Seq[FileEntry]): Map[String, Seq[(Long, Long, Long)]] = {
    val oversized = files.filter(_.sizeBytes > splitTargetBytes).map(_.path).distinct
    if (oversized.isEmpty) return Map.empty
    val pool = java.util.concurrent.Executors
      .newFixedThreadPool(math.min(16, oversized.size))
    try oversized.map { p =>
      p -> pool.submit(new java.util.concurrent.Callable[Seq[(Long, Long, Long)]] {
        override def call(): Seq[(Long, Long, Long)] =
          try ParquetStats.rowGroups(p) catch { case _: Exception => Nil }
      })
    }.map { case (p, f) =>
      p -> f.get(120, java.util.concurrent.TimeUnit.SECONDS)
    }.toMap
    finally pool.shutdownNow()
  }

  /** Split one file's partition into row-group-aligned byte ranges of
    * roughly `splitTargetBytes` each — a single oversized file's read
    * parallelism is the engine's decision, not one task. Chunk ranges
    * tile the file at row-group STARTING positions, so parquet's
    * midpoint rule assigns every group to exactly one chunk; base
    * ordinals come from the preceding groups' footer row counts. A file
    * under the threshold (or whose footer cannot be read) stays one
    * task. */
  private def splitByRowGroups(
      base: GraftMorPartition,
      groups: Seq[(Long, Long, Long)]): Seq[GraftMorPartition] = {
    if (groups.size <= 1) return Seq(base)
    // greedy pack consecutive groups up to the target
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Vector[(Long, Long, Long)]]
    var cur = Vector.empty[(Long, Long, Long)]
    var curBytes = 0L
    groups.foreach { g =>
      if (cur.nonEmpty && curBytes + g._2 > splitTargetBytes) {
        chunks += cur; cur = Vector.empty; curBytes = 0L
      }
      cur :+= g; curBytes += g._2
    }
    if (cur.nonEmpty) chunks += cur
    if (chunks.size <= 1) return Seq(base)
    var ordinal = 0L
    chunks.zipWithIndex.map { case (chunk, i) =>
      val start = if (i == 0) 0L else chunk.head._1
      val end =
        if (i == chunks.size - 1) Long.MaxValue
        else chunks(i + 1).head._1
      val rows = chunk.map(_._3).sum
      val p = base.copy(rangeStart = start, rangeEnd = end,
        baseOrdinal = ordinal, ordinalEnd = ordinal + rows)
      ordinal += rows
      p
    }.toSeq
  }

  /** Columnar is all-or-nothing per scan (Spark refuses mixed row/
    * columnar partitions), so the gate is scan-level and depends only
    * on TYPES: outputs always, plus the full table schema when any
    * equality delete exists (its key columns decode inside the batch
    * fill). Stable under runtime filtering — it only removes files. */
  private lazy val columnarOk: Boolean =
    vectorizedRead && GraftMorColumnarReader.supportedSchema(requiredSchema) &&
      (snap.files.forall(_.content != "equality-deletes") ||
        GraftMorColumnarReader.supportedSchema(tableSchema))

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftMorReaderFactory(requiredSchema, tableSchema, includeFileColumn,
      graft.io.FileIO.hadoopConfEntries(), includePosColumn, columnarOk)
}

final class GraftMorReaderFactory(
    requiredSchema: StructType, tableSchema: StructType,
    includeFileColumn: Boolean = false,
    confEntries: Array[(String, String)] = Array.empty,
    includePosColumn: Boolean = false,
    columnar: Boolean = false)
    extends PartitionReaderFactory {
  private def unwrap(partition: InputPartition): GraftMorPartition =
    partition match {
      case k: GraftMorKeyedPartition => k.inner
      case p => p.asInstanceOf[GraftMorPartition]
    }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = unwrap(partition)
    new GraftMorPartitionReader(p, requiredSchema, tableSchema, includeFileColumn,
      graft.io.FileIO.confFrom(confEntries), includePosColumn)
  }

  override def supportColumnarReads(partition: InputPartition): Boolean = columnar

  override def createColumnarReader(
      partition: InputPartition): PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val p = unwrap(partition)
    new GraftMorColumnarReader(p, requiredSchema, tableSchema, includeFileColumn,
      graft.io.FileIO.confFrom(confEntries), includePosColumn)
  }
}

/** Streams one data file, dropping rows dead under the task's deletes:
  * position ordinals collected for THIS file, equality keys per delete
  * file with `deleteSeq > dataSeq` (the J2 sequence rule). Null equality
  * keys never match (`===` join semantics on the DataFrame path). */
final class GraftMorPartitionReader(
    part: GraftMorPartition,
    requiredSchema: StructType,
    tableSchema: StructType,
    includeFileColumn: Boolean = false,
    taskConf: Configuration = new Configuration(),
    includePosColumn: Boolean = false
) extends PartitionReader[InternalRow] {
  import GraftBatchScan._

  private val deadPositions: GraftBatchScan.DeadPositions =
    GraftBatchScan.loadDeadPositions(part, taskConf)

  private val readTypes: Map[String, DataType] =
    tableSchema.fields.map(f => f.name -> f.dataType).toMap

  // initial-DEFAULT constants for columns this file predates, in the
  // reader's boxed representation — evaluated once per task, never per
  // row ([[graft.core.ColumnDefaults]])
  private val defaultJvm: Map[String, Any] =
    part.defaultFill.map { case (c, text) =>
      c -> graft.core.ColumnDefaults.jvmValue(text, readTypes(c))
    }

  private val eqKeySets: Seq[(Seq[String], java.util.HashSet[Seq[Any]])] =
    GraftBatchScan.loadEqKeySets(
      // a file keyed on a NULL-filled column it predates can never
      // match (the key would contain null) — skip its IO entirely; a
      // DEFAULT-filled column compares like a stored value, so its
      // deletes stay applicable
      part.eqDeletes.filter(_.keyCols.forall(kc =>
        part.columnMap.getOrElse(kc._1, Some(kc._1)).isDefined ||
          defaultJvm.contains(kc._1))),
      readTypes, taskConf)

  // columns to materialize = output ∪ equality keys (current names, in
  // table order); read from the file under their PHYSICAL names —
  // current columns the file predates are null, not read
  private val neededCurrent: Seq[String] = {
    val need = requiredSchema.fieldNames.toSet ++ eqKeySets.flatMap(_._1)
    tableSchema.fields.map(_.name).filter(need.contains).toSeq
  }
  private val physicalCols: Seq[String] =
    neededCurrent.flatMap(c => part.columnMap.getOrElse(c, None))
  private val outCols: Array[String] = requiredSchema.fieldNames

  private val range: Option[(Long, Long)] =
    if (part.rangeStart == 0L && part.rangeEnd == Long.MaxValue) None
    else Some((part.rangeStart, part.rangeEnd))

  private val reader: ParquetReader[Group] =
    if (physicalCols.isEmpty) {
      // nothing to materialize from this file (bare count, or every
      // needed column postdates it) — full rows, only ordinals consumed
      val b = ParquetReader.builder(new GroupReadSupport(), new HPath(part.dataPath))
        .withConf(new Configuration(taskConf))
      range.foreach { case (s, e) => b.withFileRange(s, e) }
      b.build()
    } else projectedReader(part.dataPath, physicalCols, taskConf, range)

  // running FILE-ABSOLUTE ordinal: a range split starts at the row
  // count of every preceding row group (position-delete semantics)
  private var pos: Long = part.baseOrdinal - 1L
  private var current: InternalRow = _
  private val filePathValue = UTF8String.fromString(part.dataPath)
  private val outLen = outCols.length + (if (includeFileColumn) 1 else 0) +
    (if (includePosColumn) 1 else 0)

  // per-output-column extractors, specialized ONCE against the file's
  // group type (every Group of one file shares it): hoists the
  // column-map/read-type/name→index lookups and type dispatch that
  // the old per-row lookup paid per VALUE out of the row loop. Columns the file
  // predates materialize their default (or null) as a constant.
  private var outExtract: Array[Group => Any] = _

  /** One equality-delete file's per-row probe, specialized once against
    * the file's group type: key components extract (pre-normalized via
    * [[GraftBatchScan.eqKeyExtractor]]) into a REUSED buffer wrapped by
    * a REUSED Seq view — zero per-row key-tuple allocation (the old
    * path built two Seqs and re-ran name→index + type dispatch per row
    * per delete file). The view's structural Seq equality/hash matches
    * the loaded set's List keys. */
  private final class EqProbe(extract: Array[Group => Any],
      set: java.util.HashSet[Seq[Any]]) {
    private val buf = new Array[Any](extract.length)
    private val view: scala.collection.Seq[Any] =
      scala.collection.mutable.ArraySeq.make(buf)
    /** true = the row SURVIVES this delete file. */
    def live(g: Group): Boolean = {
      var i = 0
      while (i < extract.length) {
        val v = extract(i)(g)
        if (v == null) return true // a null key component never matches
        buf(i) = v
        i += 1
      }
      !set.contains(view)
    }
  }
  private var eqProbes: Array[EqProbe] = _
  private def buildEqProbes(t: org.apache.parquet.schema.GroupType)
      : Array[EqProbe] =
    eqKeySets.map { case (cols, set) =>
      new EqProbe(cols.toArray.map { c =>
        part.columnMap.getOrElse(c, Some(c)) match {
          case None =>
            val v = defaultJvm.get(c)
              .map(GraftBatchScan.eqKeyComponent).orNull
            (_: Group) => v
          case Some(phys) =>
            GraftBatchScan.eqKeyExtractor(
              t, t.getFieldIndex(phys), readTypes(c), phys)
        }
      }, set)
    }.toArray
  private def buildOutExtract(t: org.apache.parquet.schema.GroupType)
      : Array[Group => Any] =
    outCols.map { c =>
      part.columnMap.getOrElse(c, Some(c)) match {
        case None =>
          val v = toCatalyst(defaultJvm.getOrElse(c, null))
          (_: Group) => v
        case Some(phys) =>
          GraftBatchScan.fieldExtractor(
            t, t.getFieldIndex(phys), readTypes(c), phys)
      }
    }

  override def next(): Boolean = {
    var g = reader.read()
    while (g != null) {
      pos += 1
      if (eqProbes == null) eqProbes = buildEqProbes(g.getType)
      if (!deadPositions.contains(pos) && liveUnderEqDeletes(g)) {
        if (outExtract == null) outExtract = buildOutExtract(g.getType)
        val vals = new Array[Any](outLen)
        var i = 0
        while (i < outCols.length) {
          vals(i) = outExtract(i)(g)
          i += 1
        }
        if (includeFileColumn) { vals(i) = filePathValue; i += 1 }
        if (includePosColumn) vals(i) = pos
        current =
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
        return true
      }
      g = reader.read()
    }
    false
  }

  private def liveUnderEqDeletes(g: Group): Boolean = {
    var i = 0
    while (i < eqProbes.length) {
      if (!eqProbes(i).live(g)) return false
      i += 1
    }
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
