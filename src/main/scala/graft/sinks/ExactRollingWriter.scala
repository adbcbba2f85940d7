package graft.sinks

import graft.core.DataFileMeta
import graft.operators.RollingPolicy
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Type, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Byte-exact rolling parquet writer — the runtime realization of the
  * reference's W2 policy (rolling_iceberg_writer.rs:26-132), which the
  * declarative [[RollingWriter]] can only approximate via
  * `maxRecordsPerFile`:
  *
  * each Spark write task streams its partition through a parquet writer,
  * and before every `batchRows`-row batch applies
  * [[RollingPolicy.needBuildNewFile]] to (current writer bytes, estimated
  * incoming bytes, target) — closing the file and opening the next when
  * the ported predicate fires. The incoming-size estimate is a running
  * bytes-per-row average of what this writer has already absorbed
  * (seeded at 256 B/row), mirroring the reference's use of the incoming
  * batch's byte size.
  *
  * Parallelism is one writer chain per partition (reference X4: one
  * writer per output stream). Scope: flat schemas (the engine's table
  * model); a real deployment wraps the output in the commit protocol
  * ([[graft.txn.CommitManager]]), which this writer leaves untouched.
  *
  * Commit safety (the part Spark's own committer would otherwise do):
  * each task ATTEMPT writes into its own `_attempt-<taskAttemptId>/`
  * subdirectory and returns the metadata of the files it wrote; the
  * driver receives exactly ONE surviving attempt per partition from
  * Spark, renames only those files into `outDir`, and deletes every
  * attempt directory. A failed-then-retried or speculative attempt can
  * therefore never leak orphan files into the committed set — the result
  * is the returned file list, never a directory listing.
  */
object ExactRollingWriter {

  def write(
      df: DataFrame,
      outDir: String,
      targetFileSizeBytes: Long,
      compression: String = "snappy",
      batchRows: Int = 1024,
      sequenceNumber: Long = 0L,
      /** Parquet bloom filters to emit per output file
        * ([[graft.core.BloomColumns]]) — compaction preserves the
        * table's configured point-lookup blooms through rewrites. */
      bloomColumns: Seq[graft.core.BloomColumns.Spec] = Nil
  ): Seq[DataFileMeta] = {
    val schema = df.schema
    schema.fields.foreach { f =>
      require(supportedType(f.dataType),
        s"ExactRollingWriter supports primitive and array/struct/map columns; " +
          s"${f.name}: ${f.dataType} is not")
    }
    graft.io.FileIO.mkdirs(outDir)
    val codec = CompressionCodecName.valueOf(compression.toUpperCase)
    // ship the driver's hadoop conf entries to the write tasks
    // (FileIO.hadoopConfEntries scaladoc explains why a bare
    // Configuration in the executor breaks non-local dirs)
    val confEntries: Array[(String, String)] = graft.io.FileIO.hadoopConfEntries()

    // one element per partition: the winning attempt's (path, rowCount)s.
    // The partition stream is the UNSAFE row representation
    // (queryExecution.toRdd): no Tungsten -> external-Row deserialization,
    // no per-field boxing — rows stay in Spark's binary format until the
    // parquet writer consumes each field. Buffered rows are copy()-ed
    // (one array copy per UnsafeRow) because the iterator reuses its row.
    val perTask: Array[Seq[(String, Long)]] =
      df.queryExecution.toRdd.mapPartitions { rows =>
        val tc = TaskContext.get()
        val pid = tc.partitionId()
        val attemptDir = s"$outDir/_attempt-${tc.taskAttemptId()}"
        val taskConf = graft.io.FileIO.confFrom(confEntries)
        val message = toMessageType(schema)
        val factory = new SimpleGroupFactory(message)
        val files = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
        var fileIdx = 0
        var curPath: String = null
        var writer: ParquetWriter[Group] = null
        var rowsInWriter = 0L

        def newWriter(): Unit = {
          curPath = s"$attemptDir/part-$pid-$fileIdx.parquet"
          val conf = new Configuration(taskConf)
          conf.set("parquet.example.schema", message.toString)
          writer = GraftBatchWrite.applyBloom(
            ExampleParquetWriter.builder(new HPath(curPath))
              .withConf(conf)
              .withCompressionCodec(codec)
              .withWriteMode(org.apache.parquet.hadoop.ParquetFileWriter.Mode.OVERWRITE),
            bloomColumns, schema.fieldNames.toSet)
            .build()
          rowsInWriter = 0L
          fileIdx += 1
        }
        def close(): Unit = if (writer != null) {
          writer.close()
          files += ((curPath, rowsInWriter))
          writer = null
        }

        val batch = new Array[InternalRow](batchRows)
        var bytesPerRow = 256.0
        while (rows.hasNext) {
          var n = 0
          while (n < batchRows && rows.hasNext) { batch(n) = rows.next().copy(); n += 1 }
          val estIncoming = (bytesPerRow * n).toLong
          if (writer == null) newWriter()
          else if (RollingPolicy.needBuildNewFile(
              writer.getDataSize, estIncoming, targetFileSizeBytes)) {
            close(); newWriter()
          }
          val before = writer.getDataSize
          var i = 0
          while (i < n) { writer.write(rowToGroup(factory, schema, batch(i))); i += 1 }
          rowsInWriter += n
          // refine the running bytes-per-row estimate from observed growth
          val grew = writer.getDataSize - before
          if (grew > 0 && n > 0)
            bytesPerRow = 0.5 * bytesPerRow + 0.5 * (grew.toDouble / n)
        }
        close()
        Iterator.single(files.toSeq)
      }.collect()

    // publish the winners under stable names; drop every attempt dir
    // (losing/speculative attempts' files die here, unreferenced)
    import graft.io.FileIO
    val metas = perTask.flatten.map { case (attemptPath, rowCount) =>
      val name = attemptPath.substring(attemptPath.lastIndexOf('/') + 1)
      val target = s"$outDir/$name"
      if (!FileIO.rename(attemptPath, target))
        throw graft.core.CompactionError.Io(
          s"failed to publish $attemptPath -> $target")
      DataFileMeta(target, FileIO.fileLength(target), rowCount, sequenceNumber)
    }
    FileIO.listDirectories(outDir)
      .filter(p => p.substring(p.lastIndexOf('/') + 1).startsWith("_attempt-"))
      .foreach(FileIO.deleteRecursive)
    metas.sortBy(_.filePath).toSeq
  }

  /** Type support of the engine's table model (shared with the DSv2
    * batch writer's up-front schema validation): the primitive lattice
    * plus ARRAY/STRUCT/MAP compositions of it (standard parquet 3-level
    * LIST and MAP group encodings). Nested columns ride the row read
    * path — [[graft.sources.GraftColumnarReader.supportedSchema]] gates
    * them off the vectorized fill, and scans with nested output fall
    * back per scan. */
  private[graft] def supportedType(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | FloatType | StringType |
         BooleanType | TimestampType | TimestampNTZType | DateType |
         BinaryType => true
    case _: DecimalType => true
    case ArrayType(et, _) => supportedType(et)
    case MapType(kt, vt, _) => supportedType(kt) && supportedType(vt)
    case StructType(fields) => fields.forall(f => supportedType(f.dataType))
    case _ => false
  }

  /** Smallest FIXED_LEN_BYTE_ARRAY length that can hold any two's-
    * complement unscaled value of `precision` digits (the parquet spec's
    * sizing rule for FLBA-backed decimals). Precomputed — the lookup
    * sits on the per-row write path. */
  private val MinBytesByPrecision: Array[Int] =
    (0 to 38).map { p =>
      var bytes = 1
      // max unscaled magnitude is 10^p - 1; a signed n-byte field holds
      // magnitudes below 2^(8n-1)
      while (math.pow(2.0, 8.0 * bytes - 1) < math.pow(10.0, p.toDouble))
        bytes += 1
      bytes
    }.toArray

  private[graft] def minBytesForPrecision(precision: Int): Int =
    MinBytesByPrecision(precision)

  private[graft] def toMessageType(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach(f => b.addField(toParquetType(f.name, f.dataType, f.nullable)))
    b.named("graft_row")
  }

  /** One column's parquet type. Nested compositions use the spec's
    * standard group shapes — 3-level LIST (`group (LIST) { repeated
    * group list { element } }`), MAP (`group (MAP) { repeated group
    * key_value { required key; value } }`), and plain groups for
    * structs — the encodings every modern parquet reader (Spark's own
    * vectorized one included) resolves. */
  private def toParquetType(name: String, dt: DataType, nullable: Boolean): Type = {
    val rep = if (nullable) Type.Repetition.OPTIONAL else Type.Repetition.REQUIRED
    dt match {
      case LongType => Types.primitive(PrimitiveTypeName.INT64, rep).named(name)
      case IntegerType => Types.primitive(PrimitiveTypeName.INT32, rep).named(name)
      case DoubleType => Types.primitive(PrimitiveTypeName.DOUBLE, rep).named(name)
      case FloatType => Types.primitive(PrimitiveTypeName.FLOAT, rep).named(name)
      case BooleanType => Types.primitive(PrimitiveTypeName.BOOLEAN, rep).named(name)
      case BinaryType => Types.primitive(PrimitiveTypeName.BINARY, rep).named(name)
      case StringType => Types.primitive(PrimitiveTypeName.BINARY, rep)
        .as(LogicalTypeAnnotation.stringType()).named(name)
      case TimestampType => Types.primitive(PrimitiveTypeName.INT64, rep)
        .as(LogicalTypeAnnotation.timestampType(true,
          LogicalTypeAnnotation.TimeUnit.MICROS)).named(name)
      case TimestampNTZType => Types.primitive(PrimitiveTypeName.INT64, rep)
        .as(LogicalTypeAnnotation.timestampType(false,
          LogicalTypeAnnotation.TimeUnit.MICROS)).named(name)
      case DateType => Types.primitive(PrimitiveTypeName.INT32, rep)
        .as(LogicalTypeAnnotation.dateType()).named(name)
      // parquet's decimal physical ladder: INT32 to 9 digits, INT64 to
      // 18, two's-complement FLBA beyond — what every Iceberg/Spark
      // reader expects for each precision band
      case d: DecimalType if d.precision <= 9 =>
        Types.primitive(PrimitiveTypeName.INT32, rep)
          .as(LogicalTypeAnnotation.decimalType(d.scale, d.precision))
          .named(name)
      case d: DecimalType if d.precision <= 18 =>
        Types.primitive(PrimitiveTypeName.INT64, rep)
          .as(LogicalTypeAnnotation.decimalType(d.scale, d.precision))
          .named(name)
      case d: DecimalType =>
        Types.primitive(PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY, rep)
          .length(minBytesForPrecision(d.precision))
          .as(LogicalTypeAnnotation.decimalType(d.scale, d.precision))
          .named(name)
      case ArrayType(et, containsNull) =>
        Types.buildGroup(rep).as(LogicalTypeAnnotation.listType())
          .addField(Types.repeatedGroup()
            .addField(toParquetType("element", et, containsNull))
            .named("list"))
          .named(name)
      case MapType(kt, vt, valueContainsNull) =>
        Types.buildGroup(rep).as(LogicalTypeAnnotation.mapType())
          .addField(Types.repeatedGroup()
            .addField(toParquetType("key", kt, nullable = false))
            .addField(toParquetType("value", vt, valueContainsNull))
            .named("key_value"))
          .named(name)
      case StructType(fields) =>
        val g = Types.buildGroup(rep)
        fields.foreach(f => g.addField(toParquetType(f.name, f.dataType, f.nullable)))
        g.named(name)
      case other => throw new IllegalArgumentException(s"unsupported: $other")
    }
  }

  /** InternalRow field access: primitives read straight from the unsafe
    * format; timestamps are ALREADY epoch-micros longs internally (both
    * tz and ntz), so the write needs no java.sql/LocalDateTime object
    * round-trip at all. Nested values recurse through
    * [[org.apache.spark.sql.catalyst.expressions.SpecializedGetters]] —
    * the accessor interface InternalRow and ArrayData share — so
    * array/struct/map levels add group nesting without ever surfacing
    * external Row objects. */
  private[graft] def rowToGroup(factory: SimpleGroupFactory, schema: StructType, row: InternalRow): Group = {
    val g = factory.newGroup()
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) addField(g, i, schema(i).dataType, row, i)
      i += 1
    }
    g
  }

  import org.apache.spark.sql.catalyst.expressions.SpecializedGetters
  import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}

  /** Append `src(ord)` (non-null) to group field `idx`. Group-typed
    * fields (LIST/MAP/struct) append a child group and recurse; a null
    * nested ELEMENT simply skips its optional leaf (repetition count 0,
    * exactly how parquet encodes a null at any nesting depth).
    *
    * Field access is POSITIONAL: [[toMessageType]] builds every group
    * level in schema declaration order (LIST wraps a single `list`
    * group whose element is field 0; MAP a single `key_value` group
    * with key=0/value=1), so each ordinal is known statically and the
    * name→index string lookup `Group.add(name, ...)` performs stays off
    * the per-value path. Strings append their UTF-8 bytes directly
    * (UTF8String is already UTF-8) — no decode-to-String/re-encode
    * round-trip per value; identical bytes on disk. */
  private def addField(g: Group, idx: Int, dt: DataType,
      src: SpecializedGetters, ord: Int): Unit = dt match {
    case LongType => g.add(idx, src.getLong(ord))
    case IntegerType => g.add(idx, src.getInt(ord))
    case DoubleType => g.add(idx, src.getDouble(ord))
    case FloatType => g.add(idx, src.getFloat(ord))
    case BooleanType => g.add(idx, src.getBoolean(ord))
    case StringType => g.add(idx,
      // fromREUSED, not fromConstant: getBytes returns the SHARED
      // backing array when the UTF8String exactly wraps one, and
      // parquet's dictionary writer retains Binary references until
      // page flush — the reused form copies before caching (Spark's own
      // ParquetWriteSupport does the same for exactly this reason)
      org.apache.parquet.io.api.Binary.fromReusedByteArray(
        src.getUTF8String(ord).getBytes))
    case BinaryType => g.add(idx,
      // same dictionary-retention hazard as StringType above: a generic
      // row can hand back its stored (reusable) array — copy-on-cache
      org.apache.parquet.io.api.Binary.fromReusedByteArray(src.getBinary(ord)))
    case TimestampType | TimestampNTZType => g.add(idx, src.getLong(ord))
    case DateType => g.add(idx, src.getInt(ord))
    case d: DecimalType =>
      val dec = src.getDecimal(ord, d.precision, d.scale)
      if (d.precision <= 9) g.add(idx, dec.toUnscaledLong.toInt)
      else if (d.precision <= 18) g.add(idx, dec.toUnscaledLong)
      else {
        // sign-extend the two's-complement unscaled value to the
        // declared FLBA width
        val width = minBytesForPrecision(d.precision)
        val raw = dec.toJavaBigDecimal.unscaledValue().toByteArray
        val out = new Array[Byte](width)
        val pad: Byte = if (raw(0) < 0) -1 else 0
        java.util.Arrays.fill(out, 0, width - raw.length, pad)
        System.arraycopy(raw, 0, out, width - raw.length, raw.length)
        g.add(idx,
          org.apache.parquet.io.api.Binary.fromConstantByteArray(out))
      }
    case ArrayType(et, _) =>
      val lg = g.addGroup(idx)
      val arr: ArrayData = src.getArray(ord)
      var i = 0
      while (i < arr.numElements()) {
        val entry = lg.addGroup(0) // the single repeated `list` group
        if (!arr.isNullAt(i)) addField(entry, 0, et, arr, i)
        i += 1
      }
    case MapType(kt, vt, _) =>
      val mg = g.addGroup(idx)
      val m: MapData = src.getMap(ord)
      val keys = m.keyArray(); val vals = m.valueArray()
      var i = 0
      while (i < m.numElements()) {
        val kv = mg.addGroup(0) // the single repeated `key_value` group
        addField(kv, 0, kt, keys, i) // map keys are never null in Spark
        if (!vals.isNullAt(i)) addField(kv, 1, vt, vals, i)
        i += 1
      }
    case st: StructType =>
      val sg = g.addGroup(idx)
      val child = src.getStruct(ord, st.length)
      var i = 0
      while (i < st.length) {
        if (!child.isNullAt(i)) addField(sg, i, st(i).dataType, child, i)
        i += 1
      }
    case other => throw new IllegalArgumentException(s"unsupported: $other")
  }
}
