package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Partition-spec transforms for fanout writes — reference S8 computes
  * partition values from the Iceberg `PartitionSpec` rather than raw
  * columns (FanoutPartitionWriterBuilder,
  * core/src/executor/datafusion/mod.rs:157-169). The Iceberg transform
  * set: identity / bucket(n) / truncate(w) / day.
  *
  * Bucket hashing: Iceberg specifies murmur3-x86-32 over the value's byte
  * form; this engine derives the bucket from its oracle-replayable 60-bit
  * md5 hash instead (same distribution shape, replayable bit-for-bit by
  * any engine with md5 — the property every oracle-checked query here
  * relies on). A deployment that must interoperate with real Iceberg
  * readers swaps `BucketTransform.expr` for the murmur3 form.
  */
sealed trait PartitionTransform {
  /** Source user column the partition value derives from. */
  def source: String
  /** Partition field name (the directory key, mirrored as `__p_<name>`). */
  def fieldName: String
  /** Partition-value expression; `dt` is the source column's type. */
  def expr(dt: DataType): Column
  /** Row-level twin of [[expr]] for the DSv2 fanout writer (executors
    * see InternalRows, not Columns). MUST stay bit-identical to the
    * Column form — PartitionTransformSpec cross-checks them. Takes the
    * JVM-boxed value (Long/Int/String/…, null passthrough). */
  def eval(v: Any, dt: DataType): Any
  /** Human/path form of an [[eval]] output — MUST match how Spark's
    * partitionBy renders the [[expr]] output in directory names, so the
    * DSv2 name prefix and the compaction directory layout parse to the
    * same strings (partition pruning compares them). */
  def render(pv: Any): String = PartitionKey.renderValue(pv)
}

object PartitionTransform {
  /** 60-bit md5-derived hash, identical to the pipeline's
    * `TextFunctions.hash64` semantics: first 15 hex digits of
    * md5("<seed>:<s>"). */
  private[core] def hash60(seed: String, s: Column): Column =
    conv(substr(md5(concat(lit(seed), lit(":"), s.cast("string"))), lit(1), lit(15)), 16, 10)
      .cast("long")

  /** Convenience: identity transforms over raw column names. */
  def identity(cols: Seq[String]): Seq[PartitionTransform] =
    cols.map(IdentityTransform)

  /** Row-level twin of [[hash60]]: md5 over the same "<seed>:<s>"
    * string, first 15 hex digits as a base-16 long (60 bits). */
  private[core] def hash60Jvm(seed: String, s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$seed:$s".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Spark CAST-to-string semantics for the types bucketing supports
    * (integrals render as decimal digits — identical to JVM toString). */
  private[core] def castString(v: Any): String = v match {
    case s: String => s
    case other     => other.toString
  }
}

/** Raw column value. */
final case class IdentityTransform(source: String) extends PartitionTransform {
  override def fieldName: String = source
  override def expr(dt: DataType): Column = col(source)
  override def eval(v: Any, dt: DataType): Any =
    if (v == null) null
    else dt match {
      // DATE values arrive as Catalyst epoch-day ints; normalize to the
      // ISO string Spark renders in partitionBy directories, so the
      // DSv2 fanout names, the compaction layout, and pruning all
      // compute the SAME rendered value for one date
      case DateType =>
        java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString
      case _ => v
    }
}

/** Hash-bucket into `n` buckets (0 until n). */
final case class BucketTransform(n: Int, source: String) extends PartitionTransform {
  require(n > 0, "bucket count must be positive")
  override def fieldName: String = s"${source}_bucket"
  override def expr(dt: DataType): Column =
    pmod(PartitionTransform.hash60("bkt", col(source)), lit(n.toLong)).cast("int")
  override def eval(v: Any, dt: DataType): Any =
    if (v == null) null
    else {
      // expr() hashes cast(col AS STRING): a DATE casts to its ISO form
      // there, so the JVM twin must hash the SAME string — hashing the
      // raw epoch-day int would bucket rows differently than the
      // compaction layout's expression
      val s = dt match {
        case DateType =>
          java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString
        case _ => PartitionTransform.castString(v)
      }
      val h = PartitionTransform.hash60Jvm("bkt", s)
      (((h % n) + n) % n).toInt
    }
}

/** Truncate: integers floor to a multiple of `width` (Iceberg
  * `v - (((v % W) + W) % W)`, correct for negatives); strings keep the
  * first `width` characters. */
final case class TruncateTransform(width: Int, source: String) extends PartitionTransform {
  require(width > 0, "truncate width must be positive")
  override def fieldName: String = s"${source}_trunc"
  override def expr(dt: DataType): Column = dt match {
    case StringType => substring(col(source), 1, width)
    case ByteType | ShortType | IntegerType | LongType =>
      (col(source) - pmod(col(source), lit(width.toLong))).cast(dt)
    case other =>
      throw CompactionError.Config(s"truncate($width) unsupported for type $other")
  }
  override def eval(v: Any, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case StringType =>
        // Spark's substring counts CODE POINTS; String.take counts
        // UTF-16 units and would split supplementary characters
        val s = v.asInstanceOf[String]
        val cp = math.min(width, s.codePointCount(0, s.length))
        s.substring(0, s.offsetByCodePoints(0, cp))
      case LongType =>
        val x = v.asInstanceOf[Long]; x - (((x % width) + width) % width)
      case IntegerType =>
        val x = v.asInstanceOf[Int]; x - (((x % width) + width) % width)
      case other =>
        throw CompactionError.Config(s"truncate($width) unsupported for type $other")
    }
}

/** Calendar day of a timestamp/date column. */
final case class DayTransform(source: String) extends PartitionTransform {
  override def fieldName: String = s"${source}_day"
  override def expr(dt: DataType): Column = dt match {
    case DateType | TimestampType | TimestampNTZType => to_date(col(source))
    case other =>
      throw CompactionError.Config(s"day transform unsupported for type $other")
  }
  /** Catalyst values: timestamps are UTC micros, dates epoch days. The
    * engine pins spark.sql.session.timeZone=UTC, so the epoch-day floor
    * matches to_date bit-for-bit. */
  override def eval(v: Any, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case DateType => v
      case TimestampType | TimestampNTZType =>
        java.lang.Math.floorDiv(v.asInstanceOf[Long], 86400000000L).toInt
      case other =>
        throw CompactionError.Config(s"day transform unsupported for type $other")
    }
  override def render(pv: Any): String =
    if (pv == null) "null"
    else java.time.LocalDate.ofEpochDay(pv.asInstanceOf[Int].toLong).toString
}

/** Compact string form of a partition spec, carried as the
  * `graft.partition-spec` snapshot property (no table-model change;
  * spec-legal unknown property under the Iceberg-format catalog). */
object PartitionSpecCodec {
  val Property = "graft.partition-spec"
  /** Current spec's id (absent = 0, the table's first spec). */
  val IdProperty = "graft.partition-spec-id"
  /** Spec HISTORY after an evolution: `<id>=<encoded spec>` fragments
    * joined by ';' — every spec ever current, by id, so pruning can
    * resolve each file's own layout ([[graft.txn.FileEntry.specId]]).
    * Absent until the first [[graft.txn.CommitManager.evolvePartitionSpec]]. */
  val HistoryProperty = "graft.partition-specs"

  /** The table's CURRENT partition spec as carried by its snapshot (Nil
    * when unpartitioned) — the decode every writer shares; new files
    * always lay out under this spec. */
  def of(snap: Option[graft.txn.TableSnapshot]): Seq[PartitionTransform] =
    snap.flatMap(_.properties.get(Property)).map(decode).getOrElse(Nil)

  def currentId(snap: Option[graft.txn.TableSnapshot]): Long =
    snap.flatMap(_.properties.get(IdProperty)).map(_.toLong).getOrElse(0L)

  /** Every spec ever current, by id. Without a history (never-evolved
    * table) this is just {0 -> current}. */
  def history(snap: Option[graft.txn.TableSnapshot]): Map[Long, Seq[PartitionTransform]] =
    snap.flatMap(_.properties.get(HistoryProperty)) match {
      case Some(h) => decodeHistory(h)
      case None    => Map(0L -> of(snap))
    }

  /** Per-file spec resolution for pruning: the file's own spec when a
    * history exists (unknown/unstamped ids resolve to spec 0 — the
    * only spec such files can predate), else the table's single spec. */
  def specForFile(snap: Option[graft.txn.TableSnapshot])
      : graft.txn.FileEntry => Seq[PartitionTransform] = {
    val hasHistory = snap.exists(_.properties.contains(HistoryProperty))
    if (!hasHistory) { val cur = of(snap); _ => cur }
    else {
      val byId = history(snap)
      f => byId.getOrElse(math.max(f.specId, 0L), Nil)
    }
  }

  def encodeHistory(h: Map[Long, Seq[PartitionTransform]]): String =
    h.toSeq.sortBy(_._1).map { case (id, s) => s"$id=${encode(s)}" }.mkString(";")

  def decodeHistory(s: String): Map[Long, Seq[PartitionTransform]] =
    s.split(';').toIndexedSeq.filter(_.nonEmpty).map { frag =>
      val eq = frag.indexOf('=')
      if (eq <= 0) throw CompactionError.Config(
        s"bad partition-spec history fragment '$frag'")
      frag.take(eq).toLong -> decode(frag.drop(eq + 1))
    }.toMap

  def encode(ts: Seq[PartitionTransform]): String = ts.map {
    case IdentityTransform(c)    => s"identity:$c"
    case BucketTransform(n, c)   => s"bucket:$n:$c"
    case TruncateTransform(w, c) => s"truncate:$w:$c"
    case DayTransform(c)         => s"day:$c"
  }.mkString("|")

  def decode(s: String): Seq[PartitionTransform] =
    s.split('|').toIndexedSeq.filter(_.nonEmpty).map { part =>
      part.split(':') match {
        case Array("identity", c)    => IdentityTransform(c)
        case Array("bucket", n, c)   => BucketTransform(n.toInt, c)
        case Array("truncate", w, c) => TruncateTransform(w.toInt, c)
        case Array("day", c)         => DayTransform(c)
        case other => throw CompactionError.Config(
          s"bad partition-spec fragment '${other.mkString(":")}'")
      }
    }
}

/** Shared rendering of partition keys between the fanout writer (file
  * NAME prefix, e.g. `region=EU,id_bucket=3.part-0-0.parquet`) and the
  * scan-side partition pruning that parses it back. One field is
  * `<fieldName>=<sanitized value>`; fields join with ',' — the
  * sanitizer maps ',' (and anything else exotic) to '_', so the
  * separators are unambiguous. */
object PartitionKey {
  def sanitize(s: String): String =
    s.map(c => if (c.isLetterOrDigit || c == '=' || c == '_' || c == '.' ||
      c == '-') c else '_')

  def renderValue(v: Any): String =
    Option(v).map(String.valueOf).getOrElse("null")

  def field(t: PartitionTransform, partitionValue: Any): String =
    s"${t.fieldName}=${sanitize(t.render(partitionValue))}"

  def key(fields: Seq[String]): String = fields.mkString(",")

  /** Parse a data file's partition fields — from the fanout NAME prefix
    * (`region=EU,id_bucket=3.part-…`, the DSv2 writer) and from
    * `__p_<field>=<v>` DIRECTORY segments (the compaction fanout
    * writer's Spark partitionBy layout). Empty map for files without
    * either (pre-partitioning appends) — callers must treat empty as
    * "unknown, keep". */
  def parse(path: String): Map[String, String] = {
    val segs = path.split('/')
    val dirFields = segs.dropRight(1).toIndexedSeq.flatMap { s =>
      val eq = s.indexOf('=')
      if (eq <= 4 || !s.startsWith("__p_")) None
      else {
        // Spark URL-escapes special chars in partition dirs; normalize
        // through our sanitizer so both layouts compare equal
        val raw = try {
          org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .unescapePathName(s.substring(eq + 1))
        } catch { case _: Exception => s.substring(eq + 1) }
        Some(s.substring(4, eq) -> sanitize(raw))
      }
    }
    // streaming epochs publish as `e<epoch>-…` and the fanout writer
    // stamps a per-writer generation `g<n>-…` — strip both markers so
    // the first field parses cleanly
    val name = segs.last
      .replaceFirst("^e\\d+-", "")
      .replaceFirst("^g\\d+-", "")
    // LAST occurrence: a sanitized partition VALUE may itself contain
    // '.part-'; the writer's suffix is always the final one
    val cut = name.lastIndexOf(".part-")
    val nameFields =
      if (cut <= 0) Nil
      else name.substring(0, cut).split(',').toIndexedSeq.flatMap { f =>
        val eq = f.indexOf('=')
        if (eq <= 0) None else Some(f.substring(0, eq) -> f.substring(eq + 1))
      }
    (dirFields ++ nameFields).toMap
  }
}
