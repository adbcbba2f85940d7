package graft.core

/** KMV (k-minimum-values) distinct-count sketch for WRITE-TIME NDV
  * stamps — the one per-column statistic a parquet footer cannot
  * provide. Each row-level writer keeps the K smallest distinct
  * unsigned xxHash64 values per eligible column and serializes them
  * into [[graft.txn.FileEntry.ndvSketch]]; at plan time the sketches
  * of the CURRENT data files merge (union, keep K smallest) into a
  * table NDV estimate that SURVIVES APPENDS — unlike analyze_table's
  * exact counts, which any file change invalidates
  * ([[graft.txn.TableAnalyze]]).
  *
  * Accuracy: rsd ~ 1/sqrt(K) ~ 9% at K=128 — coarse but the right
  * trade for a per-file stamp (~1 KB/column vs ~16 KB for a 1%-rsd
  * HLL, and the snapshot carries one stamp per file per column).
  * Sub-K merged sketches are EXACT (they hold every distinct hash).
  *
  * Why KMV over HLL here: trivially mergeable (set union), exact below
  * K, and the serialized form is plain sorted longs — no register
  * encoding to version.
  *
  * Soundness rule for serving (see [[graft.txn.TableAnalyze
  * .sketchNdv]]): a sketch describes its FILE's contents, so the merge
  * equals the live NDV only while no delete file hides rows — any
  * delete present, or any unsketched data file, disables the estimate
  * entirely rather than serving a wrong one.
  */
object NdvSketch {

  /** Sketch size: K smallest distinct hashes per column. */
  val K = 128
  /** Seed shared with Spark's `xxhash64` expression, so a SQL-side
    * producer (`xxhash64(cast(c AS BIGINT))`) hashes identically. */
  val Seed = 42L

  import org.apache.spark.sql.catalyst.expressions.XXH64

  def hashLong(v: Long): Long = XXH64.hashLong(v, Seed)
  def hashBytes(b: Array[Byte]): Long =
    XXH64.hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
      b.length, Seed)

  /** Streaming accumulator: K smallest DISTINCT hashes, unsigned order. */
  final class Acc {
    private val set = new java.util.TreeSet[java.lang.Long](
      (a: java.lang.Long, b: java.lang.Long) =>
        java.lang.Long.compareUnsigned(a, b))

    def add(hash: Long): Unit = {
      if (set.size < K) { set.add(hash); () }
      else if (java.lang.Long.compareUnsigned(hash, set.last()) < 0) {
        if (set.add(hash)) { set.pollLast(); () }
      }
    }

    def serialize: String = NdvSketch.serialize(
      set.toArray(Array.empty[java.lang.Long]).map(_.longValue))
  }

  /** Base64 of big-endian longs in unsigned ascending order. */
  def serialize(sorted: Array[Long]): String = {
    val bb = java.nio.ByteBuffer.allocate(sorted.length * 8)
    sorted.foreach(bb.putLong)
    java.util.Base64.getEncoder.encodeToString(bb.array())
  }

  def deserialize(b64: String): Array[Long] = {
    val bytes = java.util.Base64.getDecoder.decode(b64)
    // a payload that is not whole longs is CORRUPT — reject it so the
    // estimate disables ("malformed must disable, never skew"), rather
    // than silently dropping the tail and undercounting
    if (bytes.length % 8 != 0)
      throw new IllegalArgumentException(
        s"ndv sketch payload of ${bytes.length} bytes is not whole longs")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  private def unsignedToDouble(h: Long): Double =
    if (h >= 0) h.toDouble else h.toDouble + 1.8446744073709552e19

  private def mergeSets(sketches: Seq[String]): java.util.TreeSet[java.lang.Long] = {
    val merged = new java.util.TreeSet[java.lang.Long](
      (a: java.lang.Long, b: java.lang.Long) =>
        java.lang.Long.compareUnsigned(a, b))
    sketches.foreach(s => deserialize(s).foreach { h =>
      if (merged.size < K) { merged.add(h); () }
      else if (java.lang.Long.compareUnsigned(h, merged.last()) < 0) {
        if (merged.add(h)) { merged.pollLast(); () }
      }
    })
    merged
  }

  /** Union-merge serialized sketches into ONE serialized sketch (union
    * of the hash sets, keep the K smallest) — the associative combine
    * that lets partial sketches of one file's row subsets collapse to
    * the file's sketch. Throws on malformed input (callers that merge
    * partials of files they just wrote WANT the loud failure; the
    * read-side [[estimate]] stays lenient). */
  def merge(sketches: Seq[String]): String =
    serialize(mergeSets(sketches)
      .toArray(Array.empty[java.lang.Long]).map(_.longValue))

  /** Merge sketches (union of hash sets, keep the K smallest) and
    * estimate the distinct count: exact when fewer than K distinct
    * hashes survive, else the KMV estimator
    * `(K-1) / fraction-of-hash-space-below-the-Kth-min`. None for
    * malformed input (a sketch that fails to decode must disable the
    * estimate, never skew it). */
  def estimate(sketches: Seq[String]): Option[Long] = {
    try {
      val merged = mergeSets(sketches)
      if (merged.size < K) Some(merged.size.toLong)
      else {
        val kth = unsignedToDouble(merged.last())
        if (kth <= 0) None
        else Some(math.max(K.toLong,
          ((K - 1).toDouble * 1.8446744073709552e19 / kth).toLong))
      }
    } catch { case _: IllegalArgumentException => None }
  }

  /** Columns eligible for write-time sketching, and the canonical hash
    * of one value: integral/date values hash as their LONG form
    * (`xxhash64(cast(c AS BIGINT))`-compatible), strings as their
    * UTF-8 bytes (`xxhash64(c)`-compatible). Other types are skipped —
    * no sketch beats a sketch with producer-dependent hashing. */
  def eligible(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType | IntegerType | ShortType | ByteType | DateType |
           TimestampType | TimestampNTZType | StringType => true
      case _ => false
    }
  }

  /** Canonical hash of the NON-NULL value at `ord` — the single ladder
    * every sketch producer must share (a sketch merged across producers
    * with different hashing would double-count every value). Timestamps
    * hash their internal epoch-micros long; date its internal day int
    * widened to long. Only call for [[eligible]] types. */
  def hashAt(dt: org.apache.spark.sql.types.DataType,
      row: org.apache.spark.sql.catalyst.expressions.SpecializedGetters,
      ord: Int): Long = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType | TimestampType | TimestampNTZType => hashLong(row.getLong(ord))
      case IntegerType | DateType => hashLong(row.getInt(ord).toLong)
      case ShortType => hashLong(row.getShort(ord).toLong)
      case ByteType => hashLong(row.getByte(ord).toLong)
      case StringType => hashBytes(row.getUTF8String(ord).getBytes)
      case other => throw new IllegalArgumentException(
        s"not sketch-eligible: $other")
    }
  }

  /** [[sketchFiles]] result: the eligible columns that were sketched
    * (a file absent from `byPath` had no rows or only nulls in them —
    * its sketch for every listed column is legitimately EMPTY), and the
    * per-file sketches keyed by Spark's `input_file_name` spelling. */
  final case class FileSketches(columns: Seq[String],
      byPath: Map[String, Map[String, String]])

  /** Distributed POST-HOC sketch pass over already-written parquet
    * files: one Spark job reading ONLY the sketch-eligible columns,
    * returning per-file per-column serialized sketches keyed by the
    * path Spark reports for each row (`input_file_name` form — callers
    * normalize before matching their own path spellings).
    *
    * This is the write path for producers that cannot accumulate
    * inline — the declarative compaction writers hand the rows to
    * Spark's own parquet sink ([[graft.sinks.RollingWriter]]), so the
    * sketch has to come from a second, column-pruned read of the
    * output. Cost on a 100 TB rewrite is bounded by the eligible
    * columns' bytes and parallelizes like any scan; callers gate it on
    * the table actually having sketch coverage to preserve
    * ([[graft.compaction.Compaction]]). A file split across several
    * tasks yields partial sketches that [[merge]] collapses (KMV union
    * is exact). */
  def sketchFiles(spark: org.apache.spark.sql.SparkSession,
      paths: Seq[String]): FileSketches = {
    import org.apache.spark.sql.functions.{col, input_file_name}
    if (paths.isEmpty) return FileSketches(Nil, Map.empty)
    val all = spark.read.parquet(paths: _*)
    val slots = all.schema.fields.filter(f => eligible(f.dataType)).toSeq
    if (slots.isEmpty) return FileSketches(Nil, Map.empty)
    val df = all.select(
      input_file_name() +: slots.map(f => col(s"`${f.name}`")): _*)
    val types = slots.map(_.dataType).toArray
    val names = slots.map(_.name).toArray
    val partials = df.queryExecution.toRdd.mapPartitions { rows =>
      val accs = scala.collection.mutable.HashMap.empty[(String, Int), Acc]
      rows.foreach { row =>
        val path = row.getUTF8String(0).toString
        var i = 0
        while (i < types.length) {
          if (!row.isNullAt(i + 1))
            accs.getOrElseUpdate((path, i), new Acc)
              .add(hashAt(types(i), row, i + 1))
          i += 1
        }
      }
      accs.iterator.map { case (k, acc) => (k, acc.serialize) }
    }.collect()
    FileSketches(names.toSeq,
      partials.groupBy(_._1._1).map { case (path, entries) =>
        path -> entries.groupBy(_._1._2).map { case (ci, ps) =>
          names(ci) -> merge(ps.map(_._2).toSeq)
        }
      })
  }
}
