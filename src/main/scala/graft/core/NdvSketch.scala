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

  /** Merge sketches (union of hash sets, keep the K smallest) and
    * estimate the distinct count: exact when fewer than K distinct
    * hashes survive, else the KMV estimator
    * `(K-1) / fraction-of-hash-space-below-the-Kth-min`. None for
    * malformed input (a sketch that fails to decode must disable the
    * estimate, never skew it). */
  def estimate(sketches: Seq[String]): Option[Long] = {
    try {
      val merged = new java.util.TreeSet[java.lang.Long](
        (a: java.lang.Long, b: java.lang.Long) =>
          java.lang.Long.compareUnsigned(a, b))
      sketches.foreach(s => deserialize(s).foreach { h =>
        if (merged.size < K) { merged.add(h); () }
        else if (java.lang.Long.compareUnsigned(h, merged.last()) < 0) {
          if (merged.add(h)) { merged.pollLast(); () }
        }
      })
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
}
