package graft.io

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.util.zip.CRC32

import org.roaringbitmap.longlong.Roaring64Bitmap

/** Puffin deletion-vector files — the Iceberg v3 model for merge-on-read
  * position deletes.
  *
  * Rationale at 100 TB: a parquet position-delete file holds rows for
  * MANY data files and must be parsed wholesale (then filtered) by every
  * scan; targeting relies on footer `file_path` min/max ranges. A
  * deletion vector is a roaring bitmap of dead ordinals for EXACTLY ONE
  * data file, addressed from snapshot metadata by
  * `(puffin path, content offset, content size)` — a scan task does one
  * ranged read of its own blob, membership is O(1), and merging two
  * vectors is a bitmap OR instead of a parquet rewrite. The reference
  * consumes Iceberg tables whose delete model this follows
  * (`/root/reference/core/src/compaction/mod.rs:363-392` partitions
  * manifest entries by content kind).
  *
  * Layout follows the published Puffin + deletion-vector-v1 spec so the
  * files are inspectable by standard tooling:
  *
  * {{{
  *   "PFA1" | blob₀ | blob₁ | ... | "PFA1" footerJson size(4 LE) flags(4) "PFA1"
  * }}}
  *
  * Each `deletion-vector-v1` blob is framed as
  * `len(4 BE) | 0xD1D33964 | portable 64-bit roaring bitmap | crc32(4 BE)`
  * where `len` covers magic+bitmap and the CRC is computed over the same
  * bytes. The bitmap uses the portable little-endian serialization, so
  * any roaring implementation can decode it.
  */
object Puffin {

  private val Magic = Array[Byte]('P', 'F', 'A', '1')
  /** deletion-vector-v1 blob magic (spec bytes D1 D3 39 64). */
  private val DvMagic =
    Array[Byte](0xD1.toByte, 0xD3.toByte, 0x39.toByte, 0x64.toByte)

  val DvBlobType = "deletion-vector-v1"

  /** Snapshot-addressable location of one deletion vector. */
  final case class DvDescriptor(
      puffinPath: String,
      referencedDataFile: String,
      contentOffset: Long,
      contentSizeBytes: Long,
      cardinality: Long)

  /** One written container: its blob descriptors and total byte size
    * (known from the write itself — callers never need a stat call). */
  final case class PuffinFile(blobs: Seq[DvDescriptor], sizeBytes: Long)

  /** Serialize one bitmap in the portable little-endian format. */
  private def bitmapBytes(bm: Roaring64Bitmap): Array[Byte] = {
    bm.runOptimize()
    val size = bm.serializedSizeInBytes()
    require(size <= Int.MaxValue - 16,
      s"deletion vector too large to frame ($size bytes)")
    val buf = ByteBuffer.allocate(size.toInt).order(ByteOrder.LITTLE_ENDIAN)
    bm.serialize(buf)
    buf.array()
  }

  /** Write a Puffin file holding one deletion vector per referenced data
    * file. Returns the blob descriptors in input order. `dvs` must not
    * repeat a data file — one vector per file is the invariant the whole
    * design rests on (merge happens BEFORE writing, as a bitmap OR). */
  def writeDvFile(path: String,
      dvs: Seq[(String, Roaring64Bitmap)],
      conf: org.apache.hadoop.conf.Configuration = null): PuffinFile = {
    require(dvs.nonEmpty, "refusing to write an empty puffin file")
    require(dvs.map(_._1).distinct.size == dvs.size,
      "one deletion vector per data file: duplicate referenced paths")
    val out = new ByteArrayOutputStream()
    out.write(Magic)
    val descriptors = dvs.map { case (dataFile, bm) =>
      val body = bitmapBytes(bm)
      val offset = out.size().toLong
      val len = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
        .putInt(DvMagic.length + body.length).array()
      val crc = new CRC32()
      crc.update(DvMagic)
      crc.update(body)
      val crcBytes = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
        .putInt(crc.getValue.toInt).array()
      out.write(len); out.write(DvMagic); out.write(body); out.write(crcBytes)
      DvDescriptor(path, dataFile, offset, out.size().toLong - offset,
        bm.getLongCardinality)
    }
    // footer: magic, JSON payload, payload size (4 LE), flags (4), magic
    val payload = footerJson(descriptors).getBytes(StandardCharsets.UTF_8)
    out.write(Magic)
    out.write(payload)
    out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(payload.length).array())
    out.write(Array[Byte](0, 0, 0, 0))
    out.write(Magic)
    val bytes = out.toByteArray
    FileIO.writeBytes(path, bytes, conf)
    PuffinFile(descriptors, bytes.length.toLong)
  }

  val NdvBlobType = "graft-ndv-v1"

  /** One column's NDV statistics blob (the shape Iceberg's
    * `apache-datasketches-theta-v1` blobs use: the estimate rides the
    * blob's `ndv` property, readable without decoding the body; the
    * body here is the estimate as 8 bytes big-endian). */
  final case class NdvBlob(fieldId: Int, column: String, ndv: Long)

  /** A written statistics file: spec-shaped `blob-metadata` JSON plus
    * the sizes the `statistics` metadata entry needs. */
  final case class StatsFile(path: String, sizeBytes: Long,
      footerSizeBytes: Long, blobMetadataJson: String)

  /** Write an Iceberg-spec statistics Puffin file: one NDV blob per
    * analyzed column. Returns everything a `statistics` metadata entry
    * needs ([[graft.txn.IcebergTableCatalog]] emits it). */
  /** JSON string escaping shared by every footer writer here. */
  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def writeStatsFile(path: String, snapshotId: Long, sequenceNumber: Long,
      blobs: Seq[NdvBlob],
      conf: org.apache.hadoop.conf.Configuration = null): StatsFile = {
    require(blobs.nonEmpty, "refusing to write an empty statistics file")
    val out = new ByteArrayOutputStream()
    out.write(Magic)
    val metas = blobs.map { b =>
      val offset = out.size().toLong
      out.write(ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN)
        .putLong(b.ndv).array())
      s"""{"type":"$NdvBlobType","fields":[${b.fieldId}],""" +
        s""""snapshot-id":$snapshotId,"sequence-number":$sequenceNumber,""" +
        s""""offset":$offset,"length":8,"properties":{""" +
        s""""ndv":"${b.ndv}","column":"${esc(b.column)}"}}"""
    }
    val payload =
      (s"""{"blobs":[${metas.mkString(",")}],""" +
        s""""properties":{"created-by":"graft"}}""")
        .getBytes(StandardCharsets.UTF_8)
    val footerStart = out.size()
    out.write(Magic)
    out.write(payload)
    out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(payload.length).array())
    out.write(Array[Byte](0, 0, 0, 0))
    out.write(Magic)
    val bytes = out.toByteArray
    FileIO.writeBytes(path, bytes, conf)
    StatsFile(path, bytes.length.toLong,
      (bytes.length - footerStart).toLong, s"[${metas.mkString(",")}]")
  }

  private def footerJson(ds: Seq[DvDescriptor]): String = {
    val blobs = ds.map { d =>
      s"""{"type":"$DvBlobType","fields":[],"snapshot-id":-1,""" +
        s""""sequence-number":-1,"offset":${d.contentOffset},""" +
        s""""length":${d.contentSizeBytes},"properties":{""" +
        s""""referenced-data-file":"${esc(d.referencedDataFile)}",""" +
        s""""cardinality":"${d.cardinality}"}}"""
    }.mkString(",")
    s"""{"blobs":[$blobs],"properties":{"created-by":"graft"}}"""
  }

  /** Read ONE deletion-vector blob by its snapshot-recorded address —
    * a single ranged read of `contentSizeBytes`, frame-checked (length,
    * magic, CRC) so a torn or misaddressed read fails loudly instead of
    * silently resurrecting rows. */
  def readDvBlob(puffinPath: String, contentOffset: Long,
      contentSizeBytes: Long,
      conf: org.apache.hadoop.conf.Configuration = null): Roaring64Bitmap = {
    require(contentSizeBytes >= 12 && contentSizeBytes <= Int.MaxValue,
      s"implausible deletion-vector blob size $contentSizeBytes")
    decodeDvBlob(
      FileIO.readBytesRange(puffinPath, contentOffset,
        contentSizeBytes.toInt, conf),
      s"$puffinPath@$contentOffset")
  }

  /** Decode one framed deletion-vector blob (see [[readDvBlob]] for the
    * IO wrapper). Split out so callers can cache the immutable raw
    * bytes per JVM and deserialize a task-local bitmap per consumer —
    * roaring bitmaps are not safe for concurrent probing. */
  def decodeDvBlob(raw: Array[Byte], context: String): Roaring64Bitmap = {
    if (raw.length < 12)
      throw graft.core.CompactionError.Io(
        s"deletion-vector blob at $context too short (${raw.length} bytes)")
    val buf = ByteBuffer.wrap(raw).order(ByteOrder.BIG_ENDIAN)
    val declared = buf.getInt()
    if (declared != raw.length - 8)
      throw graft.core.CompactionError.Io(
        s"deletion-vector frame mismatch at $context: " +
          s"declared $declared bytes, blob holds ${raw.length - 8}")
    val magic = new Array[Byte](4); buf.get(magic)
    if (!java.util.Arrays.equals(magic, DvMagic))
      throw graft.core.CompactionError.Io(
        s"not a deletion-vector blob at $context")
    val body = new Array[Byte](raw.length - 12); buf.get(body)
    val crc = new CRC32()
    crc.update(DvMagic); crc.update(body)
    if (buf.getInt() != crc.getValue.toInt)
      throw graft.core.CompactionError.Io(
        s"deletion-vector CRC mismatch at $context")
    val bm = new Roaring64Bitmap()
    bm.deserialize(ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN))
    bm
  }

  /** Parse a Puffin file's own footer back into blob descriptors —
    * inspection/repair surface (the read path never needs it: blob
    * addresses live in snapshot metadata). */
  def readFooter(path: String): Seq[DvDescriptor] = {
    val total = FileIO.fileLength(path)
    require(total >= 20, s"$path too small to be a puffin file")
    val tail = FileIO.readBytesRange(path, total - 12, 12)
    val tbuf = ByteBuffer.wrap(tail).order(ByteOrder.LITTLE_ENDIAN)
    val payloadSize = tbuf.getInt()
    require(java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(tail, 8, 12), Magic),
      s"$path does not end with the puffin magic")
    val payload = new String(
      FileIO.readBytesRange(path, total - 12 - payloadSize, payloadSize),
      StandardCharsets.UTF_8)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(payload)
    val blobs = root.path("blobs")
    (0 until blobs.size()).map { i =>
      val b = blobs.get(i)
      DvDescriptor(
        puffinPath = path,
        referencedDataFile =
          b.path("properties").path("referenced-data-file").asText(""),
        contentOffset = b.path("offset").asLong(),
        contentSizeBytes = b.path("length").asLong(),
        cardinality =
          b.path("properties").path("cardinality").asText("-1").toLong)
    }
  }
}
