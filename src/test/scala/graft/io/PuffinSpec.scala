package graft.io

import org.roaringbitmap.longlong.Roaring64Bitmap
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Puffin deletion-vector container: blob framing, CRC integrity, footer
  * self-description, and the snapshot-addressed ranged read. */
class PuffinSpec extends AnyFunSuite {

  private def bitmap(longs: Long*): Roaring64Bitmap = {
    val bm = new Roaring64Bitmap()
    longs.foreach(bm.addLong)
    bm
  }

  private def tmp(name: String): String =
    Files.createTempDirectory("puffin").resolve(name).toString

  test("single-blob roundtrip by snapshot address") {
    val path = tmp("one.puffin")
    val bm = bitmap(0L, 1L, 7L, 4096L, 1L << 33)
    val written = Puffin.writeDvFile(path, Seq("/data/a.parquet" -> bm))
    assert(written.blobs.size == 1)
    val d = written.blobs.head
    assert(d.referencedDataFile == "/data/a.parquet")
    assert(d.cardinality == 5L)
    assert(written.sizeBytes == FileIO.fileLength(path))
    val back = Puffin.readDvBlob(path, d.contentOffset, d.contentSizeBytes)
    assert(back.getLongCardinality == 5L)
    Seq(0L, 1L, 7L, 4096L, 1L << 33).foreach(p => assert(back.contains(p)))
    assert(!back.contains(2L) && !back.contains(4095L))
  }

  test("multi-blob container: blobs address independently, footer lists all") {
    val path = tmp("multi.puffin")
    val written = Puffin.writeDvFile(path, Seq(
      "/data/a.parquet" -> bitmap(1L, 2L, 3L),
      "/data/b.parquet" -> bitmap(100L),
      "/data/c.parquet" -> bitmap(0L, 999999L)))
    assert(written.blobs.size == 3)
    written.blobs.zip(Seq(3L, 1L, 2L)).foreach { case (d, card) =>
      assert(d.cardinality == card)
      assert(Puffin.readDvBlob(path, d.contentOffset, d.contentSizeBytes)
        .getLongCardinality == card)
    }
    // the container's own footer reproduces the descriptors
    val footer = Puffin.readFooter(path)
    assert(footer.map(d => (d.referencedDataFile, d.contentOffset,
      d.contentSizeBytes, d.cardinality)) ==
      written.blobs.map(d => (d.referencedDataFile, d.contentOffset,
        d.contentSizeBytes, d.cardinality)))
  }

  test("dense runs stay compact (run-optimized serialization)") {
    val path = tmp("dense.puffin")
    val bm = new Roaring64Bitmap()
    bm.addRange(0L, 1000000L)
    val written = Puffin.writeDvFile(path, Seq("/data/d.parquet" -> bm))
    // a dense million-row delete must cost bytes, not 16 B/row — this is
    // the core scale argument for vectors over (path, pos) parquet rows
    assert(written.sizeBytes < 10000,
      s"dense bitmap serialized to ${written.sizeBytes} bytes")
    val back = Puffin.readDvBlob(path,
      written.blobs.head.contentOffset, written.blobs.head.contentSizeBytes)
    assert(back.getLongCardinality == 1000000L)
  }

  test("corruption fails loudly: CRC, magic, and frame length") {
    val path = tmp("corrupt.puffin")
    val written = Puffin.writeDvFile(path, Seq("/data/a.parquet" -> bitmap(1L, 2L)))
    val d = written.blobs.head
    val raw = FileIO.readBytesRange(path, 0, written.sizeBytes.toInt)
    // flip one bitmap byte -> CRC mismatch
    val crcBroken = raw.clone()
    crcBroken(d.contentOffset.toInt + 9) = (crcBroken(d.contentOffset.toInt + 9) ^ 0x7f).toByte
    FileIO.writeBytes(path, crcBroken)
    val e1 = intercept[graft.core.CompactionError.Io] {
      Puffin.readDvBlob(path, d.contentOffset, d.contentSizeBytes)
    }
    assert(e1.getMessage.contains("CRC"))
    // break the magic
    val magicBroken = raw.clone()
    magicBroken(d.contentOffset.toInt + 4) = 0
    FileIO.writeBytes(path, magicBroken)
    assert(intercept[graft.core.CompactionError.Io] {
      Puffin.readDvBlob(path, d.contentOffset, d.contentSizeBytes)
    }.getMessage.contains("not a deletion-vector"))
    // a misaddressed (short) read must not decode
    FileIO.writeBytes(path, raw)
    assert(intercept[graft.core.CompactionError.Io] {
      Puffin.readDvBlob(path, d.contentOffset, d.contentSizeBytes - 4)
    }.getMessage.contains("frame mismatch"))
  }

  test("invariants: no empty container, no duplicate referenced file") {
    intercept[IllegalArgumentException] {
      Puffin.writeDvFile(tmp("e.puffin"), Nil)
    }
    intercept[IllegalArgumentException] {
      Puffin.writeDvFile(tmp("d.puffin"), Seq(
        "/data/a.parquet" -> bitmap(1L), "/data/a.parquet" -> bitmap(2L)))
    }
  }
}
