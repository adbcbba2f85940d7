package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed batch-wise per partition.
  *
  * The Spark-side shape is real and tested — schema, partitioning, batch
  * iteration via `mapPartitions` over a typed Dataset (the Scala analog of
  * `mapInPandas` batch processing). All three modalities decode for
  * real with JDK-shipped parts: image via `javax.imageio`
  * ([[decodeImageIO]]), audio via `javax.sound.sampled` ([[decodeWav]]),
  * and video via an MJPEG-in-AVI RIFF walk whose frames are JDK JPEG
  * decodes ([[decodeMjpegAvi]] — the JDK has no inter-frame codec, but
  * MJPEG is intra-frame-only and needs none). [[stubDecode]] and the
  * GIMG/GVID container ops remain as clearly-labeled byte-arithmetic
  * fixtures for the generic feature-extraction plumbing.
  *
  * Scale design: payloads stay columnar parquet binary; decode is a
  * narrow per-partition pass (no shuffle); `spark.sql.files.
  * maxPartitionBytes` bounds executor memory per batch; feature outputs
  * are small fixed-width columns so downstream shuffles never carry the
  * raw bytes.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      source: String)

  /** Extracted features (decode output). */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Long,
      digest: String,
      /** stub "decoded" feature vector — deterministic from the payload */
      feature: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("source", StringType, nullable = true)))

  /** STUB decoder — deterministic fake standing in for a codec call
    * (??? in a real deployment: e.g. JPEG decode + resize + embed).
    * Derives an 8-dim feature from payload bytes so tests are exact. */
  def stubDecode(payload: Array[Byte]): Array[Float] = {
    if (payload == null || payload.isEmpty) return Array.fill(8)(0.0f)
    val acc = new Array[Long](8)
    var i = 0
    while (i < payload.length) {
      acc(i % 8) += (payload(i) & 0xff)
      i += 1
    }
    acc.map(a => (a % 1000).toFloat / 1000.0f)
  }

  /** Batch feature extraction: one pass per partition, preserving Spark's
    * batch shape (iterator-in, iterator-out — no per-row task overhead). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        md.reset()
        val digest = if (r.payload == null) ""
          else md.digest(r.payload).map("%02x".format(_)).mkString
        MediaFeatures(
          media_id = r.media_id,
          kind = r.kind,
          byte_len = if (r.payload == null) 0L else r.payload.length.toLong,
          digest = digest,
          feature = stubDecode(r.payload))
      }
    }
  }

  /** Decoded image container output. */
  final case class DecodedMedia(
      doc_id: Long,
      width: Int,
      height: Int,
      n_pixels: Long,
      checksum: Long)

  /** Container-format decode over a GENUINE BinaryType column at the
    * `mapPartitions` codec boundary: parses a fake-image container
    * (magic "GIMG" ‖ uint16-BE width ‖ uint16-BE height ‖ pixel bytes)
    * byte-by-byte — the same boundary where a real JPEG/PNG decode
    * would sit (that codec call is the stub: this container IS decoded
    * for real, bytes to fields). Malformed payloads fail loudly rather
    * than producing silent garbage features.
    *
    * Scale: narrow per-partition pass, no shuffle; raw bytes never
    * cross a stage boundary — only the small fixed-width decode output
    * does. */
  def decodeImages(media: Dataset[(Long, Array[Byte])]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { case (id, bytes) =>
        require(bytes != null && bytes.length >= 8,
          s"media $id: payload too short (${if (bytes == null) -1 else bytes.length})")
        require(bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'M' && bytes(3) == 'G',
          s"media $id: bad container magic")
        val w = ((bytes(4) & 0xff) << 8) | (bytes(5) & 0xff)
        val h = ((bytes(6) & 0xff) << 8) | (bytes(7) & 0xff)
        var sum = 0L
        var i = 8
        while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
        DecodedMedia(id, w, h, (bytes.length - 8).toLong, sum)
      }
    }
  }

  /** Half-scale resize output. */
  final case class ResizedMedia(
      doc_id: Long,
      out_w: Int,
      out_h: Int,
      n_pixels: Long,
      checksum: Long)

  /** Nearest-neighbor HALF-SCALE resize at the codec boundary — the
    * transform stage of a real media pipeline (decode → resize → embed):
    * parses the same GIMG container as [[decodeImages]], then samples
    * every second pixel in each axis (out(x', y') = in(2x', 2y'),
    * out dims = ceil(in/2) — exactly nearest-neighbor for factor 2).
    * The pixel arithmetic is integer byte math, so any engine replays
    * the checksum bit-for-bit. Same scale shape as decode: narrow
    * per-partition pass, raw bytes never cross a stage boundary, only
    * the small fixed-width resize summary does. */
  def resizeNearestHalf(media: Dataset[(Long, Array[Byte])]): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { case (id, bytes) =>
        require(bytes != null && bytes.length >= 8,
          s"media $id: payload too short (${if (bytes == null) -1 else bytes.length})")
        require(bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'M' && bytes(3) == 'G',
          s"media $id: bad container magic")
        val w = ((bytes(4) & 0xff) << 8) | (bytes(5) & 0xff)
        val h = ((bytes(6) & 0xff) << 8) | (bytes(7) & 0xff)
        require(bytes.length - 8 == w * h,
          s"media $id: truncated pixel payload (${bytes.length - 8} of ${w * h})")
        val (ow, oh) = ((w + 1) / 2, (h + 1) / 2)
        var sum = 0L
        var y = 0
        while (y < oh) {
          var x = 0
          while (x < ow) {
            sum += bytes(8 + (2 * y) * w + 2 * x) & 0xff
            x += 1
          }
          y += 1
        }
        ResizedMedia(id, ow, oh, ow.toLong * oh, sum)
      }
    }
  }

  /** Frame-sampling output. */
  final case class SampledFrames(
      doc_id: Long,
      n_frames: Int,
      n_sampled: Long,
      checksum: Long)

  /** VIDEO frame sampling at the codec boundary — the "every k-th
    * frame" decimation a video-training pipeline runs before embedding:
    * parses a fake-video container (magic "GVID" ‖ uint16-BE frame
    * count ‖ uint16-BE bytes-per-frame ‖ frames back-to-back) and sums
    * ONLY the sampled frames' bytes, so the checksum certifies the
    * exact frame-boundary arithmetic (which bytes belong to frame f).
    * Narrow per-partition pass; the raw frames never leave the task. */
  def sampleFrames(media: Dataset[(Long, Array[Byte])],
      every: Int): Dataset[SampledFrames] = {
    require(every > 0, s"sampling stride must be positive, got $every")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { case (id, bytes) =>
        require(bytes != null && bytes.length >= 8,
          s"media $id: payload too short (${if (bytes == null) -1 else bytes.length})")
        require(bytes(0) == 'G' && bytes(1) == 'V' && bytes(2) == 'I' && bytes(3) == 'D',
          s"media $id: bad container magic")
        val nFrames = ((bytes(4) & 0xff) << 8) | (bytes(5) & 0xff)
        val frameBytes = ((bytes(6) & 0xff) << 8) | (bytes(7) & 0xff)
        require(bytes.length - 8 == nFrames * frameBytes,
          s"media $id: truncated frames (${bytes.length - 8} of ${nFrames * frameBytes})")
        var sum = 0L
        var sampled = 0L
        var f = 0
        while (f < nFrames) {
          var j = 0
          while (j < frameBytes) {
            sum += bytes(8 + f * frameBytes + j) & 0xff
            j += 1
          }
          sampled += 1
          f += every
        }
        SampledFrames(id, nFrames, sampled, sum)
      }
    }
  }

  /** Real-decode output: dimensions + exact per-channel pixel sums. */
  final case class ImageFeatures(
      doc_id: Long,
      width: Int,
      height: Int,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long)

  /** REAL image decode — `javax.imageio` (in the JDK, no new
    * dependency: PNG/BMP/GIF/JPEG readers ship with every JVM) at the
    * same `mapPartitions` codec boundary the GIMG container ops sit at.
    * This replaces the stub for `kind=image`: actual compressed image
    * bytes in, decoded pixels out, features derived with exact integer
    * arithmetic (dimensions + per-channel sums) so any engine that can
    * reproduce the pixels replays the output bit-for-bit. PNG/BMP are
    * lossless, so a PNG round-trip certifies the decode exactly; the
    * audio/video stubs remain honestly labeled stubs (no codecs in the
    * JDK for those).
    *
    * Scale shape unchanged from the stub path: narrow per-partition
    * pass, no shuffle, compressed bytes never cross a stage boundary —
    * only the fixed-width feature row does. A malformed payload fails
    * loudly (ImageIO returns null → require), never silent garbage. */
  /** The one ImageIO decode call + loud-failure guards both image ops
    * share (a payload ImageIO cannot parse returns null — surfaced as
    * an error, never silent garbage features). */
  private def decodeOrThrow(id: Long, bytes: Array[Byte])
      : java.awt.image.BufferedImage = {
    require(bytes != null && bytes.nonEmpty, s"media $id: empty payload")
    imageIoNoDiskCache
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"media $id: payload is not a decodable image")
    img
  }

  /** ImageIO's default stream cache spools EVERY `ImageIO.read`/`write`
    * on an in-memory stream through a temp FILE on disk (a
    * FileCache(Image)InputStream per call) — tens of thousands of file
    * creates/deletes per media pass for payloads that are already byte
    * arrays. Disabling it (idempotent) keeps the cache in heap; decoded
    * output is bit-identical. NOTE: the flip is JVM-GLOBAL — every
    * ImageIO caller in the process (user UDFs, other libraries) loses
    * the disk-backed stream cache too; that only matters for streams
    * too large for heap, which this engine never feeds ImageIO.
    * Referenced at the head of every codec closure so executors flip it
    * before their first decode. */
  private[graft] lazy val imageIoNoDiskCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Per-channel byte sums of a bulk-`getRGB` pixel row block — the
    * same default-sRGB ints the per-pixel `getRGB(x, y)` form returns
    * (the bulk form is specified as its batched equivalent), summed
    * without a ColorModel dispatch per pixel. */
  private def sumRgb(px: Array[Int], sums: Array[Long]): Unit = {
    var i = 0
    while (i < px.length) {
      val rgb = px(i)
      sums(0) += (rgb >> 16) & 0xff
      sums(1) += (rgb >> 8) & 0xff
      sums(2) += rgb & 0xff
      i += 1
    }
  }

  def decodeImageIO(media: Dataset[(Long, Array[Byte])]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { case (id, bytes) =>
        val img = decodeOrThrow(id, bytes)
        val w = img.getWidth
        val h = img.getHeight
        val sums = new Array[Long](3)
        sumRgb(img.getRGB(0, 0, w, h, null, 0, w), sums)
        ImageFeatures(id, w, h, sums(0), sums(1), sums(2))
      }
    }
  }

  /** Real decode→resize output: output dims + per-channel sums of the
    * half-scaled image. */
  final case class ResizedImageFeatures(
      doc_id: Long,
      out_w: Int,
      out_h: Int,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long)

  /** REAL decode → resize composition: decode compressed image bytes
    * with `javax.imageio` ([[decodeImageIO]]'s codec), then
    * nearest-neighbor half-scale ON THE DECODED PIXELS
    * (out(x', y') = in(2x', 2y'), out dims = ceil(in/2) — the exact
    * integer sampling [[resizeNearestHalf]] runs on container bytes,
    * here on real codec output). Features are the resized image's dims
    * + per-channel sums, so a hash match certifies WHICH decoded pixels
    * the sampler picked. Same scale shape: narrow per-partition pass,
    * compressed bytes never cross a stage. */
  def resizeImageIO(media: Dataset[(Long, Array[Byte])]): Dataset[ResizedImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { case (id, bytes) =>
        val img = decodeOrThrow(id, bytes)
        val iw = img.getWidth
        val ow = (iw + 1) / 2
        val oh = (img.getHeight + 1) / 2
        // one bulk fetch, then stride (2x, 2y) — the identical sample
        // set the per-pixel getRGB(2x, 2y) loop read
        val px = img.getRGB(0, 0, iw, img.getHeight, null, 0, iw)
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < oh) {
          val row = 2 * y * iw
          var x = 0
          while (x < ow) {
            val rgb = px(row + 2 * x)
            sr += (rgb >> 16) & 0xff
            sg += (rgb >> 8) & 0xff
            sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        ResizedImageFeatures(id, ow, oh, sr, sg, sb)
      }
    }
  }

  /** Real-audio decode output: format + exact per-channel sample sums. */
  final case class AudioFeatures(
      doc_id: Long,
      channels: Int,
      n_frames: Long,
      sum_ch0: Long,
      sum_ch1: Long)

  /** REAL audio decode — `javax.sound.sampled` (in the JDK, no new
    * dependency: the WAVE/AIFF/AU container readers ship with every
    * JVM) at the same `mapPartitions` codec boundary as
    * [[decodeImageIO]]. This replaces the stub for `kind=audio`:
    * actual RIFF/WAVE container bytes in, PCM frames out through the
    * JDK's AudioSystem parser, features derived with exact integer
    * arithmetic (channel count, frame count, per-channel signed-sample
    * sums). PCM16 is lossless, so a WAV round-trip certifies the
    * decode exactly; video stays an honestly-labeled stub (the JDK
    * ships no video codec).
    *
    * Scale shape unchanged from the image path: narrow per-partition
    * pass, no shuffle, audio bytes never cross a stage boundary — only
    * the fixed-width feature row does. Malformed or non-PCM16 payloads
    * fail loudly, never silent garbage features. */
  def decodeWav(media: Dataset[(Long, Array[Byte])]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { case (id, bytes) =>
        require(bytes != null && bytes.nonEmpty, s"media $id: empty payload")
        val ais =
          try javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          catch {
            case e: javax.sound.sampled.UnsupportedAudioFileException =>
              throw new IllegalArgumentException(
                s"media $id: payload is not a decodable audio container", e)
          }
        val fmt = ais.getFormat
        require(fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16,
          s"media $id: expected 16-bit signed PCM, got $fmt")
        val ch = fmt.getChannels
        val frameSize = fmt.getFrameSize
        val data = ais.readAllBytes()
        require(frameSize == 2 * ch && data.length % frameSize == 0,
          s"media $id: torn frame (${data.length} data bytes, " +
            s"frame size $frameSize, $ch channels)")
        val sums = new Array[Long](ch)
        var i = 0
        while (i < data.length) {
          var c = 0
          while (c < ch) {
            val o = i + 2 * c
            val s =
              if (fmt.isBigEndian) ((data(o) << 8) | (data(o + 1) & 0xff)).toShort
              else ((data(o + 1) << 8) | (data(o) & 0xff)).toShort
            sums(c) += s
            c += 1
          }
          i += frameSize
        }
        AudioFeatures(id, ch, (data.length / frameSize).toLong, sums(0),
          if (ch > 1) sums(1) else 0L)
      }
    }
  }

  /** Real-video decode output: frame count, dimensions, per-channel
    * pixel sums over ALL decoded frames. */
  final case class VideoFeatures(
      doc_id: Long,
      n_frames: Int,
      width: Int,
      height: Int,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long)

  // ---- MJPEG-in-AVI: a real RIFF container around real JPEG frames.
  // AVI is Microsoft's RIFF form (public spec: the 'AVI ' form holds a
  // 'hdrl' LIST with the avih main header and one 'strl' per stream,
  // then a 'movi' LIST whose '##dc' chunks carry one compressed frame
  // each — for the MJPG handler, a complete JFIF/JPEG image). The JDK
  // ships no video *codec*, but MJPEG needs none: the container walk is
  // plain byte parsing and every frame is a javax.imageio JPEG. ----

  private def le32(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def rdLe32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private def fourCC(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Serialize pre-encoded JPEG frames as a REAL AVI file: RIFF('AVI ')
    * ‖ LIST(hdrl){avih, LIST(strl){strh 'vids'/'MJPG', strf
    * BITMAPINFOHEADER}} ‖ LIST(movi){'00dc' frame…}, little-endian
    * sizes, odd chunks padded per the RIFF word-alignment rule. The
    * output opens in any AVI-aware player/demuxer — the fixture
    * generator for [[decodeMjpegAvi]] and a real writer in its own
    * right. */
  def writeMjpegAvi(jpegFrames: Seq[Array[Byte]], width: Int,
      height: Int, fps: Int = 25): Array[Byte] = {
    require(jpegFrames.nonEmpty, "an AVI needs at least one frame")
    val out = new java.io.ByteArrayOutputStream()
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(id.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      b.write(le32(data.length))
      b.write(data)
      if ((data.length & 1) == 1) b.write(0) // RIFF pad to word boundary
      b.toByteArray
    }
    def list(listType: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST",
        listType.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ body)
    val maxFrame = jpegFrames.map(_.length).max
    val avih = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(le32(1000000 / fps)) // dwMicroSecPerFrame
      b.write(le32(maxFrame * fps)) // dwMaxBytesPerSec
      b.write(le32(0)) // dwPaddingGranularity
      b.write(le32(0x10)) // dwFlags: AVIF_HASINDEX off, interleaved off
      b.write(le32(jpegFrames.length)) // dwTotalFrames
      b.write(le32(0)) // dwInitialFrames
      b.write(le32(1)) // dwStreams
      b.write(le32(maxFrame)) // dwSuggestedBufferSize
      b.write(le32(width)); b.write(le32(height))
      for (_ <- 0 until 4) b.write(le32(0)) // dwReserved
      chunk("avih", b.toByteArray)
    }
    val strh = {
      val b = new java.io.ByteArrayOutputStream()
      b.write("vids".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      b.write("MJPG".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      b.write(le32(0)) // dwFlags
      b.write(le32(0)) // wPriority + wLanguage
      b.write(le32(0)) // dwInitialFrames
      b.write(le32(1)) // dwScale
      b.write(le32(fps)) // dwRate (fps = rate/scale)
      b.write(le32(0)) // dwStart
      b.write(le32(jpegFrames.length)) // dwLength (frames)
      b.write(le32(maxFrame)) // dwSuggestedBufferSize
      b.write(le32(-1)) // dwQuality (default)
      b.write(le32(0)) // dwSampleSize (0 = varying)
      b.write(le32(0)); b.write(le32(width << 16 | height)) // rcFrame
      chunk("strh", b.toByteArray)
    }
    val strf = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(le32(40)) // biSize
      b.write(le32(width)); b.write(le32(height))
      b.write(le32(1 | (24 << 16))) // biPlanes=1, biBitCount=24
      b.write("MJPG".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      b.write(le32(width * height * 3)) // biSizeImage
      b.write(le32(0)); b.write(le32(0)) // pels per meter
      b.write(le32(0)); b.write(le32(0)) // clr used/important
      chunk("strf", b.toByteArray)
    }
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi",
      jpegFrames.toArray.flatMap(f => chunk("00dc", f)))
    val form = "AVI ".getBytes(
      java.nio.charset.StandardCharsets.US_ASCII) ++ hdrl ++ movi
    out.write("RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.write(le32(form.length))
    out.write(form)
    out.toByteArray
  }

  /** REAL video decode — MJPEG-in-AVI, pure JDK: walk the RIFF
    * container (form check, hdrl's avih main header, the movi LIST's
    * '##dc'/'##db' frame chunks) and decode EVERY frame's JPEG bytes
    * with `javax.imageio` at the same `mapPartitions` codec boundary
    * as [[decodeImageIO]]. This closes the last multimodal stub: the
    * JDK ships no inter-frame video codec, but MJPEG — the format
    * capture pipelines and many cameras emit — is intra-frame-only and
    * fully decodable with shipped parts. Features are the frame count
    * (cross-checked against the avih header — a torn container fails
    * loudly), the frame dimensions (required uniform across frames),
    * and per-channel pixel sums over all decoded frames, exact integer
    * arithmetic end to end.
    *
    * Scale shape unchanged from the image/audio paths: narrow
    * per-partition pass, no shuffle, compressed bytes never cross a
    * stage boundary — only the fixed-width feature row does. Malformed
    * containers, non-JPEG frames, and header/stream frame-count
    * disagreement all fail loudly, never silent garbage. */
  def decodeMjpegAvi(media: Dataset[(Long, Array[Byte])]): Dataset[VideoFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { case (id, bytes) =>
        imageIoNoDiskCache
        require(bytes != null && bytes.length >= 12, s"media $id: payload too short")
        require(fourCC(bytes, 0) == "RIFF" && fourCC(bytes, 8) == "AVI ",
          s"media $id: not a RIFF/AVI container")
        val riffEnd = math.min(bytes.length.toLong, 8L + rdLe32(bytes, 4)).toInt
        var headerFrames = -1
        var nFrames = 0
        var w = -1; var h = -1
        var sr = 0L; var sg = 0L; var sb = 0L
        // walk chunks of the LIST at [o, end) — top level lists only;
        // hdrl gives the header frame count, movi the frame chunks
        def walk(o0: Int, end: Int, inMovi: Boolean): Unit = {
          var o = o0
          while (o + 8 <= end) {
            val cid = fourCC(bytes, o)
            val sz = rdLe32(bytes, o + 4)
            require(sz >= 0 && o + 8 + sz <= end,
              s"media $id: torn RIFF chunk $cid at $o")
            if (cid == "LIST") {
              val lt = fourCC(bytes, o + 8)
              if (lt == "hdrl" || lt == "movi" || lt == "strl")
                walk(o + 12, o + 8 + sz, inMovi || lt == "movi")
            } else if (cid == "avih") {
              headerFrames = rdLe32(bytes, o + 8 + 16) // dwTotalFrames
            } else if (inMovi && cid.length == 4 &&
                (cid.endsWith("dc") || cid.endsWith("db"))) {
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes, o + 8, sz))
              require(img != null,
                s"media $id: frame $nFrames is not a decodable image")
              if (nFrames == 0) { w = img.getWidth; h = img.getHeight }
              else require(img.getWidth == w && img.getHeight == h,
                s"media $id: frame $nFrames dims ${img.getWidth}x${img.getHeight} != ${w}x$h")
              val px = img.getRGB(0, 0, w, h, null, 0, w)
              var i = 0
              while (i < px.length) {
                val rgb = px(i)
                sr += (rgb >> 16) & 0xff
                sg += (rgb >> 8) & 0xff
                sb += rgb & 0xff
                i += 1
              }
              nFrames += 1
            }
            o += 8 + sz + (sz & 1) // RIFF word alignment
          }
        }
        walk(12, riffEnd, inMovi = false)
        require(headerFrames >= 0, s"media $id: no avih main header")
        require(nFrames == headerFrames,
          s"media $id: header claims $headerFrames frames, movi carries $nFrames")
        require(nFrames > 0, s"media $id: no frames")
        VideoFeatures(id, nFrames, w, h, sr, sg, sb)
      }
    }
  }

  /** Treat documents' text as a binary payload column — the SQL-visible
    * slice of the multimodal path (byte length + md5 digest computed on
    * the BINARY payload; equals md5 of the utf8 string cross-engine). */
  def payloadMeta(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"))
      .select(
        col("doc_id"),
        length(col("payload")).cast("long").as("byte_len"),
        md5(col("payload")).as("digest"))
}
