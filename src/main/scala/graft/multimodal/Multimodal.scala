package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video payloads as
  * opaque `binary` columns with typed metadata, and decode / feature-extract /
  * resize / frame-sample stages over them.
  *
  * All three modalities are real, pure-JVM: IMAGES encode/decode through
  * `javax.imageio` ([[Codecs.encodePng]] / [[Codecs.decodeImage]]); AUDIO
  * muxes/demuxes RIFF/WAV PCM through `javax.sound.sampled`
  * ([[Codecs.encodeWavPcm16]] / [[Codecs.decodeWavPcm16]]); VIDEO
  * muxes/demuxes MJPEG-in-AVI — a RIFF chunk walk (the WAV parser's
  * sibling) with ImageIO JPEG per frame and idx1-indexed frame sampling
  * ([[Codecs.encodeAviMjpeg]] / [[Codecs.demuxAvi]] /
  * [[Codecs.frameSampleAvi]]). No ffmpeg-class bindings exist in this
  * container, so codecs beyond what the JDK decodes (H.264 et al.) would
  * need [[Codecs.decodeImageStub]]-style seams — the CONTAINER layer above
  * them is real. Processing is
  * `mapPartitions`-based so decoders amortize per-batch setup (codec contexts,
  * buffers) across the partition — the same reason Python pipelines use
  * mapInPandas there.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, channels: Int,
                             sampleRate: Int, durationMs: Long, codec: String)
  final case class MediaFile(mediaId: Long, kind: String, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(mediaId: Long, kind: String, nBytes: Long,
                                 meanByte: Double, byteEntropyX1000: Long, nFrames: Int)

  /** Deterministic synthetic corpus: payload bytes are a pure function of mediaId.
    * Images are REAL PNGs (encoded on the executor via ImageIO; Java's PNG writer
    * emits no timestamps, so the bytes are reproducible); audio payloads are REAL
    * RIFF/WAV PCM16 files (Java's WAV writer emits a fixed 44-byte header, so
    * bytes are likewise reproducible); video payloads are REAL MJPEG-in-AVI
    * containers muxed from per-frame JPEGs. */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaFile] = {
    import spark.implicits._
    spark.range(n).repartition(spark.sparkContext.defaultParallelism).map { id =>
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      kind match {
        case "image" =>
          val (w, h) = (16, 16)
          val plane = Array.tabulate(w * h)(i => ((id * 131 + i * 31 + 7) % 251).toDouble)
          MediaFile(id, kind, Codecs.encodePng(plane, w, h),
            MediaMeta(w, h, 1, 0, 0L, "png"))
        case "audio" =>
          val nSamples = 256 + (id * 37 % 512).toInt
          val samples = Array.tabulate(nSamples)(i =>
            ((((id * 131 + i * 31 + 7) % 251) - 125) * 200).toShort)
          MediaFile(id, kind, Codecs.encodeWavPcm16(samples, 8000),
            MediaMeta(0, 0, 1, 8000, nSamples * 1000L / 8000, "wav-pcm16"))
        case _ =>
          val (w, h) = (16, 16)
          val nFrames = 2 + (id % 4).toInt
          val frames = Array.tabulate(nFrames) { f =>
            val plane = Array.tabulate(w * h)(i =>
              ((id * 131 + f * 61 + i * 31 + 7) % 251).toDouble)
            Codecs.encodeJpegGray(plane, w, h)
          }
          MediaFile(id, kind, Codecs.encodeAviMjpeg(frames, w, h, fps = 10),
            MediaMeta(w, h, 1, 0, nFrames * 100L, "avi-mjpeg"))
      }
    }
  }

  /** Partition-wise feature extraction over the binary column: one pass per
    * partition, constant per-row allocation — the batch shape a real decoder needs. */
  def extractFeatures(media: Dataset[MediaFile]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val hist = new Array[Long](256) // reused across the partition's rows
      it.map { m =>
        java.util.Arrays.fill(hist, 0L)
        var sum = 0L
        var i = 0
        while (i < m.payload.length) {
          val b = m.payload(i) & 0xFF
          sum += b; hist(b) += 1
          i += 1
        }
        val n = m.payload.length.toDouble
        var entropy = 0.0
        var j = 0
        while (j < 256) {
          if (hist(j) > 0) { val p = hist(j) / n; entropy -= p * math.log(p) / math.log(2) }
          j += 1
        }
        val frames = m.kind match {
          // REAL container demux: the RIFF walk counts actual '00dc' chunks
          case "video" if m.meta.codec == "avi-mjpeg" =>
            Codecs.demuxAvi(m.payload).frames.length
          case "video" => 0 // unknown container: no codec library to demux it
          case "image" => 1
          // audio "frames" = decoded PCM sample count — a REAL demux read,
          // not a metadata echo (the WAV header is parsed, data chunk framed)
          case "audio" if m.meta.codec == "wav-pcm16" =>
            Codecs.decodeWavPcm16(m.payload)._1.length
          case _       => 0
        }
        MediaFeatures(m.mediaId, m.kind, m.payload.length.toLong,
          sum / n, math.round(entropy * 1000), frames)
      }
    }
  }

  /** Decode + resize pipeline for images: REAL ImageIO decode for any codec it
    * has a reader for (png/jpeg/gif/bmp — dimensions come from the decoded
    * image, not trusted metadata); the stub seam handles everything else. */
  def decodeAndResize(media: Dataset[MediaFile], outW: Int, outH: Int)
      : Dataset[(Long, Array[Double])] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter((m: MediaFile) => m.kind == "image").mapPartitions { it =>
      it.map { m =>
        val (plane, w, h) = m.meta.codec match {
          case "png" | "jpeg" | "gif" | "bmp" => Codecs.decodeImage(m.payload)
          case _ =>
            (Codecs.decodeImageStub(m.payload, m.meta), m.meta.width, m.meta.height)
        }
        m.mediaId -> Codecs.resizeNearest(plane, w, h, outW, outH)
      }
    }
  }

  /** documents.text re-materialized as a binary payload column with metadata — the
    * relational face of multimodal ingestion (oracle-checkable byte lengths). */
  def documentsAsBinary(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        col("lang"), col("source"),
        length(col("text")).as("n_chars")).as("meta"))
}

/** Codec layer — all pure JDK, no external libraries on executors: image
  * encode/decode via javax.imageio, WAV PCM mux/demux via
  * javax.sound.sampled, MJPEG-in-AVI mux/demux via a hand-rolled RIFF
  * walk + ImageIO JPEG frames. [[decodeImageStub]] remains the one seam for
  * image codecs ImageIO lacks a reader for. */
object Codecs {

  /** REAL WAV encode: 16-bit signed little-endian PCM mono wrapped in a RIFF
    * container by the JDK's WAV writer. Deterministic: the writer emits the
    * fixed canonical 44-byte header (no metadata chunks), so identical samples
    * produce identical bytes across JVMs and runs — same property the PNG
    * fixture path relies on. */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false) // signed, little-endian
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xFF).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL WAV demux: parse the RIFF header, frame the data chunk, return the
    * interleaved 16-bit PCM samples plus (sampleRate, channels). Either
    * endianness is handled; non-PCM or non-16-bit payloads are refused loudly
    * (compressed audio needs codec libraries this container lacks). */
  def decodeWavPcm16(payload: Array[Byte]): (Array[Short], Int, Int) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    val fmt = ais.getFormat
    require(fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
        fmt.getSampleSizeInBits == 16,
      s"decodeWavPcm16: expected 16-bit signed PCM, got $fmt")
    val bytes = ais.readAllBytes()
    val out = new Array[Short](bytes.length / 2)
    val bigEndian = fmt.isBigEndian
    var i = 0
    while (i < out.length) {
      val lo = if (bigEndian) bytes(2 * i + 1) else bytes(2 * i)
      val hi = if (bigEndian) bytes(2 * i) else bytes(2 * i + 1)
      out(i) = (((hi & 0xFF) << 8) | (lo & 0xFF)).toShort
      i += 1
    }
    (out, fmt.getSampleRate.toInt, fmt.getChannels)
  }

  /** REAL image decode: any format ImageIO has a reader for (PNG/JPEG/GIF/BMP in
    * a stock JDK). Returns the grayscale plane (column-major, matching
    * [[resizeNearest]]) plus the DECODED dimensions — metadata is not trusted.
    * Single-band rasters are read directly (getRGB on TYPE_BYTE_GRAY would run a
    * gray→sRGB color-space conversion and distort values); color inputs reduce
    * to BT.601 luma. */
  def decodeImage(payload: Array[Byte]): (Array[Double], Int, Int) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Double](w * h)
    val raster = img.getRaster
    val singleBand = raster.getNumBands == 1
    var x = 0
    while (x < w) {
      var y = 0
      while (y < h) {
        out(x * h + y) =
          if (singleBand) raster.getSample(x, y, 0).toDouble
          else {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xFF
            val g = (rgb >> 8) & 0xFF
            val b = rgb & 0xFF
            math.round(0.299 * r + 0.587 * g + 0.114 * b).toDouble
          }
        y += 1
      }
      x += 1
    }
    (out, w, h)
  }

  /** REAL PNG encode (fixture generation + image sink materialization).
    * Deterministic: Java's PNG writer emits no timestamp chunks, so identical
    * planes produce identical bytes across JVMs and runs. */
  def encodePng(plane: Array[Double], w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var x = 0
    while (x < w) {
      var y = 0
      while (y < h) {
        raster.setSample(x, y, 0,
          math.max(0L, math.min(255L, math.round(plane(x * h + y)))).toInt)
        y += 1
      }
      x += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** STUB: deterministic fake decode for codecs ImageIO cannot read — maps payload
    * bytes onto a width×height plane (repeating if short). Everything downstream
    * consumes the same Array[Double] plane as the real path. */
  def decodeImageStub(payload: Array[Byte], meta: Multimodal.MediaMeta): Array[Double] = {
    val out = new Array[Double](meta.width * meta.height)
    var i = 0
    while (i < out.length) {
      out(i) = (payload(i % payload.length) & 0xFF).toDouble
      i += 1
    }
    out
  }

  /** Nearest-neighbor resize (real implementation — pure array math). */
  def resizeNearest(plane: Array[Double], w: Int, h: Int, outW: Int, outH: Int): Array[Double] = {
    val out = new Array[Double](outW * outH)
    var x = 0
    while (x < outW) {
      var y = 0
      while (y < outH) {
        val sx = math.min(w - 1, x * w / outW)
        val sy = math.min(h - 1, y * h / outH)
        out(x * outH + y) = plane(sx * h + sy)
        y += 1
      }
      x += 1
    }
    out
  }

  /** A demuxed MJPEG-in-AVI video: container metadata plus the COMPRESSED
    * frame payloads (each one a complete JPEG — decode via [[decodeImage]]). */
  final case class AviVideo(width: Int, height: Int, usPerFrame: Int,
                            frames: Array[Array[Byte]])

  /** REAL JPEG encode (grayscale), the frame codec for [[encodeAviMjpeg]].
    * Same plane convention as [[encodePng]]. Deterministic: the JDK's JPEG
    * writer emits fixed quantization/Huffman tables and no timestamps. */
  def encodeJpegGray(plane: Array[Double], w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var x = 0
    while (x < w) {
      var y = 0
      while (y < h) {
        raster.setSample(x, y, 0,
          math.max(0L, math.min(255L, math.round(plane(x * h + y)))).toInt)
        y += 1
      }
      x += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  // -------- MJPEG-in-AVI container (RIFF — the WAV parser's sibling) --------
  // Layout written and read here, from the public AVI RIFF spec:
  //   RIFF <sz> 'AVI '
  //     LIST <sz> 'hdrl'  { 'avih' <56> MainAVIHeader ;
  //                         LIST <sz> 'strl' { 'strh' <56> ; 'strf' <40> } }
  //     LIST <sz> 'movi'  { '00dc' <sz> <jpeg bytes> [pad] ... }
  //     'idx1' <16*n>     { ckid, flags, offset-from-'movi'-fourcc, size }
  // Every u16/u32 is little-endian; chunks pad to even length.

  private def u32le(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
    out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
  }
  private def u16le(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
  }
  private def fcc(out: java.io.ByteArrayOutputStream, s: String): Unit =
    out.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))

  /** REAL AVI mux: wrap pre-encoded JPEG frames as an MJPG video stream,
    * with the standard idx1 frame index so samplers can seek without
    * scanning the movi list. Deterministic byte-for-byte. */
  def encodeAviMjpeg(frames: Array[Array[Byte]], w: Int, h: Int,
                     fps: Int): Array[Byte] = {
    require(frames.nonEmpty && fps > 0, "encodeAviMjpeg: frames and fps required")
    val maxFrame = frames.map(_.length).max
    val paddedSizes = frames.map(f => 8 + f.length + (f.length & 1))
    val moviSize = 4 + paddedSizes.sum
    val idx1Size = 16 * frames.length
    val strlSize = 4 + (8 + 56) + (8 + 40)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idx1Size)
    val out = new java.io.ByteArrayOutputStream(riffSize + 8)
    fcc(out, "RIFF"); u32le(out, riffSize); fcc(out, "AVI ")
    // hdrl
    fcc(out, "LIST"); u32le(out, hdrlSize); fcc(out, "hdrl")
    fcc(out, "avih"); u32le(out, 56)
    u32le(out, 1000000 / fps)            // dwMicroSecPerFrame
    u32le(out, 0); u32le(out, 0)         // dwMaxBytesPerSec, dwPaddingGranularity
    u32le(out, 0x10)                     // dwFlags = AVIF_HASINDEX
    u32le(out, frames.length)            // dwTotalFrames
    u32le(out, 0); u32le(out, 1)         // dwInitialFrames, dwStreams
    u32le(out, maxFrame)                 // dwSuggestedBufferSize
    u32le(out, w); u32le(out, h)
    (0 until 4).foreach(_ => u32le(out, 0))
    fcc(out, "LIST"); u32le(out, strlSize); fcc(out, "strl")
    fcc(out, "strh"); u32le(out, 56)
    fcc(out, "vids"); fcc(out, "MJPG")
    u32le(out, 0); u32le(out, 0)         // dwFlags, wPriority+wLanguage
    u32le(out, 0)                        // dwInitialFrames
    u32le(out, 1); u32le(out, fps)       // dwScale, dwRate → rate/scale = fps
    u32le(out, 0); u32le(out, frames.length) // dwStart, dwLength
    u32le(out, maxFrame); u32le(out, -1) // dwSuggestedBufferSize, dwQuality
    u32le(out, 0)                        // dwSampleSize
    u16le(out, 0); u16le(out, 0); u16le(out, w); u16le(out, h) // rcFrame
    fcc(out, "strf"); u32le(out, 40)
    u32le(out, 40); u32le(out, w); u32le(out, h)
    u16le(out, 1); u16le(out, 24)        // biPlanes, biBitCount
    fcc(out, "MJPG")                     // biCompression
    u32le(out, w * h * 3)
    (0 until 4).foreach(_ => u32le(out, 0))
    // movi + idx1 offsets (relative to the 'movi' fourcc position)
    fcc(out, "LIST"); u32le(out, moviSize); fcc(out, "movi")
    val offsets = new Array[Int](frames.length)
    var off = 4 // first chunk sits right after the 'movi' fourcc
    frames.zipWithIndex.foreach { case (f, i) =>
      offsets(i) = off
      fcc(out, "00dc"); u32le(out, f.length); out.write(f)
      if ((f.length & 1) == 1) out.write(0)
      off += 8 + f.length + (f.length & 1)
    }
    fcc(out, "idx1"); u32le(out, idx1Size)
    frames.zipWithIndex.foreach { case (f, i) =>
      fcc(out, "00dc"); u32le(out, 0x10)  // AVIIF_KEYFRAME
      u32le(out, offsets(i)); u32le(out, f.length)
    }
    out.toByteArray
  }

  private def rdU32(p: Array[Byte], o: Int): Int =
    (p(o) & 0xFF) | ((p(o + 1) & 0xFF) << 8) |
      ((p(o + 2) & 0xFF) << 16) | ((p(o + 3) & 0xFF) << 24)
  private def rdFcc(p: Array[Byte], o: Int): String =
    new String(p, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** REAL AVI demux: RIFF chunk walk — hdrl for dimensions/timing, movi for
    * the stream-0 video chunks ('00dc'/'00db'), each returned as its
    * complete compressed JPEG payload. Refuses non-AVI payloads loudly. */
  def demuxAvi(payload: Array[Byte]): AviVideo = {
    require(payload.length >= 12 && rdFcc(payload, 0) == "RIFF" &&
      rdFcc(payload, 8) == "AVI ", "demuxAvi: payload is not a RIFF/AVI container")
    var w = 0; var h = 0; var uspf = 0
    val frames = Array.newBuilder[Array[Byte]]
    def walk(from: Int, end: Int): Unit = {
      var o = from
      while (o + 8 <= end) {
        val id = rdFcc(payload, o)
        val size = rdU32(payload, o + 4)
        if (id == "LIST") {
          val kind = rdFcc(payload, o + 8)
          if (kind == "hdrl" || kind == "movi" || kind == "strl")
            walk(o + 12, math.min(end, o + 8 + size))
        } else if (id == "avih") {
          uspf = rdU32(payload, o + 8)
          w = rdU32(payload, o + 8 + 32)
          h = rdU32(payload, o + 8 + 36)
        } else if ((id == "00dc" || id == "00db") && size > 0) {
          frames += java.util.Arrays.copyOfRange(payload, o + 8, o + 8 + size)
        }
        o += 8 + size + (size & 1)
      }
    }
    walk(12, math.min(payload.length, 8 + rdU32(payload, 4)))
    AviVideo(w, h, uspf, frames.result())
  }

  /** Frame sampling VIA THE INDEX: reads idx1 and slices only every k-th
    * frame's bytes — no movi scan, the seek pattern a sampler over large
    * videos needs. Falls back to a full demux when the index is absent. */
  def frameSampleAvi(payload: Array[Byte], every: Int): Array[Array[Byte]] = {
    require(every > 0, "frameSampleAvi: every must be positive")
    // locate top-level 'movi' and 'idx1'
    var moviPos = -1; var idxPos = -1; var idxSize = 0
    var o = 12
    val end = math.min(payload.length, 8 + rdU32(payload, 4))
    while (o + 8 <= end) {
      val id = rdFcc(payload, o)
      val size = rdU32(payload, o + 4)
      if (id == "LIST" && rdFcc(payload, o + 8) == "movi") moviPos = o + 8
      else if (id == "idx1") { idxPos = o + 8; idxSize = size }
      o += 8 + size + (size & 1)
    }
    if (idxPos < 0 || moviPos < 0) {
      val all = demuxAvi(payload).frames
      return (0 until all.length by every).map(all).toArray
    }
    val n = idxSize / 16
    (0 until n by every).flatMap { i =>
      val e = idxPos + 16 * i
      val ckid = rdFcc(payload, e)
      if (ckid == "00dc" || ckid == "00db") {
        val off = rdU32(payload, e + 8)
        val sz = rdU32(payload, e + 12)
        // offset is relative to the 'movi' fourcc; chunk data starts past
        // the 8-byte chunk header
        Some(java.util.Arrays.copyOfRange(
          payload, moviPos + off + 8, moviPos + off + 8 + sz))
      } else None
    }.toArray
  }
}
