package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video payloads as
  * opaque `binary` columns with typed metadata, and decode / feature-extract /
  * resize / frame-sample stages over them.
  *
  * The IMAGE path is fully real: [[Codecs.encodePng]] / [[Codecs.decodeImage]]
  * run actual PNG (or any ImageIO-readable) encode/decode through `javax.imageio`,
  * which ships with the JDK — executors need no extra libraries. The AUDIO path
  * is likewise real: [[Codecs.encodeWavPcm16]] / [[Codecs.decodeWavPcm16]] demux
  * RIFF/WAV PCM through `javax.sound.sampled` (also stock JDK). Only VIDEO demux
  * remains a clearly marked STUB seam ([[Codecs.frameSampleStub]], plus
  * [[Codecs.decodeImageStub]] for non-ImageIO image codecs): this container has
  * no ffmpeg-class bindings, and swapping one in touches only the [[Codecs]]
  * object — every operator shape stays identical. Processing is
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
    * bytes are likewise reproducible); video payloads stay synthetic blobs behind
    * the demux stub seam. */
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
          val size = 256 + (id * 37 % 512).toInt
          val payload =
            Array.tabulate(size)(i => (((id * 131 + i * 31 + 7) % 251) & 0xFF).toByte)
          MediaFile(id, kind, payload, MediaMeta(8, 8, 1, 0, size.toLong, "stub-vid"))
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
          case "video" => Codecs.frameSampleStub(m.payload, m.meta).length
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

/** Codec layer: REAL image encode/decode via the JDK's javax.imageio and REAL
  * WAV PCM audio demux via the JDK's javax.sound.sampled (no external libraries
  * needed on executors), plus the remaining STUB seams for formats the JDK
  * cannot demux (compressed audio containers, video). */
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
    * (compressed audio needs codec libraries this container lacks — that seam
    * is [[frameSampleStub]]'s documented territory, now video-only). */
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

  /** STUB: frame sampling — treats the payload as fixed-size frame blocks and takes
    * every k-th; a real implementation would demux the container. */
  def frameSampleStub(payload: Array[Byte], meta: Multimodal.MediaMeta,
                      frameBytes: Int = 64, every: Int = 2): Array[Array[Byte]] = {
    val nFrames = payload.length / frameBytes
    (0 until nFrames by every).map { f =>
      java.util.Arrays.copyOfRange(payload, f * frameBytes, (f + 1) * frameBytes)
    }.toArray
  }
}
