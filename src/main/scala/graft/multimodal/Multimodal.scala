package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video payloads as
  * opaque `binary` columns with typed metadata, and decode / feature-extract /
  * resize / frame-sample stages over them.
  *
  * The Spark-side plumbing — schema, partition-wise batch processing, operator
  * signatures — is real and tested. The codec step itself is a clearly marked STUB
  * (this container has no image/audio libraries): [[Codecs.decodeImageStub]] produces
  * a deterministic fake plane from the payload bytes. Swapping in a real decoder
  * (javax.imageio / ffmpeg bindings) touches only the [[Codecs]] object; every
  * operator shape stays identical. Processing is `mapPartitions`-based so a real
  * decoder would amortize per-batch setup (codec contexts, buffers) across the
  * partition — the same reason Python pipelines use mapInPandas there.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, channels: Int,
                             sampleRate: Int, durationMs: Long, codec: String)
  final case class MediaFile(mediaId: Long, kind: String, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(mediaId: Long, kind: String, nBytes: Long,
                                 meanByte: Double, byteEntropyX1000: Long, nFrames: Int)

  /** Deterministic synthetic corpus: payload bytes are a pure function of mediaId. */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaFile] = {
    import spark.implicits._
    spark.range(n).repartition(spark.sparkContext.defaultParallelism).map { id =>
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val size = 256 + (id * 37 % 512).toInt
      val payload = Array.tabulate(size)(i => (((id * 131 + i * 31 + 7) % 251) & 0xFF).toByte)
      val meta = kind match {
        case "image" => MediaMeta(16, 16, 1, 0, 0L, "stub-img")
        case "audio" => MediaMeta(0, 0, 1, 8000, size.toLong, "stub-pcm")
        case _       => MediaMeta(8, 8, 1, 0, size.toLong, "stub-vid")
      }
      MediaFile(id, kind, payload, meta)
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
          case _       => 0
        }
        MediaFeatures(m.mediaId, m.kind, m.payload.length.toLong,
          sum / n, math.round(entropy * 1000), frames)
      }
    }
  }

  /** Decode + resize pipeline for images (stub codec, real operator shape). */
  def decodeAndResize(media: Dataset[MediaFile], outW: Int, outH: Int)
      : Dataset[(Long, Array[Double])] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter((m: MediaFile) => m.kind == "image").mapPartitions { it =>
      it.map { m =>
        val plane = Codecs.decodeImageStub(m.payload, m.meta)
        m.mediaId -> Codecs.resizeNearest(plane, m.meta.width, m.meta.height, outW, outH)
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

/** STUB codec seam — the only place a real decoder would plug in. */
object Codecs {

  /** STUB: deterministic fake decode — maps payload bytes onto a width×height plane
    * (repeating if short). A real implementation would parse an actual image codec;
    * everything downstream consumes the same Array[Double] plane either way. */
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
