package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.types.{BinaryType, StructType}

/** Multimodal plumbing: schema, partition-wise batch shape, stub determinism. */
class MultimodalSpec extends SparkSpec {

  test("synthetic media is deterministic and kind-partitioned") {
    val a = Multimodal.syntheticMedia(spark, 30).collect().sortBy(_.mediaId)
    val b = Multimodal.syntheticMedia(spark, 30).collect().sortBy(_.mediaId)
    assert(a.length == 30)
    assert(a.map(_.payload.toSeq).toSeq == b.map(_.payload.toSeq).toSeq)
    assert(a.map(_.kind).distinct.sorted.toSeq == Seq("audio", "image", "video"))
  }

  test("feature extraction runs partition-wise and is stable across partitionings") {
    val media = Multimodal.syntheticMedia(spark, 50)
    val f1 = Multimodal.extractFeatures(media).collect().map(f => f.mediaId -> f).toMap
    val f2 = Multimodal.extractFeatures(media.repartition(7)).collect().map(f => f.mediaId -> f).toMap
    assert(f1.keySet == f2.keySet && f1.keySet.size == 50)
    f1.foreach { case (id, f) =>
      assert(f2(id) == f, s"media $id differs across partitionings")
      // audio is real WAV (44-byte RIFF header + 2 bytes/sample x >=256
      // samples); images are real PNGs and videos real AVIs whose compressed
      // sizes vary with content
      if (f.kind == "image") assert(f.nBytes > 0)
      else if (f.kind == "audio") assert(f.nBytes >= 44 + 2 * 256)
      else assert(f.nBytes > 0)
      assert(f.meanByte > 0 && f.byteEntropyX1000 > 0)
    }
    // video frames are REAL AVI demux counts: '00dc' chunks in the container
    f1.foreach { case (id, f) =>
      if (f.kind == "video")
        assert(f.nFrames == 2 + (id % 4).toInt,
          s"media $id: demuxed frame count ${f.nFrames}")
    }
    // audio "frames" are DECODED sample counts: header + framing parsed for
    // real, so nFrames must equal the generator's sample count exactly
    f1.foreach { case (id, f) =>
      if (f.kind == "audio")
        assert(f.nFrames == 256 + (id * 37 % 512).toInt,
          s"media $id: decoded sample count ${f.nFrames}")
    }
  }

  test("WAV PCM16 encode/demux round-trips exactly through javax.sound.sampled") {
    val samples = Array.tabulate(1000)(i => (((i * 31 + 7) % 251 - 125) * 200).toShort)
    val wav = Codecs.encodeWavPcm16(samples, 8000)
    // real RIFF container: magic bytes, then exact sample recovery
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val (back, rate, channels) = Codecs.decodeWavPcm16(wav)
    assert(rate == 8000 && channels == 1)
    assert(back.toSeq == samples.toSeq, "demux(mux(samples)) must be the identity")
    // encoding is byte-deterministic (fixed canonical header, no metadata)
    assert(Codecs.encodeWavPcm16(samples, 8000).toSeq == wav.toSeq)
    // negative, zero, extreme amplitudes all survive the 16-bit round trip
    val edges = Array[Short](Short.MinValue, -1, 0, 1, Short.MaxValue)
    assert(Codecs.decodeWavPcm16(Codecs.encodeWavPcm16(edges, 44100))._1.toSeq == edges.toSeq)
    // non-PCM payloads are refused loudly, not misread
    val err = intercept[Exception] { Codecs.decodeWavPcm16(Array.fill(64)(7.toByte)) }
    assert(err != null)
  }

  test("PNG encode/decode round-trips exactly through javax.imageio") {
    val (w, h) = (16, 16)
    val plane = Array.tabulate(w * h)(i => ((i * 31 + 7) % 251).toDouble)
    val png = Codecs.encodePng(plane, w, h)
    // real PNG: magic bytes + exact pixel recovery (8-bit gray is lossless)
    assert(png.take(8).map(_ & 0xFF).toSeq == Seq(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A))
    val (back, bw, bh) = Codecs.decodeImage(png)
    assert((bw, bh) == (w, h))
    assert(back.toSeq == plane.toSeq, "decode(encode(plane)) must be the identity")
    // encoding is byte-deterministic (no timestamp chunks)
    assert(Codecs.encodePng(plane, w, h).toSeq == png.toSeq)
  }

  test("decode+resize runs REAL image decode on the synthetic PNG corpus") {
    val media = Multimodal.syntheticMedia(spark, 12)
    val planes = Multimodal.decodeAndResize(media, 8, 8).collect()
    assert(planes.nonEmpty)
    planes.foreach { case (id, p) =>
      assert(p.length == 64)
      assert(p.forall(v => v >= 0 && v <= 255))
      // resize(decode(png)) must equal resize of the ORIGINAL plane: decode is
      // exact, so the whole pipeline is checkable against first principles
      val w = 16; val h = 16
      val orig = Array.tabulate(w * h)(i => ((id * 131 + i * 31 + 7) % 251).toDouble)
      assert(p.toSeq == Codecs.resizeNearest(orig, w, h, 8, 8).toSeq,
        s"media $id: decoded-resized plane differs from ground truth")
    }
    val again = Multimodal.decodeAndResize(media, 8, 8).collect().toMap
    planes.foreach { case (id, p) => assert(again(id).toSeq == p.toSeq) }
  }

  test("MJPEG-in-AVI mux/demux round-trips container and frames exactly") {
    val (w, h) = (16, 16)
    // two JPEG frames with distinct content
    val frames = Array.tabulate(2) { f =>
      Codecs.encodeJpegGray(
        Array.tabulate(w * h)(i => ((f * 61 + i * 31 + 7) % 251).toDouble), w, h)
    }
    val avi = Codecs.encodeAviMjpeg(frames, w, h, fps = 10)
    // container magics: RIFF....AVI LIST....hdrl
    assert(new String(avi.take(4), "US-ASCII") == "RIFF")
    assert(new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
    val v = Codecs.demuxAvi(avi)
    assert((v.width, v.height, v.usPerFrame) == (w, h, 100000))
    // demux returns the EXACT compressed frame payloads that were muxed
    assert(v.frames.length == 2)
    assert(v.frames(0).toSeq == frames(0).toSeq && v.frames(1).toSeq == frames(1).toSeq,
      "demux(mux(frames)) must return identical frame bytes")
    // each frame is a complete decodable JPEG; gray8 JPEG is lossy but the
    // decoded dimensions are exact and values stay in range
    v.frames.foreach { f =>
      assert((f(0) & 0xFF) == 0xFF && (f(1) & 0xFF) == 0xD8, "not a JPEG SOI")
      val (plane, bw, bh) = Codecs.decodeImage(f)
      assert((bw, bh) == (w, h))
      assert(plane.forall(p => p >= 0 && p <= 255))
    }
    // muxing is byte-deterministic
    assert(Codecs.encodeAviMjpeg(frames, w, h, fps = 10).toSeq == avi.toSeq)
    // non-AVI payloads are refused loudly
    val err = intercept[IllegalArgumentException] { Codecs.demuxAvi("junk".getBytes) }
    assert(err.getMessage.contains("RIFF/AVI"))
  }

  test("frameSampleAvi seeks every k-th frame via the idx1 index") {
    val (w, h) = (8, 8)
    val frames = Array.tabulate(5) { f =>
      Codecs.encodeJpegGray(
        Array.tabulate(w * h)(i => ((f * 97 + i * 13 + 3) % 251).toDouble), w, h)
    }
    val avi = Codecs.encodeAviMjpeg(frames, w, h, fps = 25)
    val sampled = Codecs.frameSampleAvi(avi, every = 2)
    assert(sampled.length == 3, "5 frames sampled every 2 -> frames 0,2,4")
    assert(sampled(0).toSeq == frames(0).toSeq)
    assert(sampled(1).toSeq == frames(2).toSeq)
    assert(sampled(2).toSeq == frames(4).toSeq)
    // the synthetic corpus' video payloads demux to their declared frame count
    val media = Multimodal.syntheticMedia(spark, 12)
      .filter((m: Multimodal.MediaFile) => m.kind == "video").collect()
    assert(media.nonEmpty)
    media.foreach { m =>
      val n = Codecs.demuxAvi(m.payload).frames.length
      assert(n == 2 + (m.mediaId % 4).toInt,
        s"media ${m.mediaId}: demuxed $n frames")
    }
  }

  test("documentsAsBinary exposes a real binary column with typed metadata") {
    val df = Multimodal.documentsAsBinary(graft.Tables.documents(spark, "/root/testdata/sf0.001"))
    assert(df.schema("payload").dataType == BinaryType)
    assert(df.schema("meta").dataType.isInstanceOf[StructType])
    val row = df.filter("doc_id = 0").collect().head
    val payload = row.getAs[Array[Byte]]("payload")
    val meta = row.getStruct(row.fieldIndex("meta"))
    assert(payload.length == meta.getAs[Int]("n_chars")) // ascii text: bytes == chars
  }
}
