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
      // audio/video payloads are raw >=256-byte blobs; images are real PNGs
      // whose compressed size varies with content
      if (f.kind == "image") assert(f.nBytes > 0)
      else assert(f.nBytes >= 256)
      assert(f.meanByte > 0 && f.byteEntropyX1000 > 0)
    }
    // video frame sampling: every 2nd 64-byte block
    f1.values.filter(_.kind == "video").foreach { f =>
      assert(f.nFrames == (f.nBytes / 64 + 1) / 2, s"frames ${f.nFrames} bytes ${f.nBytes}")
    }
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
