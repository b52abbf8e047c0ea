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
      assert(f.nBytes >= 256 && f.meanByte > 0 && f.byteEntropyX1000 > 0)
    }
    // video frame sampling: every 2nd 64-byte block
    f1.values.filter(_.kind == "video").foreach { f =>
      assert(f.nFrames == (f.nBytes / 64 + 1) / 2, s"frames ${f.nFrames} bytes ${f.nBytes}")
    }
  }

  test("decode+resize produces fixed-shape planes through the stub codec seam") {
    val media = Multimodal.syntheticMedia(spark, 12)
    val planes = Multimodal.decodeAndResize(media, 8, 8).collect()
    assert(planes.nonEmpty)
    planes.foreach { case (_, p) =>
      assert(p.length == 64)
      assert(p.forall(v => v >= 0 && v <= 255))
    }
    // determinism of the stub decode
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
