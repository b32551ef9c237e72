package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("media table carries binary payload + typed metadata") {
    val media = Multimodal.mediaTable(spark, sf)
    val first = media.head()
    assert(first.payload.nonEmpty)
    assert(first.meta.nBytes === first.payload.length.toLong)
    assert(first.meta.mime === "application/octet-stream")
  }

  test("decode stub is deterministic and batch extraction covers every record") {
    val media = Multimodal.mediaTable(spark, sf)
    val n = media.count()
    val feats = Multimodal.extractFeatures(media, batchSize = 64)
    assert(feats.count() === n)
    val f1 = feats.orderBy("doc_id").head()
    val f2 = Multimodal.extractFeatures(media, batchSize = 7).orderBy("doc_id").head()
    assert(f1 === f2) // batch size must not change results
    assert(f1.width >= 64 && f1.width < 128)
    assert(f1.brightness > 0.0)
  }

  test("decode stub golden value on a known payload") {
    val r = MediaRecord(42L, "abc".getBytes("UTF-8"), MediaMeta("application/octet-stream", 3L))
    val f = Multimodal.decodeStub(r)
    assert(f.doc_id === 42L)
    assert(f.width === 64 + 3)
    assert(f.n_frames === 1 + 3 % 4)
    assert(f.brightness === (97 + 98 + 99).toDouble / 3.0)
  }

  test("resize stub strides the payload and updates metadata") {
    val r = MediaRecord(7L, "abcdefghij".getBytes("UTF-8"), MediaMeta("application/octet-stream", 10L))
    val resized = Multimodal.resizeStub(r, stride = 4)
    assert(resized.payload.toSeq === Seq('a'.toByte, 'e'.toByte, 'i'.toByte))
    assert(resized.meta.nBytes === 3L)
    // batched dataset form preserves counts and determinism
    val media = Multimodal.mediaTable(spark, sf).limit(20)
    val a = Multimodal.resize(media, stride = 4, batchSize = 3).collect().sortBy(_.doc_id)
    val b = Multimodal.resize(media, stride = 4, batchSize = 256).collect().sortBy(_.doc_id)
    assert(a.length === 20)
    assert(a.map(_.meta.nBytes).toSeq === b.map(_.meta.nBytes).toSeq)
  }

  test("frame sampling emits every k-th offset") {
    val media = Multimodal.mediaTable(spark, sf).limit(5)
    val frames = Multimodal.sampleFrames(media, everyK = 100)
    val one = frames.filter(col("doc_id") === media.head().doc_id)
      .orderBy("frame_idx").collect()
    assert(one.nonEmpty)
    assert(one.head.getAs[Long]("frame_offset") === 0L)
    if (one.length > 1) assert(one(1).getAs[Long]("frame_offset") === 100L)
  }
}
