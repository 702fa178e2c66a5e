package graft.multimodal

import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.multimodal.MediaFeatures._

class MediaFeaturesSpec extends SparkSpec {

  private def mediaDf = {
    val bytes = (0 until 4096).map(i => ((i * 31 + 7) % 256).toByte).toArray
    val rows = Seq(
      Row(1L, "image", "mem://a.png", bytes, 640, 480, null),
      Row(2L, "audio", "mem://b.wav", bytes.take(1600), null, null, 16000),
      Row(3L, "video", "mem://c.mp4", bytes ++ bytes, null, null, null),
      Row(4L, "image", "mem://d.png", Array.emptyByteArray, null, null, null))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), mediaSchema)
  }

  test("feature extraction: histogram partitions the bytes, sha is stable") {
    val feats = extractFeatures(mediaDf).collect().sortBy(_.media_id)
    assert(feats.length == 4)
    feats.foreach(f => assert(f.histogram.sum == f.byte_len))
    assert(feats(0).width == 640 && feats(0).height == 480) // metadata wins
    assert(feats(1).duration_ms == 100)                     // 1600/16 stub
    assert(feats(3).byte_len == 0 && feats(3).mean_byte == 0.0)
    // Deterministic: same input → same sha
    val again = extractFeatures(mediaDf).collect().sortBy(_.media_id)
    assert(feats.map(_.sha256).toSeq == again.map(_.sha256).toSeq)
  }

  test("codec stubs: frame sampling strides blocks, resize bounds output") {
    val bytes = Array.fill[Byte](10240)(1)
    assert(Codec.sampleFrames(bytes, 3).length == 4) // blocks 0,3,6,9
    assert(Codec.resize(bytes, 64, 64).length <= bytes.length)
  }
}
