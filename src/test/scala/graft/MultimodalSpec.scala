package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def media() = {
    import spark.implicits._
    Seq(
      (1L, "abcdef".getBytes("UTF-8"), "image", Some(4), Some(4), None: Option[Int], None: Option[Int]),
      (2L, Array[Byte](), "image", Some(0), Some(0), None, None),
      (3L, "0123456789".getBytes("UTF-8"), "video", None, None, None, Some(10)))
      .toDF("media_id", "payload", "media_type", "width", "height", "sample_rate", "n_frames")
  }

  test("extractFeatures: byte length, stable content hash, 8 stub features") {
    val f = Multimodal.extractFeatures(media()).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(f(1L).getInt(1) == 6)
    assert(f(2L).getInt(1) == 0)
    assert(f(1L).getSeq[Float](3).length == 8)
    // deterministic across runs
    val again = Multimodal.extractFeatures(media()).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(f.map { case (k, v) => k -> v.getLong(2) } == again)
  }

  test("sampleFrameIndexes strides only video rows") {
    val idx = Multimodal.sampleFrameIndexes(media(), stride = 3).collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue())).toSet
    assert(idx == Set((3L, 0L), (3L, 3L), (3L, 6L), (3L, 9L)))
  }
}
