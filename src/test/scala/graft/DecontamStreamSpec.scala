package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Decontam
import graft.streaming.DecontamStream

class DecontamStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming decontam gate matches the batch operator row-for-row") {
    import spark.implicits._
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "pack my box with five dozen liquor jugs")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en", "s", 43L),
      (2L, "completely unrelated sentence about spark plans here", "en", "s", 52L),
      (3L, "with five dozen liquor jugs on a shelf somewhere", "en", "s", 48L),
      (4L, "too short", "en", "s", 9L) // unshingleable at k=3? (2 tokens)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("graft_decontam_stream")
    incoming.write.mode("overwrite").parquet(dir.toString)
    DecontamStream.runOnce(
      spark, dir.toString, bench, k = 3, threshold = 0.5, "decontam_stream_out")
    val streamed = spark.table("decontam_stream_out")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    val batch = Decontam.overlap(
      incoming.select("doc_id", "text"), bench, "doc_id", "text", k = 3, threshold = 0.5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    assert(streamed(1L)._4 && !streamed(2L)._4)
    assert(!streamed.contains(4L)) // unshingleable docs absent in both forms
  }
}
