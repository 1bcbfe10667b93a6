package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Decontam

class DecontamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val bench = Seq(
    (100L, "the quick brown fox jumps over the lazy dog"),
    (101L, "pack my box with five dozen liquor jugs")
  ).toDF("doc_id", "text")

  test("verbatim benchmark leak scores overlap 1.0 and is flagged") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // exact leak
      (2L, "completely unrelated sentence about spark plans here"),
      (3L, "with five dozen liquor jugs on a shelf somewhere") // partial
    ).toDF("doc_id", "text")
    val got = Decontam.overlap(corpus, bench, "doc_id", "text", k = 3, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getDouble(3) == 1.0 && got(1L).getBoolean(4))
    assert(got(2L).getDouble(3) == 0.0 && !got(2L).getBoolean(4))
    val partial = got(3L).getDouble(3)
    assert(partial > 0.0 && partial < 1.0, s"partial=$partial")
  }

  test("clean removes flagged docs, keeps short docs conservatively") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated sentence about spark plans here"),
      (3L, "two tokens") // too short to shingle — must be kept
    ).toDF("doc_id", "text")
    val kept = Decontam.clean(corpus, bench, "doc_id", "text", k = 3, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
  }

  test("empty benchmark flags nothing") {
    val corpus = Seq((1L, "one two three four")).toDF("doc_id", "text")
    val got = Decontam.overlap(
      corpus, bench.limit(0), "doc_id", "text", k = 3, threshold = 0.5).collect()
    assert(got.length == 1 && got.head.getLong(2) == 0L && !got.head.getBoolean(4))
  }
}
