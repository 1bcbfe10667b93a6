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

  test("semanticOverlap: max cosine against the benchmark set, threshold flag") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)),   // cos 1.0 vs b1 → contaminated
      (2L, Array(0.0f, 1.0f)),   // cos 1.0 vs b2 → contaminated
      (3L, Array(1.0f, -1.0f))   // max cos ≈ 0.7071 vs b1 → below 0.9
    ).toDF("vec_id", "embedding")
    val benchV = Seq(
      (10L, Array(2.0f, 0.0f)), (11L, Array(0.0f, 3.0f))
    ).toDF("vec_id", "embedding")
    val got = Decontam
      .semanticOverlap(corpus, benchV, "vec_id", "embedding", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
      .sortBy(_._1)
    assert(got.map(x => (x._1, x._3)).toSeq == Seq((1L, true), (2L, true), (3L, false)))
    assert(math.abs(got(2)._2 - 0.707107) < 1e-6)
  }

  test("semanticOverlap guard refuses an over-bound benchmark set") {
    val corpus = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val benchV = Seq(
      (10L, Array(2.0f, 0.0f)), (11L, Array(0.0f, 3.0f))
    ).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Decontam.semanticOverlap(
        corpus, benchV, "vec_id", "embedding", 0.9, maxBench = 1L).collect()
    }
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(messages(e).contains("broadcast-safe bound"), messages(e))
  }
}
