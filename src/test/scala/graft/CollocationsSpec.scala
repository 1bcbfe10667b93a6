package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CollocationsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("a planted rigid collocation tops the PMI ranking") {
    import spark.implicits._
    // 'aurora borealis' occurs 40 times, always adjacent, and both words
    // occur ONLY in that pair; filler words are frequent and shuffled —
    // PMI must rank the rigid pair first
    val filler = Seq("the", "data", "model", "spark", "query", "table")
    val texts = (0 until 40).map { i =>
      val pre = (0 until 8).map(j => filler((i + j) % 6)).mkString(" ")
      val post = (0 until 8).map(j => filler((i * 3 + j) % 6)).mkString(" ")
      s"$pre aurora borealis $post"
    }
    val dir = Files.createTempDirectory("graft_colloc")
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val top = SparkEntry.queries("text_collocations")(spark, dir.toString)
      .collect()
    assert(top.nonEmpty)
    val first = top.head
    assert((first.getString(0), first.getString(1)) == (("aurora", "borealis")),
      s"top collocation was (${first.getString(0)}, ${first.getString(1)})")
    // and its PMI strictly exceeds every filler bigram's
    assert(top.tail.forall(_.getDouble(3) < first.getDouble(3)))
  }
}
