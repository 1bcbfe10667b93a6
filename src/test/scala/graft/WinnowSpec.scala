package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions

class WinnowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fps(texts: (Long, String)*): Map[Long, Set[String]] = {
    import spark.implicits._
    texts.toSeq.toDF("id", "text")
      .select(col("id"),
        TextFunctions.winnowFingerprints(col("text"), k = 5, w = 4).as("f"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
  }

  test("a shared run of >= w+k-1 tokens guarantees a shared fingerprint") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta" // 8 = w+k-1
    val a = s"one two three $shared four five six"
    val b = s"nine eight $shared seven"
    val m = fps(1L -> a, 2L -> b)
    assert((m(1L) intersect m(2L)).nonEmpty,
      "winnowing must fingerprint some gram inside the shared run")
    // and unrelated docs share nothing
    val u = fps(1L -> a, 3L -> "cat dog bird fish mouse horse cow sheep goat")
    assert((u(1L) intersect u(3L)).isEmpty)
  }

  test("short-text edges: < k tokens -> empty; < w grams -> single min") {
    val m = fps(
      1L -> "one two three four",            // 4 tokens < k=5 -> no grams
      2L -> "one two three four five six")   // 2 grams < w=4 -> one window
    assert(m(1L).isEmpty)
    assert(m(2L).size == 1)
  }

  test("relation tier is fingerprint-set-identical to the array form") {
    import spark.implicits._
    // real corpus docs + short-text edges in one frame
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
      .unionAll(Seq(
        (900000001L, "one two three four"),          // < k tokens
        (900000002L, "one two three four five six")) // < w grams
        .toDF("id", "text"))
    val arrayForm = df.select(col("id"),
      explode(TextFunctions.winnowFingerprints(col("text"), 5, 4)).as("fp"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val relForm = TextFunctions.winnowFingerprintsRel(df, "id", "text", 5, 4)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(relForm == arrayForm)
  }

  test("signature is shift-invariant: a prefix does not rewrite interior mins") {
    // winnowing picks local minima, so prepending tokens leaves the
    // fingerprints of a long interior run mostly intact (the density
    // property); assert substantial overlap rather than bit equality
    val body = (0 until 60).map(i => s"tok${(i * 7) % 23}").mkString(" ")
    val m = fps(1L -> body, 2L -> s"pre1 pre2 pre3 $body")
    val inter = (m(1L) intersect m(2L)).size.toDouble
    assert(inter / m(1L).size > 0.8, s"overlap ${inter / m(1L).size}")
  }
}
