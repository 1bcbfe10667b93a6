package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dsir

class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "lang", "text")

  test("importance weights separate a shifted-vocabulary target") {
    import spark.implicits._
    // 40 target docs draw from a formal register, 160 raw docs from a
    // casual one, with shared filler — the distribution shift DSIR is
    // built to detect (the parquet corpus's vocabulary is iid across
    // slices, so separation is pinned HERE and engine parity there)
    val formal = Seq("moreover", "methodology", "empirical", "theorem")
    val casual = Seq("lol", "gonna", "stuff", "yeah")
    val filler = Seq("the", "data", "model")
    def doc(i: Int, sig: Seq[String]) =
      (0 until 20).map(j => if (j % 2 == 0) sig((i + j) % 4) else filler(j % 3))
        .mkString(" ")
    val rows =
      (0 until 40).map(i => (i.toLong, "target", doc(i, formal))) ++
        (40 until 200).map(i => (i.toLong, "raw", doc(i, casual)))
    val df = rows.toDF("doc_id", "slice", "text")
    val w = Dsir.importanceWeights(df, "doc_id", "text", col("slice") === "target")
    val top = Dsir.selectTop(w, "doc_id", 40)
    // perfect separation: the top-40 by weight ARE the 40 target docs
    assert(top.filter(col("slice") === "target").count() == 40)
    assert(top.select("doc_id").distinct().count() == top.count())
  }

  test("hashed-bucket tier is row-identical when buckets are collision-free") {
    // the corpus vocabulary is tiny (~60 words): 2^20 buckets are a
    // relabeling of the token alphabet, so the model — and therefore the
    // weights — must match the raw-token tier bit-for-bit
    val raw = Dsir.importanceWeights(docs, "doc_id", "text", col("lang") === "en")
      .select("doc_id", "weight").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val bucketed = Dsir
      .importanceWeightsBucketed(docs, "doc_id", "text",
        col("lang") === "en", bucketBits = 20)
      .select("doc_id", "weight").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(bucketed == raw)
  }

  test("weights are partitioning-invariant (DetAgg decimal route)") {
    val base = Dsir.importanceWeights(docs, "doc_id", "text", col("lang") === "en")
      .select("doc_id", "weight").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val shuffled = Dsir.importanceWeights(
      docs.repartition(17, col("doc_id")), "doc_id", "text",
      col("lang") === "en")
      .select("doc_id", "weight").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(shuffled == base)
  }
}
