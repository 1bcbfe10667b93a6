package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Pq, Similarity}

class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def clustered() = {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val centers = Array.fill(4)(Array.fill(16)(rnd.nextGaussian() * 5))
    val rows = (0 until 200).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.3).toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("PQ codes compress deterministically and ADC+rerank recovers brute-force top-10") {
    import org.apache.spark.sql.functions._
    val df = clustered()
    val model = Pq.train(df, "vec_id", "embedding", dim = 16, m = 4, k = 8,
      iters = 4, seed = 3L)
    assert(model.m == 4 && model.k == 8 && model.subDim == 4)
    val enc = Pq.encode(df, "vec_id", "embedding", model)
    assert(enc.select(size(col("codes"))).distinct().collect().map(_.getInt(0)).toSeq == Seq(4))
    // deterministic encoding
    val enc2 = Pq.encode(df, "vec_id", "embedding", model)
    assert(enc.collect().map(_.toString).sorted.sameElements(
      enc2.collect().map(_.toString).sorted))
    val qv = df.filter(col("vec_id") === 0L).collect().head
      .getSeq[Float](1).map(_.toDouble).toArray
    // rerank must cover the ADC tie class: all ~50 members of the query's
    // cluster can share one code, and ties shortlist arbitrarily
    val got = Pq.searchTopK(enc, df, "vec_id", "embedding", model, qv,
      topK = 10, rerank = 60)
      .collect().map(_.getLong(0)).toSet
    val brute = Similarity.topK(df, "vec_id", "embedding", queryId = 0L, k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(got.intersect(brute).size >= 8, s"recall ${got.intersect(brute).size}/10")
  }

  test("seeding-pool rank guard plans as a map-side WindowGroupLimit") {
    import org.apache.spark.sql.functions._
    // the pool derivation claims every task forwards <= poolN rows per
    // subspace — that is only true if InferWindowGroupLimit fires on the
    // rn <= poolN filter (GraftSession raises the threshold); a silent
    // regression here funnels the full n x m subvector relation into the
    // m group sorts
    val subs = clustered().select(
      col("vec_id"),
      posexplode(array((0 to 1).map(_ => col("embedding").cast("array<double>")): _*))
        .as(Seq("s", "sv")))
    val hashed = subs.withColumn("__h", xxhash64(col("vec_id"), col("s"), lit(1L)))
    val p = Pq.seedPoolPlan(hashed, "vec_id", poolN = 100)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      "pool rank guard lost its map-side WindowGroupLimit:\n" + p.take(1500))
  }
}
