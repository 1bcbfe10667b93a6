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

  test("trainCached memoizes per (corpusKey, params) and matches train() exactly") {
    val df = clustered()
    val a = Pq.trainCached(df, "vec_id", "embedding", dim = 16, m = 4, k = 8,
      iters = 4, seed = 3L, corpusKey = "pqspec-corpus")
    // second call: no retraining — the SAME instance comes back
    val b = Pq.trainCached(df, "vec_id", "embedding", dim = 16, m = 4, k = 8,
      iters = 4, seed = 3L, corpusKey = "pqspec-corpus")
    assert(a eq b, "cache returned a different instance — model was retrained")
    // and it is bit-identical to an uncached training run (determinism)
    val fresh = Pq.train(df, "vec_id", "embedding", dim = 16, m = 4, k = 8,
      iters = 4, seed = 3L)
    assert(a.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      fresh.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    // a different parameter is a different cache entry
    val other = Pq.trainCached(df, "vec_id", "embedding", dim = 16, m = 4, k = 8,
      iters = 4, seed = 4L, corpusKey = "pqspec-corpus")
    assert(!(other eq a))
  }

  test("trainCached keys on the vector COLUMN — a second column of the same corpus is a distinct entry") {
    import org.apache.spark.sql.functions._
    // same corpusKey, different vec column: must NOT return the codebook
    // trained on the other column (the r7 code-review defect)
    val df = clustered().withColumn("embedding_b", transform(col("embedding"), x => -x))
    val a = Pq.trainCached(df, "vec_id", "embedding", dim = 16, m = 4, k = 8,
      iters = 4, seed = 3L, corpusKey = "pqspec-twocol")
    val b = Pq.trainCached(df, "vec_id", "embedding_b", dim = 16, m = 4, k = 8,
      iters = 4, seed = 3L, corpusKey = "pqspec-twocol")
    assert(!(b eq a), "cache returned the embedding-trained codebook for embedding_b")
    assert(a.codebooks.map(_.map(_.toSeq).toSeq).toSeq !=
      b.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
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
    val p = Pq.seedPoolPlan(hashed, "vec_id", poolN = 100, m = 2)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      "pool rank guard lost its map-side WindowGroupLimit:\n" + p.take(1500))
  }

  test("seeding pool degrades to TakeOrdered branches below the window threshold") {
    import org.apache.spark.sql.functions._
    // Pq is a public operator: a plain session (windowGroupLimitThreshold
    // at Spark's default 1000 < poolN) must not fall into unbounded
    // single-task window sorts — the plan dispatches to a union of
    // per-subspace heap-bounded TakeOrdered branches with the same output
    val subs = clustered().select(
      col("vec_id"),
      posexplode(array((0 to 1).map(_ => col("embedding").cast("array<double>")): _*))
        .as(Seq("s", "sv")))
    val hashed = subs.withColumn("__h", xxhash64(col("vec_id"), col("s"), lit(1L)))
    val key = "spark.sql.optimizer.windowGroupLimitThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "1000")
      val pool = Pq.seedPoolPlan(hashed, "vec_id", poolN = 2000, m = 2)
      val plan = pool.queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"),
        "fallback tier did not plan as TakeOrdered:\n" + plan.take(1500))
      assert(!plan.contains("WindowGroupLimit"))
      spark.conf.set(key, "1000000")
      val viaWindow = Pq.seedPoolPlan(hashed, "vec_id", poolN = 2000, m = 2)
      assert(pool.collect().map(_.toString).sorted.sameElements(
        viaWindow.collect().map(_.toString).sorted))
    } finally spark.conf.set(key, prev)
  }
}
