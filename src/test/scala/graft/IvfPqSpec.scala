package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ivf, IvfPq, Pq, Similarity}

class IvfPqSpec extends AnyFunSuite {
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

  test("IVF+PQ with trained models recovers brute-force top-10; full probe = plain PQ") {
    val df = clustered()
    val ivf = Ivf.train(df, "vec_id", "embedding", k = 4, iters = 3, seed = 11L)
    val pq = Pq.train(df, "vec_id", "embedding", dim = 16, m = 4, k = 8,
      iters = 4, seed = 3L)
    val indexed = IvfPq.index(df, "vec_id", "embedding", ivf, pq)
    assert(indexed.columns.toSet == Set("vec_id", "cluster", "codes"))
    assert(indexed.count() == 200)
    val qv = df.filter(col("vec_id") === 0L).collect().head
      .getSeq[Float](1).map(_.toDouble).toArray
    // pruned search: probing 2 of 4 cells still recovers the true top-10
    // (rerank covers ADC tie classes, as in PqSpec)
    val got = IvfPq.searchTopK(indexed, df, "vec_id", "embedding", ivf, pq, qv,
      nprobe = 2, topK = 10, rerank = 60)
      .collect().map(_.getLong(0)).toSet
    val brute = Similarity.topK(df, "vec_id", "embedding", queryId = 0L, k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(got.intersect(brute).size >= 8, s"recall ${got.intersect(brute).size}/10")
    // composition invariant: probing EVERY cell degenerates to plain PQ
    val full = IvfPq.searchTopK(indexed, df, "vec_id", "embedding", ivf, pq, qv,
      nprobe = ivf.k, topK = 10, rerank = 60)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val plain = Pq.searchTopK(
      Pq.encode(df, "vec_id", "embedding", pq), df, "vec_id", "embedding", pq, qv,
      topK = 10, rerank = 60)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full == plain)
  }
}
