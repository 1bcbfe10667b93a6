package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ivf, LmScore, ModelStore, Pq}

/** Persisted models must round-trip EXACTLY: bit-equal parameters and
  * therefore bit-identical downstream search/score results — the
  * train-once-per-corpus contract (TrainCache is only once-per-JVM).
  */
class ModelStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("IVF model round-trips bit-exact and searches identically") {
    val m = Ivf.train(emb, "vec_id", "embedding", k = 8, iters = 3, seed = 42L)
    val dir = Files.createTempDirectory("graft_modelstore_ivf").toString + "/m"
    ModelStore.saveIvf(spark, m, dir)
    val loaded = ModelStore.loadIvf(spark, dir)
    assert(loaded.centroids.length == m.centroids.length)
    assert(loaded.centroids.zip(m.centroids).forall { case (a, b) => a.sameElements(b) })
    val orig = Ivf.searchTopK(emb, "vec_id", "embedding", m, queryId = 0L,
      nprobe = 3, topK = 10).collect().map(_.toString).toSeq
    val reload = Ivf.searchTopK(emb, "vec_id", "embedding", loaded, queryId = 0L,
      nprobe = 3, topK = 10).collect().map(_.toString).toSeq
    assert(orig == reload && orig.nonEmpty)
  }

  test("PQ model round-trips bit-exact and ADC-searches identically") {
    val dim = emb.selectExpr("size(embedding)").head().getInt(0)
    val m = Pq.train(emb, "vec_id", "embedding", dim = dim, m = 4, k = 16,
      iters = 3, seed = 7L)
    val dir = Files.createTempDirectory("graft_modelstore_pq").toString + "/m"
    ModelStore.savePq(spark, m, dir)
    val loaded = ModelStore.loadPq(spark, dir)
    assert(loaded.codebooks.length == m.codebooks.length)
    for (s <- m.codebooks.indices) {
      assert(loaded.codebooks(s).length == m.codebooks(s).length)
      assert(loaded.codebooks(s).zip(m.codebooks(s))
        .forall { case (a, b) => a.sameElements(b) })
    }
    val qv = emb.filter("vec_id = 0")
      .selectExpr("cast(embedding as array<double>)").head()
      .getSeq[Double](0).toArray
    val enc = Pq.encode(emb, "vec_id", "embedding", m)
    val orig = Pq.searchTopK(enc, emb, "vec_id", "embedding", m, qv,
      topK = 10, rerank = 30).collect().map(_.toString).toSeq
    val encL = Pq.encode(emb, "vec_id", "embedding", loaded)
    val reload = Pq.searchTopK(encL, emb, "vec_id", "embedding", loaded, qv,
      topK = 10, rerank = 30).collect().map(_.toString).toSeq
    assert(orig == reload && orig.nonEmpty)
  }

  test("LM model round-trips bit-exact and scores identically") {
    val m = LmScore.train(docs, "doc_id", "text")
    val dir = Files.createTempDirectory("graft_modelstore_lm").toString + "/m"
    ModelStore.saveLm(spark, m, dir)
    val loaded = ModelStore.loadLm(spark, dir)
    assert(loaded.unseenMicros == m.unseenMicros)
    assert(loaded.triMicros.size == m.triMicros.size)
    assert(m.triMicros.forall { case (k, v) => loaded.triMicros.get(k).contains(v) })
    assert(m.preMicros.forall { case (k, v) => loaded.preMicros.get(k).contains(v) })
    val orig = LmScore.scoreWith(m, docs, "doc_id", "text")
      .collect().map(_.toString).sorted.toSeq
    val reload = LmScore.scoreWith(loaded, docs, "doc_id", "text")
      .collect().map(_.toString).sorted.toSeq
    assert(orig == reload && orig.nonEmpty)
  }
}
