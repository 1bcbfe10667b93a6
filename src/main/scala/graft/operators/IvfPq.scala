package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF+PQ — the composed large-scale ANN index (the FAISS `IVFx,PQy`
  * shape, from the public literature): the IVF coarse quantizer prunes
  * the corpus to `nprobe`/k cells BEFORE any scoring, PQ codes make the
  * per-row score a tiny table lookup instead of a 64-float dot product,
  * and an exact re-rank over the short list restores true-cosine
  * ordering. At 100 TB this is the only shape that works end to end:
  * partition pruning bounds I/O, compression bounds memory, re-rank
  * bounds the approximation error.
  *
  * Deliberately a thin COMPOSITION of [[Ivf]] and [[Pq]] — the index is
  * one table (id, cluster, codes) and search is probe-filter +
  * [[Pq.searchTopK]], so every deterministic-tie and oracle property
  * proven for the parts carries over to the whole.
  */
object IvfPq {

  /** Build the index table: (id, cluster, codes). Write it partitioned
    * by `cluster` (see [[Ivf.writePartitioned]]) and a probe scan is
    * partition-pruned before a single row is read.
    */
  def index(
      df: DataFrame,
      id: String,
      vec: String,
      ivf: Ivf.Model,
      pq: Pq.Model): DataFrame =
    Ivf.assign(df, vec, ivf).select(col(id), col("cluster"))
      .join(Pq.encode(df, id, vec, pq), id)

  /** Probe-pruned ADC top-k with exact re-rank. `indexed` is the
    * [[index]] output (or its partitioned read-back); `raw` supplies the
    * exact vectors for the re-rank join.
    */
  def searchTopK(
      indexed: DataFrame,
      raw: DataFrame,
      id: String,
      vec: String,
      ivf: Ivf.Model,
      pq: Pq.Model,
      queryVec: Array[Double],
      nprobe: Int,
      topK: Int,
      rerank: Int): DataFrame = {
    val qn = math.sqrt(queryVec.map(x => x * x).sum)
    val q0 = queryVec.map(_ / qn)
    // nprobe nearest coarse cells, ties to the smaller cell id — the
    // same ordering Ivf.searchPartitioned uses
    val probes = ivf.centroids.zipWithIndex
      .map { case (c, j) => (j, c.zip(q0).map { case (a, b) => a * b }.sum) }
      .sortBy { case (j, s) => (-s, j) }
      .take(nprobe)
      .map(_._1)
    Pq.searchTopK(
      indexed.filter(col("cluster").isin(probes: _*)),
      raw, id, vec, pq, queryVec, topK = topK, rerank = rerank)
  }
}
