package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.VectorExpressions.dotFast

/** Product quantization (Jégou et al., public literature) — the
  * compression tier of large-scale ANN: the embedding is split into `m`
  * subvectors, each quantized to one of `k` per-subspace centroids, so a
  * 64-float vector becomes `m` small codes. At 100 TB this is what makes
  * the index FIT — 256 bytes of floats become 8 codes — and search
  * scores against a tiny per-query lookup table instead of raw vectors.
  *
  * Deterministic end to end: subspace codebooks are trained with the
  * same seeded k-means as [[Ivf]]; encoding and ADC scoring are pure
  * column expressions.
  *
  * Accuracy discipline: ADC scores are approximations — [[searchTopK]]
  * over-fetches `rerank` candidates by ADC and re-scores them EXACTLY
  * (the standard PQ + re-rank pipeline); PqSpec pins recall against
  * brute force.
  */
object Pq {

  /** Per-subspace codebooks: `m` × `k` × (dim/m) centroid array. */
  final case class Model(codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def k: Int = codebooks.head.length
    def subDim: Int = codebooks.head.head.length
  }

  private def subVec(vec: Column, sub: Int, subDim: Int): Column =
    slice(vec.cast("array<double>"), sub * subDim + 1, subDim)

  /** Train `m` independent subspace codebooks of size `k` with the seeded
    * IVF k-means (each subspace trains on its slice of the corpus).
    */
  def train(
      df: DataFrame,
      id: String,
      vec: String,
      dim: Int,
      m: Int,
      k: Int,
      iters: Int,
      seed: Long): Model = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    val books = (0 until m).map { s =>
      val sliced = df.select(
        col(id),
        subVec(col(vec), s, subDim).as("__sub"))
      Ivf.train(sliced, id, "__sub", k, iters, seed + s).centroids
    }
    Model(books.toArray)
  }

  /** Encode: adds `codes` (array<int>, length m) — the per-subspace
    * nearest-centroid ids. Everything else is dropped except `id`.
    */
  def encode(df: DataFrame, id: String, vec: String, model: Model): DataFrame = {
    val codeCols = (0 until model.m).map { s =>
      val sub = subVec(col(vec), s, model.subDim)
      val scored = model.codebooks(s).zipWithIndex.map { case (c, j) =>
        // nearest by L2 = max (dot − ||c||²/2) on the raw (unnormalized)
        // subvector — constant per centroid, exact argmin arithmetic
        struct(
          round(dotFast(sub, typedlit(c.toSeq))
            - lit(c.map(x => x * x).sum / 2.0), 9).as("s"),
          lit(-j).as("negj"))
      }
      (-array_max(array(scored: _*)).getField("negj")).cast("int")
    }
    df.select(col(id), array(codeCols: _*).as("codes"))
  }

  /** ADC top-k with exact re-rank: score every encoded row against the
    * query's per-subspace dot-product table (m×k driver-side doubles),
    * keep the best `rerank` by ADC, re-score those exactly against the
    * raw vectors, return the true top `topK`.
    */
  def searchTopK(
      encoded: DataFrame,
      raw: DataFrame,
      id: String,
      vec: String,
      model: Model,
      queryVec: Array[Double],
      topK: Int,
      rerank: Int): DataFrame = {
    require(queryVec.length == model.m * model.subDim)
    // flat m×k lookup table: table(s*k + j) = <query_sub_s, centroid_sj>
    val table: Seq[Double] = (0 until model.m).flatMap { s =>
      val q = queryVec.slice(s * model.subDim, (s + 1) * model.subDim)
      model.codebooks(s).map(c => c.zip(q).map { case (a, b) => a * b }.sum)
    }
    val adc = aggregate(
      zip_with(
        col("codes"),
        sequence(lit(0), lit(model.m - 1)),
        (code, s) => element_at(typedlit(table), s * model.k + code + 1)),
      lit(0.0), (acc, x) => acc + x)
    val shortlist = encoded
      .withColumn("__adc", adc)
      .orderBy(col("__adc").desc, col(id))
      .limit(rerank)
      .select(id)
    // exact re-rank of the shortlist only
    raw.join(shortlist, id)
      .withColumn(
        "cos",
        round(
          dotFast(col(vec).cast("array<double>"), typedlit(queryVec.toSeq))
            / (sqrt(dotFast(col(vec).cast("array<double>"), col(vec).cast("array<double>")))
              * lit(math.sqrt(queryVec.map(x => x * x).sum))), 6))
      .orderBy(col("cos").desc, col(id))
      .limit(topK)
      .select(col(id), col("cos"))
  }
}
