package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** Similarity search over the `embeddings` table (`array<float>` × 64):
  * brute-force baselines (oracle-checked against DuckDB list functions)
  * plus the LSH-bucketed scale path.
  */
object SimilarityQueries {

  private def emb(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.load(s, d, "embeddings")

  /** Cosine of every vector against vec_id 0 — the strongest oracle form
    * (no top-k cutoff, so float ties can't flip membership).
    */
  val simCosineAll: Q = Q(
    "sim_cosine_all",
    Some("""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
           |           FROM embeddings WHERE vec_id = 0)
           |SELECT vec_id,
           |  ROUND(list_dot_product(CAST(embedding AS DOUBLE[]), qv)
           |    / (SQRT(list_dot_product(CAST(embedding AS DOUBLE[]),
           |                             CAST(embedding AS DOUBLE[])))
           |       * SQRT(list_dot_product(qv, qv))), 6) AS cos
           |FROM embeddings CROSS JOIN q""".stripMargin),
    (s, dir) =>
      Similarity.scoreAgainst(emb(s, dir), "vec_id", "embedding", queryId = 0L)
        .select(col("vec_id"), round(col("cos"), 6).as("cos")))

  /** Brute-force cosine top-k (k = 20) against vec_id 0; round-then-order
    * with id tiebreak keeps the cut deterministic across engines.
    */
  val simTopK: Q = Q(
    "sim_topk",
    Some("""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
           |           FROM embeddings WHERE vec_id = 0)
           |SELECT vec_id,
           |  ROUND(list_dot_product(CAST(embedding AS DOUBLE[]), qv)
           |    / (SQRT(list_dot_product(CAST(embedding AS DOUBLE[]),
           |                             CAST(embedding AS DOUBLE[])))
           |       * SQRT(list_dot_product(qv, qv))), 6) AS cos
           |FROM embeddings CROSS JOIN q
           |ORDER BY cos DESC, vec_id LIMIT 20""".stripMargin),
    (s, dir) =>
      Similarity.topK(emb(s, dir), "vec_id", "embedding", queryId = 0L, k = 20))

  /** Brute-force embedding near-dup pairs (cosine ≥ 0.35 → ~270 pairs on
    * the synthetic data) — the embedding-cosine dedup baseline.
    */
  val simNearDup: Q = Q(
    "dedup_embcos_pairs",
    Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           |           FROM embeddings)
           |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           |  ROUND(list_dot_product(a.v, b.v)
           |    / (SQRT(list_dot_product(a.v, a.v))
           |       * SQRT(list_dot_product(b.v, b.v))), 6) AS cos
           |FROM e a JOIN e b ON a.vec_id < b.vec_id
           |WHERE list_dot_product(a.v, b.v)
           |    / (SQRT(list_dot_product(a.v, a.v))
           |       * SQRT(list_dot_product(b.v, b.v))) >= 0.35""".stripMargin),
    (s, dir) =>
      Similarity.nearDupPairs(emb(s, dir), "vec_id", "embedding", threshold = 0.35)
        .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos")))

  /** Random-hyperplane LSH near-dup pairs — sub-quadratic candidate
    * generation, exact verify. Engine-specific hashing → rows-only;
    * recall vs the brute-force query is pinned by a spec.
    */
  val simLsh: Q = Q(
    "sim_lsh_pairs",
    None,
    (s, dir) =>
      Similarity.lshNearDupPairs(
        emb(s, dir), "vec_id", "embedding",
        dim = 64, bands = 8, planesPerBand = 8, threshold = 0.35, seed = 42L))

  /** IVF-partitioned ANN: spherical k-means coarse quantizer, nprobe=4 of
    * k=16 cells probed — the bucketed-corpus scale path (rows-only;
    * recall vs brute force pinned by IvfSpec).
    */
  val simIvf: Q = Q(
    "sim_ivf_topk",
    None,
    (s, dir) => {
      val e = emb(s, dir)
      val model = graft.operators.Ivf.train(e, "vec_id", "embedding", k = 16, iters = 3, seed = 11L)
      graft.operators.Ivf.searchTopK(e, "vec_id", "embedding", model,
        queryId = 0L, nprobe = 4, topK = 20)
    })

  def all: Seq[Q] = Seq(simCosineAll, simTopK, simNearDup, simLsh, simIvf)
}
