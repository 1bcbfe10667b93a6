package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Components, Dedup, Ivf, Pq, Similarity}

/** The ×100 scale point for the scale-critical families (r14 verdict
  * item 6): every knee so far was found one decade up from the last
  * verified point (`j_fuzzy_keys` at ×10), so this probe takes ONLY the
  * dedup+sim+text document surfaces to ×100 of sf0.1 (500k docs, 200k
  * vectors, 2M part names) with the pair-count-honest disciplines and
  * ledgers wall growth vs the ×10 point for the same kernels.
  *
  * Honesty per surface (all established in ScaleProbe/MakeSf1):
  *  - docs: [[ScaleProbe.scaledDocs]] — fixed-width per-copy token
  *    suffix (2-digit, prefix-free to 100 copies) keeps shingle AND
  *    char-window spaces disjoint across copies; true dup pairs ×copies.
  *  - embeddings: [[ScaleProbe.scaledEmbPlanted]] at threshold 0.6
  *    (≈4.8σ) — the raw 0.35-band has a QUADRATIC chance-pair floor at
  *    64 dims (0.26 % of random pairs pass), so linear output is
  *    structurally impossible there; planted twins at 4.8σ make truth
  *    exactly `planted × copies`. IVF/PQ use [[ScaleProbe.scaledEmbSign]]
  *    (search cost is corpus-linear, no pair output to keep honest).
  *  - part names: per-copy 6-char tag (2-char code repeated ×3, codes
  *    pairwise-distinct ⟹ tag distance ≥ 3 > k = 2) — the MakeSf1
  *    supplier discipline extended past 26 copies; within-copy distances
  *    unchanged, cross-copy pairs out of band, true pairs ×copies.
  *
  * Corpora are scratch-materialized before timing (generators must not
  * ride the timer). Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     tools/run_main.sh graft.tools.ScaleHundred [copiesCsv] [probeCsv]
  * (defaults 10,100 and all probes).
  */
object ScaleHundred {

  /** Distance-preserving per-copy tag: same length everywhere (so the
    * length histogram shifts rigidly), pairwise tag distance ≥ 3.
    */
  def copyTag(i: Int): String = {
    val code = "" + ('a' + i / 26).toChar + ('a' + i % 26).toChar
    code * 3
  }

  def scaledNames(part: DataFrame, copies: Int): DataFrame =
    (0 until copies).map { i =>
      part.select(concat(col("p_name"), lit(copyTag(i))).as("name")).distinct()
    }.reduce(_ unionAll _)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val ladder = args.headOption.getOrElse("10,100")
      .split(",").map(_.trim.toInt).toSeq
    val only: Option[Set[String]] = args.lift(1).map(_.split(",").toSet)
    require(ladder.forall(_ <= 100), "scaledDocs suffix is 2-digit fixed-width")
    val spark = graft.GraftSession.tune(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val part0 = spark.read.parquet(s"$sfDir/part.parquet")
    docs0.count() // warmup

    def timed(name: String, copies: Int)(body: => Long): Unit =
      if (only.forall(_.contains(name))) {
        val t0 = System.nanoTime()
        val n = body
        println(f"""{"probe":"$name","copies":$copies,"rows":$n,"sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }

    for (c <- ladder) {
      val d = graft.pipeline.PipelineStage.scratch(
        ScaleProbe.scaledDocs(docs0, c), s"h100-docs-$c")

      timed("h100_minhash", c) {
        Dedup.minHashPairs(d, "doc_id", "text",
          k = 3, bands = 8, rowsPerBand = 4, threshold = 0.5).count()
      }
      timed("h100_simhash", c) {
        Dedup.simHashPairs(d, "doc_id", "text", maxHamming = 3).count()
      }
      timed("h100_substring_spans", c) {
        Dedup.duplicateSpans(d, "doc_id", "text", w = 40).count()
      }
      timed("h100_components", c) {
        Components.alternatingStar(
          d.select("doc_id"),
          Dedup.jaccardPairs(d, "doc_id", "text", k = 3, threshold = 0.5),
          "doc_id", "id_a", "id_b").count()
      }

      val names = graft.pipeline.PipelineStage.scratch(
        scaledNames(part0, c), s"h100-names-$c")
      timed("h100_edit_distance", c) {
        Dedup.editDistancePairs(names, id = "name", text = "name", maxDist = 2)
          .count()
      }

      val ep = graft.pipeline.PipelineStage.scratch(
        ScaleProbe.scaledEmbPlanted(emb0, c, planted = 200), s"h100-embp-$c")
      timed("h100_sim_lsh", c) {
        Similarity.lshNearDupPairs(ep, "vec_id", "embedding",
          dim = 64, bands = 8, planesPerBand = 8, threshold = 0.6, seed = 42L)
          .count()
      }

      val es = graft.pipeline.PipelineStage.scratch(
        ScaleProbe.scaledEmbSign(emb0, c), s"h100-embs-$c")
      timed("h100_sim_ivf", c) {
        val model = Ivf.train(es, "vec_id", "embedding", k = 16, iters = 3, seed = 11L)
        Ivf.searchTopK(es, "vec_id", "embedding", model,
          queryId = 0L, nprobe = 6, topK = 20).count()
      }
      timed("h100_sim_pq", c) {
        val model = Pq.train(es, "vec_id", "embedding",
          dim = 64, m = 8, k = 16, iters = 3, seed = 17L)
        val enc = Pq.encode(es, "vec_id", "embedding", model)
        val qv = es.filter(col("vec_id") === 0L)
          .select(col("embedding").cast("array<double>"))
          .collect().head.getSeq[Double](0).toArray
        Pq.searchTopK(enc, es, "vec_id", "embedding", model, qv,
          topK = 20, rerank = 100).count()
      }
    }
    spark.stop()
  }
}
