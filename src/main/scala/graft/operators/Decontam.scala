package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-pipeline gate that removes
  * (or flags) corpus documents overlapping an evaluation/benchmark set,
  * measured as the fraction of a document's distinct k-gram shingles that
  * appear anywhere in the benchmark.
  *
  * Scale shape: the benchmark shingle set is DISTINCT-reduced before the
  * membership join, and benchmarks are tiny next to a 100 TB corpus, so
  * Spark broadcasts it and the corpus pass stays shuffle-free on the
  * corpus side (one shuffle for the per-doc count aggregation). For a
  * pathological benchmark too big to broadcast the same plan degrades to
  * a shuffled left-semi join — still linear, never quadratic. Shingles
  * travel as xxhash64 longs, not k-gram strings.
  */
object Decontam {

  /** Per-corpus-document benchmark overlap: (id, n_sh, n_hit, overlap,
    * contaminated). Documents with fewer than k tokens have no shingles
    * and are absent (nothing to test). Counts are exact integers; the
    * overlap ratio is one bigint/bigint IEEE division — portable.
    */
  def overlap(
      corpus: DataFrame,
      benchmark: DataFrame,
      id: String,
      text: String,
      k: Int,
      threshold: Double): DataFrame = {
    val cs = Dedup.shingles(corpus, id, text, k)
      .select(col(id), xxhash64(col("shingle")).as("h"))
    val bs = Dedup.shingles(benchmark, id, text, k)
      .select(xxhash64(col("shingle")).as("h"))
      .distinct()
      .withColumn("__bhit", lit(1))
    // Membership resolved by a broadcast LEFT join so n_sh and n_hit come
    // out of ONE aggregate over the exploded shingles (the semi-join form
    // forced two independent aggregates over the same relation — the
    // exploded corpus was shuffled and counted twice).
    val ratio = col("n_hit").cast("double") / col("n_sh")
    cs.join(broadcast(bs), Seq("h"), "left")
      .groupBy(col(id))
      .agg(
        count(lit(1)).as("n_sh"),
        count(col("__bhit")).as("n_hit"))
      .withColumn("overlap", ratio)
      .withColumn("contaminated", ratio >= lit(threshold))
  }

  /** The cleaning form: corpus rows whose overlap stays below the
    * threshold (documents too short to shingle are conservatively KEPT —
    * they can't meaningfully leak a benchmark).
    */
  def clean(
      corpus: DataFrame,
      benchmark: DataFrame,
      id: String,
      text: String,
      k: Int,
      threshold: Double): DataFrame = {
    val flagged = overlap(corpus, benchmark, id, text, k, threshold)
      .filter(col("contaminated"))
      .select(col(id))
    corpus.join(flagged, Seq(id), "left_anti")
  }

  /** Upper bound on a broadcastable benchmark embedding set — same
    * rationale as [[Similarity.MaxHardNegQueries]]: rows × dim × 8 B must
    * sit comfortably inside an executor's broadcast budget.
    */
  val MaxBenchVectors: Long = 100000L

  /** SEMANTIC decontamination — the embedding-space sibling of
    * [[overlap]]: a corpus document is contaminated when its embedding is
    * within cosine `threshold` of ANY benchmark embedding, catching the
    * paraphrased leaks that n-gram shingles miss (the reason modern
    * pipelines run both gates). Output: (`id`, max_cos rounded to 6,
    * contaminated) per corpus vector.
    *
    * Scale shape: benchmarks are tiny next to a 100 TB corpus, so the
    * benchmark side is norm-precomputed and BROADCAST; the corpus side is
    * one shuffle-free scoring scan (codegen'd [[graft.plans
    * .VectorExpressions.dotFast]] per candidate) followed by a per-id max
    * aggregate — never a corpus×corpus product. A benchmark over
    * [[MaxBenchVectors]] fails loudly (assert_true) instead of silently
    * building an unbroadcastable relation; route such sets through the
    * ANN tiers instead ([[Ivf.searchTopKBatch]]).
    */
  def semanticOverlap(
      corpus: DataFrame,
      benchmark: DataFrame,
      id: String,
      vec: String,
      threshold: Double,
      maxBench: Long = MaxBenchVectors): DataFrame = {
    val dotF = graft.plans.VectorExpressions.dotFast _
    val bGuard = benchmark.agg(count(lit(1)).as("__bn"))
    val b = benchmark
      .select(col(vec).cast("array<double>").as("__bv"))
      .withColumn("__bnorm", sqrt(dotF(col("__bv"), col("__bv"))))
      .crossJoin(broadcast(bGuard))
      .filter(assert_true(
        col("__bn") <= lit(maxBench),
        format_string(
          "semanticOverlap broadcasts the benchmark set: %d vectors is over the " +
            "broadcast-safe bound %d. Score large benchmark sets through the ANN " +
            "tiers (Ivf.searchTopKBatch).",
          col("__bn"), lit(maxBench))).isNull)
      .drop("__bn")
    val c = corpus
      .select(col(id), col(vec).cast("array<double>").as("__v"))
      .withColumn("__vnorm", sqrt(dotF(col("__v"), col("__v"))))
    c.join(broadcast(b))
      .groupBy(col(id))
      .agg(max(
        dotF(col("__v"), col("__bv")) / (col("__vnorm") * col("__bnorm"))).as("__mc"))
      .select(
        col(id),
        round(col("__mc"), 6).as("max_cos"),
        (col("__mc") >= threshold).as("contaminated"))
  }
}
