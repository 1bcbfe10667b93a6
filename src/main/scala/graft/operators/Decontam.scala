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
}
