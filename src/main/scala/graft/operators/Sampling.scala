package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic data-mixing for training pipelines: which documents make
  * the cut is a pure function of (id, seed) — reproducible on any
  * engine, any partitioning, any rerun, and stable under corpus appends
  * (a doc's fate never depends on other rows).
  *
  *  - [[proportional]]: per-stratum keep-percentages (up-/down-weight
  *    sources or languages in the mix) via the same multiplicative-hash
  *    bucket as [[Splits]].
  *  - [[tokenBudgetCap]]: cap each stratum at a token budget — docs are
  *    ordered by a deterministic per-doc hash (an unbiased shuffle, with
  *    id tiebreak) and kept while the running token total fits. ONE
  *    window pass per stratum partition; the hash order means the kept
  *    set is a uniform sample of the stratum, not its head.
  */
object Sampling {

  /** Keep rows where the id-hash bucket falls under `pct` (a per-row
    * Column, so callers express per-stratum percentages as a CASE over
    * the stratum column).
    */
  def proportional(df: DataFrame, id: String, pct: Column, seed: Int): DataFrame =
    df.filter(Splits.bucket100(col(id), seed) < pct)

  /** Deterministic shuffle key in [0, 2³²): multiplicative hash of the
    * id — the ordering is uniform and engine-portable.
    */
  def shuffleKey(id: Column, seed: Int): Column =
    pmod(pmod(id + lit(seed), lit(100000L)) * lit(2654435761L), lit(4294967296L))

  /** Keep a uniform sample of each stratum whose `tokens` sum to at most
    * `budget`: hash-order the stratum, keep while the running total
    * (including the current doc) fits.
    */
  def tokenBudgetCap(
      df: DataFrame,
      id: String,
      strata: Seq[String],
      tokens: Column,
      budget: Long,
      seed: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(shuffleKey(col(id), seed), col(id))
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("__cum", sum(tokens).over(w))
      .filter(col("__cum") <= budget)
      .drop("__cum")
  }
}
