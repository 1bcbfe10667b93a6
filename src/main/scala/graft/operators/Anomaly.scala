package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust anomaly flags over a pre-aggregated metric table (per-key
  * time-bucket counts, rates, sums): a point is anomalous when its
  * absolute deviation from the per-key MEDIAN exceeds
  * `k · 1.4826 · MAD` — the robust z-score, immune to the anomalies
  * themselves inflating the baseline (the failure mode of mean/std
  * thresholds).
  *
  * Both medians are SQL-standard type-1 (smallest value whose rank
  * reaches ⌈n/2⌉) over EXACT integer ranks, so the flags are
  * deterministic and oracle-replayable — no interpolation, no float
  * percentiles. Windows partition by the metric KEY over the
  * pre-aggregated relation: per-partition size is the key's bucket
  * count (bounded by the time span, not the corpus), so the shape holds
  * at 100 TB where the raw events don't fit but the per-key hourly
  * series trivially does.
  */
object Anomaly {

  /** Type-1 median of `v` per `keys`, joined back as column `out`. */
  private def medianBack(
      df: DataFrame, keys: Seq[String], v: String, out: String): DataFrame = {
    val kcols = keys.map(col)
    val w = Window.partitionBy(kcols: _*).orderBy(col(v))
    val med = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy(kcols: _*)))
      .filter(col("__rn") >= ceil(lit(0.5) * col("__cnt")))
      .groupBy(kcols: _*)
      .agg(min(col(v)).as(out))
    df.join(med, keys)
  }

  /** Flag rows of `df` (a pre-aggregated metric relation) whose `value`
    * deviates from its key-median by more than `k · 1.4826 · MAD`.
    * Output: input columns + `med`, `mad`, `is_anomaly`.
    */
  def robustFlags(
      df: DataFrame,
      keys: Seq[String],
      value: String,
      k: Double = 3.0): DataFrame = {
    require(k > 0, s"k $k must be positive")
    val withMed = medianBack(df, keys, value, "med")
      .withColumn("__dev", abs(col(value) - col("med")))
    medianBack(withMed, keys, "__dev", "mad")
      .withColumn(
        "is_anomaly",
        col("__dev") > lit(k) * lit(1.4826) * col("mad"))
      .drop("__dev")
  }

  /** One-sided CUSUM control chart (Page 1954) over an INTEGER-valued
    * pre-aggregated bucket series, without the recursive clamp:
    * `S_t = max(0, S_{t−1} + d_t)` over the demeaned increments equals
    * `P_t − min(0, min_{j≤t} P_j)` on their prefix sums, so two running
    * windows replace the recursion. The target is `⌊Σx / n⌋` (integer
    * division, not a float mean), so the whole statistic is exact
    * integer and engine-portable with no rounding. Windows run over the
    * pre-aggregated series — bounded by the time span, the e9
    * discipline ([[graft.plans.ScalarExpressions.singlePartitionKey]]).
    * Output: input columns + `cusum`.
    */
  def cusum(buckets: DataFrame, t: String, x: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tot = buckets.agg(
      sum(col(x)).as("__tot"), count(lit(1)).as("__n"))
    val w = Window.partitionBy(
      graft.plans.ScalarExpressions.singlePartitionKey(col(t)))
      .orderBy(t).rowsBetween(Window.unboundedPreceding, 0)
    buckets.crossJoin(broadcast(tot))
      .withColumn("__pf", sum(col(x) - expr("__tot div __n")).over(w))
      .withColumn("__lo", least(min(col("__pf")).over(w), lit(0L)))
      .withColumn("cusum", col("__pf") - col("__lo"))
      .drop("__tot", "__n", "__pf", "__lo")
  }
}
