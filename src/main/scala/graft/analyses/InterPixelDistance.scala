package graft.analyses

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.fit.FitAggregators

/** Inter-pixel distance estimation (reference
  * `scripts/calculate_inter_pixel_distance_for_single_1D_scan.py` +
  * `scripts/fit_erf_and_calculate_calibration_factor.py`, SURVEY §3.3):
  * per (measurement, pad) the normalized-charge profile crosses each
  * threshold at an interpolated distance; IPD(threshold) = right-pad
  * crossing − left-pad crossing. All crossings are per-group aggregators
  * — measurements fan out across executors.
  */
object InterPixelDistance {

  val DefaultThresholds: Seq[Int] = Seq(8, 22, 37, 50, 63, 77, 92)

  /** @param profile (measurement_name, Pad ∈ {left, right},
    *                `Distance (m)`, `Normalized collected charge`)
    * @return one row per measurement: `IPD (m) at t%` columns
    */
  def ipd(profile: DataFrame, thresholds: Seq[Int] = DefaultThresholds): DataFrame = {
    // left pad: charge falls through the threshold moving right;
    // right pad: charge rises — same crossing aggregator either way.
    val crossingAggs = thresholds.map { t =>
      FitAggregators.crossingAt(t / 100.0)(
        col("`Distance (m)`"), col("`Normalized collected charge`"))
        .as(s"x_$t")
    }
    val perPad = profile
      .groupBy("measurement_name", "Pad")
      .agg(crossingAggs.head, crossingAggs.tail: _*)
    val left = perPad.filter(col("Pad") === "left").drop("Pad")
    val right = perPad.filter(col("Pad") === "right").drop("Pad")
    // FULL outer: a measurement missing one pad (e.g. a truncated scan)
    // keeps its row with null IPDs — the same degenerate-input behavior
    // as the SQL oracle's conditional-aggregation form, which was only
    // visible once a tiny scale factor cut the synthetic profile mid-
    // measurement (sf0.001 drive, round 8)
    val joined = left.alias("l").join(right.alias("r"), Seq("measurement_name"), "full_outer")
    val ipdCols = thresholds.map(t =>
      abs(col(s"r.x_$t") - col(s"l.x_$t")).as(s"IPD (m) at $t%"))
    joined.select((col("measurement_name") +: ipdCols): _*)
  }

  /** Distance calibration from the two erf fits (reference
    * `scripts/fit_erf_and_calculate_calibration_factor.py:159-181`):
    * scale = window / |x0_L − x0_R|, offset = |x0_L + x0_R| / 2.
    */
  def calibration(profile: DataFrame, windowSize: Double): DataFrame = {
    val fits = profile
      .groupBy("measurement_name", "Pad")
      .agg(FitAggregators.erfFit(
        col("`Distance (m)`"), col("`Normalized collected charge`")).as("fit"))
      .select(col("measurement_name"), col("Pad"), col("fit.x0").as("x0"))
    val l = fits.filter(col("Pad") === "left").select(col("measurement_name"), col("x0").as("x0_l"))
    val r = fits.filter(col("Pad") === "right").select(col("measurement_name"), col("x0").as("x0_r"))
    l.join(r, "measurement_name")
      .select(
        col("measurement_name"),
        (lit(windowSize) / abs(col("x0_l") - col("x0_r"))).as("scale"),
        (abs(col("x0_l") + col("x0_r")) / 2).as("offset"))
  }
}
