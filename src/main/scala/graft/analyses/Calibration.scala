package graft.analyses

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Charge normalization and Coulomb calibration (SURVEY §2.8 N7/N9, §2.2
  * P7/P8) — the reference's region-median normalization and theory/measured
  * unit conversion, re-expressed as conditional aggregates + broadcast
  * joins (no per-group driver loops).
  */
object Calibration {

  /** N7 — normalized collected charge (reference `scripts/utils.py:79-116`):
    * per (Pad, n_pulse), subtract the median charge of the METAL region
    * (no signal expected) and divide by the median of the SILICON region
    * (full signal expected). Region masks depend on whole-scan aggregates
    * (min/max distance) — computed as a 1-row broadcast, then the
    * per-(pad, pulse) medians via conditional aggregation
    * (`median(when(mask, charge))`), one shuffle.
    */
  def normalizedCharge(
      scan: DataFrame,
      windowSize: Double,
      laserSigma: Double = 9e-6,
      interPixelDistance: Double = 100e-6): DataFrame = {
    val d = col("`Distance (m)`")
    val q = col("`Collected charge (V s)`")
    val mid = scan.agg(
      ((max(d) + min(d)) / 2).as("__mid"))
    val withMid = scan.crossJoin(broadcast(mid))
    val m = col("__mid")
    val metal =
      (d < m - windowSize / 2 - 2 * laserSigma) ||
        (d > m + windowSize / 2 + 2 * laserSigma)
    val silicon = when(col("Pad") === "left",
      (d > m - windowSize / 2 + 2 * laserSigma) &&
        (d < m - interPixelDistance / 2 - 2 * laserSigma))
      .otherwise(
        (d < m + windowSize / 2 - 2 * laserSigma) &&
          (d > m + interPixelDistance / 2 + 2 * laserSigma))
    val stats = withMid
      .groupBy("Pad", "n_pulse")
      .agg(
        median(when(metal, q)).as("__offset"),
        median(when(silicon, q)).as("__silicon_median"))
      // scale is the silicon median AFTER offset subtraction
      .withColumn("__scale", col("__silicon_median") - col("__offset"))
      .drop("__silicon_median")
    withMid
      .join(broadcast(stats), Seq("Pad", "n_pulse"))
      .withColumn("Normalized collected charge", (q - col("__offset")) / col("__scale"))
      .drop("__mid", "__offset", "__scale")
  }

  /** P8 — theoretical PIN charge in Coulomb for a silicon thickness
    * (reference `scripts/create_calibration_for_Coulomb_conversion_in_
    * beta_setup.py:56-58`).
    */
  def pinChargeTheory(thicknessMeters: Double): Double = {
    val elementaryCharge = 1.602176634e-19
    val tUm = thicknessMeters / 1e-6
    elementaryCharge * (31 * math.log(tUm) + 128) * tUm / 3.65
  }

  /** N9 — Coulomb conversion factor from PIN measurements (reference
    * `:54-73`): mean/std of the measured mpv charge above `minVoltage`,
    * theory/measured ratio. Returns a 1-row DataFrame
    * (`mean (C/V/s)`, `std (C/V/s)`).
    */
  def coulombConversionFactor(
      pinCharges: DataFrame, // (`Device name`, `Bias voltage (V)`, `Collected charge (V s) x_mpv value_on_data`)
      thicknessMeters: Double = 50e-6,
      minVoltage: Double = 100): DataFrame = {
    val theory = pinChargeTheory(thicknessMeters)
    val perDevice = pinCharges
      .filter(col("`Bias voltage (V)`") >= minVoltage)
      .groupBy("Device name")
      .agg(
        avg(col("`Collected charge (V s) x_mpv value_on_data`")).as("m"),
        stddev_samp(col("`Collected charge (V s) x_mpv value_on_data`")).as("s"))
    perDevice.agg(
      (lit(theory) / avg(col("m"))).as("mean (C/V/s)"),
      // reference propagates only the measured std (theory std unknown)
      sqrt(pow(lit(0.0), 2) + avg(col("s"))).as("std (C/V/s)"))
  }

  /** N9 application + P7 error propagation: convert every `(V s)` column
    * by name pattern; `std`-named columns get quadrature propagation
    * `sqrt(x² + σ_factor²)` (reference `:69-73`).
    */
  def applyCoulombConversion(df: DataFrame, factorMean: Double, factorStd: Double): DataFrame =
    df.columns.filter(_.contains("(V s)")).foldLeft(df) { (acc, c) =>
      val converted = col(s"`$c`") * factorMean
      val newCol = c.replace("(V s)", "(C)")
      val valueExpr: Column =
        if (c.contains("std")) sqrt(pow(converted, 2) + pow(lit(factorStd), 2))
        else converted
      acc.withColumn(newCol, valueExpr)
    }
}
