package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.fit.FitAggregators
import graft.functions.Stats
import graft.sources.Tables

/** Numeric-kernel queries (SURVEY §2.8 N1–N6): per-group curve fits as
  * aggregators. Rows-only for the driver (fits are tolerance-checked by
  * specs per BASELINE.md, never hash-compared); every fit is deterministic
  * (Nelder–Mead from data-derived starts, no RNG).
  */
object FitQueries {

  /** Per-group histogram (group, bin_center, n) of `x` — the input shape
    * every binned fit consumes.
    */
  private def groupedHistogram(
      df: DataFrame,
      groupCol: String,
      x: org.apache.spark.sql.Column,
      lo: Double,
      hi: Double,
      nBins: Int): DataFrame = {
    val w = (hi - lo) / nBins
    val bucket = least(greatest(floor((x - lit(lo)) / lit(w)), lit(0L)), lit(nBins - 1L))
    df.select(col(groupCol), bucket.cast("long").as("bucket"))
      .groupBy(groupCol, "bucket")
      .agg(count(lit(1)).as("n"))
      .withColumn("center", lit(lo) + (col("bucket") + lit(0.5)) * lit(w))
  }

  /** N1: Gaussian fit per group over the histogram of per-order quantity
    * sums (CLT makes them near-normal — the Δt-fit shape of
    * `scripts/time_resolution_beta_scan.py:177-193`).
    */
  val n1Gaussian: Q = Q(
    "n1_gaussian_fit",
    None,
    (s, dir) => {
      val perOrder = Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_orderkey")
        .agg(sum("l_quantity").as("qty"))
      groupedHistogram(perOrder, "l_returnflag", col("qty"), 0.0, 250.0, 25)
        .groupBy("l_returnflag")
        .agg(FitAggregators.gaussianFit(col("center"), col("n").cast("double")).as("fit"))
        .select(col("l_returnflag"), col("fit.mu"), col("fit.sigma"), col("fit.amplitude"))
    })

  /** N2: Langauss fit per group over the skewed per-order revenue
    * histogram (the collected-charge shape of
    * `scripts/clean_beta_scan.py:60-83`).
    */
  val n2Langauss: Q = Q(
    "n2_langauss_fit",
    None,
    (s, dir) => {
      val perOrder = Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_orderkey")
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      groupedHistogram(perOrder, "l_returnflag", col("rev"), 0.0, 400000.0, 40)
        .groupBy("l_returnflag")
        .agg(FitAggregators.langaussFit(col("center"), col("n").cast("double")).as("fit"))
        .select(col("l_returnflag"), col("fit.mpv"), col("fit.xi"), col("fit.sigma"), col("fit.amplitude"))
    })

  /** N3: erf transition fit per group over the quantity ECDF (the pad
    * profile shape of `scripts/fit_erf_and_calculate_calibration_factor
    * .py:19-73`).
    */
  val n3Erf: Q = Q(
    "n3_erf_fit",
    None,
    (s, dir) => {
      val ecdf = Stats.ecdf(
        Tables.load(s, dir, "lineitem").select("l_returnflag", "l_quantity"),
        Seq("l_returnflag"), col("l_quantity"))
        .groupBy("l_returnflag", "l_quantity")
        .agg(max("ecdf").as("y"))
      ecdf
        .groupBy("l_returnflag")
        .agg(FitAggregators.erfFit(col("l_quantity"), col("y")).as("fit"))
        .select(col("l_returnflag"), col("fit.x0"), col("fit.sigma"), col("fit.yScale"), col("fit.yOffset"))
    })

  /** N4/N6: interpolated level crossings of the group ECDF profile at the
    * reference's threshold style ({25, 50, 75}% here; the IPD thresholds
    * of `scripts/calculate_inter_pixel_distance_for_single_1D_scan.py:72`).
    */
  val n4Crossings: Q = Q(
    "n4_interp_crossing",
    None,
    (s, dir) => {
      val ecdf = Stats.ecdf(
        Tables.load(s, dir, "lineitem").select("l_returnflag", "l_quantity"),
        Seq("l_returnflag"), col("l_quantity"))
        .groupBy("l_returnflag", "l_quantity")
        .agg(max("ecdf").as("y"))
      ecdf
        .groupBy("l_returnflag")
        .agg(
          FitAggregators.crossingAt(0.25)(col("l_quantity"), col("y")).as("x25"),
          FitAggregators.crossingAt(0.50)(col("l_quantity"), col("y")).as("x50"),
          FitAggregators.crossingAt(0.75)(col("l_quantity"), col("y")).as("x75"))
    })

  /** S13 support: the fitted-curve sample table a plot layer would
    * consume — Gaussian fits from N1 sampled on a per-group grid.
    */
  val n1CurveSamples: Q = Q(
    "n1_curve_samples",
    None,
    (s, dir) => {
      val fits = n1Gaussian.run(s, dir)
      graft.fit.CurveTables.gaussianSamples(fits, Seq("l_returnflag"), nPoints = 50)
    })

  def all: Seq[Q] = Seq(n1Gaussian, n2Langauss, n3Erf, n4Crossings, n1CurveSamples)
}
