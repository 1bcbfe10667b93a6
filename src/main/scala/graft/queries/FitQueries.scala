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

  /** Shared ECDF feeder for the erf/crossing family: the distinct-value
    * quantity profile (l_returnflag, l_quantity, y) via the SCALE-SAFE
    * value-counts tier ([[Stats.ecdfPoints]]) — hash aggregate with
    * map-side partials, window sort only over the bounded distinct-value
    * table. Value-identical to the former
    * `Stats.ecdf(...).groupBy(g, x).agg(max("ecdf"))` window form (and to
    * the oracles' `cume_dist ... GROUP BY, MAX(cd)` CTE): cume_dist at a
    * value is cumulative-count ÷ group-total, the same integer division
    * the running sum performs — but no single task ever holds a group's
    * full row history.
    */
  private def ecdfProfile(s: SparkSession, dir: String): DataFrame =
    Stats.ecdfPoints(
      Tables.load(s, dir, "lineitem").select("l_returnflag", "l_quantity"),
      Seq("l_returnflag"), "l_quantity")
      .withColumnRenamed("ecdf", "y")

  /** Shared N1 histogram feeder: per-group (center, n) profile of the
    * per-order quantity sums.
    */
  private def n1Histogram(s: SparkSession, dir: String): DataFrame = {
    val perOrder = Tables.load(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_orderkey")
      .agg(sum("l_quantity").as("qty"))
    groupedHistogram(perOrder, "l_returnflag", col("qty"), 0.0, 250.0, 25)
  }

  /** The N1 iterative fit params (l_returnflag, mu, sigma, amplitude) —
    * consumed by the curve-sample query; the registry row itself is the
    * certificate below.
    */
  private def n1FitParams(s: SparkSession, dir: String): DataFrame =
    n1Histogram(s, dir)
      .groupBy("l_returnflag")
      .agg(FitAggregators.gaussianFit(col("center"), col("n").cast("double")).as("fit"))
      .select(col("l_returnflag"), col("fit.mu"), col("fit.sigma"), col("fit.amplitude"))

  /** N1: Gaussian fit per group over the histogram of per-order quantity
    * sums (CLT makes them near-normal — the Δt-fit shape of
    * `scripts/time_resolution_beta_scan.py:177-193`).
    *
    * CERTIFICATE ROW (r13 verdict item 4): a Nelder–Mead solve is not
    * portable SQL, but its CONVERGENCE CONTRACT is checkable — the
    * returned params must be finite and inside the clamp box
    * (`fit_ok`), and their SSE over the same histogram must not exceed
    * the SSE of the reference's own data-derived initial guess
    * (`sse_improved` — the seed is a vertex of the start simplex, so a
    * sound optimizer can never lose to it). Both verdicts are computed
    * in-row Spark-side and checked against a literal-true oracle; the
    * raw params stay spec-checked (FitSpec) and feed `n1_curve_samples`,
    * and the hash-exact closed-form anchor is `n1_gaussian_caruana`.
    */
  val n1Gaussian: Q = Q(
    "n1_gaussian_fit",
    Some("""SELECT l_returnflag, TRUE AS fit_ok, TRUE AS sse_improved
           |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, dir) =>
      n1Histogram(s, dir)
        .groupBy("l_returnflag")
        .agg(FitAggregators.gaussianFitCert(col("center"), col("n").cast("double")).as("c"))
        .select(
          col("l_returnflag"),
          (!isnan(col("c.mu")) && col("c.sigma") > 0 && col("c.amplitude") >= 0)
            .as("fit_ok"),
          (col("c.sseFit") <= col("c.sseSeed")).as("sse_improved"))
        .orderBy("l_returnflag"))

  /** N2: Langauss fit per group over the skewed per-order revenue
    * histogram (the collected-charge shape of
    * `scripts/clean_beta_scan.py:60-83`) — certificate row, the
    * [[n1Gaussian]] discipline (params spec-checked; `n2_langauss_fwhm`
    * is the hash-exact closed-form anchor).
    */
  val n2Langauss: Q = Q(
    "n2_langauss_fit",
    Some("""SELECT l_returnflag, TRUE AS fit_ok, TRUE AS sse_improved
           |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, dir) => {
      val perOrder = Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_orderkey")
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      groupedHistogram(perOrder, "l_returnflag", col("rev"), 0.0, 400000.0, 40)
        .groupBy("l_returnflag")
        .agg(FitAggregators.langaussFitCert(col("center"), col("n").cast("double")).as("c"))
        .select(
          col("l_returnflag"),
          (!isnan(col("c.mpv")) && col("c.xi") > 0 && col("c.sigma") > 0
            && col("c.amplitude") >= 0).as("fit_ok"),
          (col("c.sseFit") <= col("c.sseSeed")).as("sse_improved"))
        .orderBy("l_returnflag")
    })

  /** N3: erf transition fit per group over the quantity ECDF (the pad
    * profile shape of `scripts/fit_erf_and_calculate_calibration_factor
    * .py:19-73`) — certificate row, the [[n1Gaussian]] discipline
    * (params spec-checked; `n3_erf_quantile` / `n3_erf_probit` are the
    * hash-exact closed-form anchors).
    */
  val n3Erf: Q = Q(
    "n3_erf_fit",
    Some("""SELECT l_returnflag, TRUE AS fit_ok, TRUE AS sse_improved
           |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, dir) =>
      ecdfProfile(s, dir)
        .groupBy("l_returnflag")
        .agg(FitAggregators.erfFitCert(col("l_quantity"), col("y")).as("c"))
        .select(
          col("l_returnflag"),
          (!isnan(col("c.x0")) && col("c.sigma") > 0).as("fit_ok"),
          (col("c.sseFit") <= col("c.sseSeed")).as("sse_improved"))
        .orderBy("l_returnflag"))

  /** N4/N6: interpolated level crossings of the group ECDF profile at the
    * reference's threshold style ({25, 50, 75}% here; the IPD thresholds
    * of `scripts/calculate_inter_pixel_distance_for_single_1D_scan.py:72`).
    */
  /** Shared oracle CTE chain for the quantity-ECDF crossings: ends in
    * `piv(l_returnflag, x25, x50, x75)` plus the raw ECDF points `m`.
    * Mirrors `Interp.firstCrossing` bit-exactly: cume_dist rationals are
    * identical doubles in both engines, the x grid is integer-valued (so
    * the y0==level plateau case x0 + 1.0·(x1−x0) is exact), same
    * segment/crossing SQL shape as the pipeline_ipd oracle.
    */
  private val crossingSqlPrefix: String =
    """WITH e AS (SELECT l_returnflag, l_quantity,
      |         cume_dist() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS cd
      |       FROM lineitem),
      |m AS (SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS x, MAX(cd) AS y
      |      FROM e GROUP BY 1, 2),
      |seg AS (SELECT l_returnflag, x AS x1, y AS y1,
      |         LAG(x) OVER w AS x0, LAG(y) OVER w AS y0
      |       FROM m WINDOW w AS (PARTITION BY l_returnflag ORDER BY x)),
      |c AS (SELECT l_returnflag, tt.t,
      |         MIN(CASE WHEN y0 = tt.t THEN x0
      |           ELSE x0 + ((tt.t - y0) / (y1 - y0)) * (x1 - x0) END) AS xc
      |       FROM seg, (SELECT UNNEST([2.5e-1, 5.0e-1, 7.5e-1]) AS t) tt
      |       WHERE x0 IS NOT NULL
      |         AND (y0 = tt.t OR (y0 < tt.t AND y1 >= tt.t)
      |              OR (y0 > tt.t AND y1 <= tt.t))
      |       GROUP BY 1, 2),
      |piv AS (SELECT l_returnflag,
      |         MAX(CASE WHEN t = 2.5e-1 THEN xc END) AS x25,
      |         MAX(CASE WHEN t = 5.0e-1 THEN xc END) AS x50,
      |         MAX(CASE WHEN t = 7.5e-1 THEN xc END) AS x75
      |       FROM c GROUP BY l_returnflag)""".stripMargin

  val n4Crossings: Q = Q(
    "n4_interp_crossing",
    // full oracle for the buffering CrossingAgg aggregator itself — see
    // crossingSqlPrefix
    Some(s"""$crossingSqlPrefix
            |SELECT l_returnflag, x25, x50, x75 FROM piv""".stripMargin),
    (s, dir) => {
      val ecdf = ecdfProfile(s, dir)
      ecdf
        .groupBy("l_returnflag")
        .agg(
          FitAggregators.crossingAt(0.25)(col("l_quantity"), col("y")).as("x25"),
          FitAggregators.crossingAt(0.50)(col("l_quantity"), col("y")).as("x50"),
          FitAggregators.crossingAt(0.75)(col("l_quantity"), col("y")).as("x75"))
    })

  /** N1 closed-form twin with a FULL DuckDB oracle: Caruana's algorithm
    * (parabola fit to the log-histogram) gives Gaussian μ/σ/amplitude in
    * one aggregation pass with no iteration, so — unlike the Nelder–Mead
    * form above — it IS expressible in portable SQL. The entire solve is
    * emitted from [[graft.fit.ClosedForm]] as shared SQL text evaluated
    * by both engines, making this the hash-exact correctness anchor for
    * the fit family (the iterative fits stay tolerance-checked by specs).
    *
    * Bin indices are centered to u = bucket − 12 ∈ [−12, 12]: power sums
    * through u⁴ are exact small integers (order-independent in any
    * engine), log-moment sums go through DetAgg decimals, and the Cramer
    * solve on the well-conditioned system is a fixed IEEE tree.
    */
  private val cramer = graft.fit.ClosedForm.cramerTexts
  private val caruanaParams =
    graft.fit.ClosedForm.paramTexts(center = 125.0, width = 10.0)

  /** Shared oracle CTE chain ending in `p(l_returnflag, mu, sigma,
    * amplitude)` — UNROUNDED params, consumed by both the fit query and
    * the curve-sample twin.
    */
  private val caruanaSqlPrefix: String = {
    val (d, na, nb, nc) = cramer
    val (muT, sgT, amT) = caruanaParams
    import graft.functions.DetAgg.{Sql => D}
    s"""WITH po AS (
       |  SELECT l_returnflag, l_orderkey, ${D.dsum("l_quantity")} AS qty
       |  FROM lineitem GROUP BY 1, 2),
       |h AS (
       |  SELECT l_returnflag,
       |    CAST(LEAST(GREATEST(FLOOR((qty - 0.0e0) / 1.0e1), 0), 24) AS BIGINT) AS bucket,
       |    COUNT(*) AS n
       |  FROM po GROUP BY 1, 2),
       |uy AS (
       |  SELECT l_returnflag, bucket - 12 AS u, LN(CAST(n AS DOUBLE)) AS y FROM h),
       |m AS (
       |  SELECT l_returnflag,
       |    CAST(COUNT(*) AS DOUBLE) AS s0,
       |    CAST(SUM(u) AS DOUBLE) AS su,
       |    CAST(SUM(u*u) AS DOUBLE) AS su2,
       |    CAST(SUM(u*u*u) AS DOUBLE) AS su3,
       |    CAST(SUM(u*u*u*u) AS DOUBLE) AS su4,
       |    ${D.dsum("y")} AS sy,
       |    ${D.dsum("u * y")} AS suy,
       |    ${D.dsum("u * u * y")} AS su2y
       |  FROM uy GROUP BY 1),
       |abc AS (
       |  SELECT l_returnflag, ($na)/($d) AS a, ($nb)/($d) AS b, ($nc)/($d) AS c FROM m),
       |p AS (
       |  SELECT l_returnflag, $muT AS mu, $sgT AS sigma, $amT AS amplitude FROM abc)""".stripMargin
  }

  /** Spark twin of [[caruanaSqlPrefix]]: (l_returnflag, mu, sigma,
    * amplitude), unrounded.
    */
  private def caruanaFits(s: SparkSession, dir: String): DataFrame = {
    val (d, na, nb, nc) = cramer
    val (muT, sgT, amT) = caruanaParams
    import graft.functions.DetAgg
    val perOrder = Tables.load(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_orderkey")
      .agg(DetAgg.dsum(col("l_quantity")).as("qty"))
    val hist = perOrder
      .select(
        col("l_returnflag"),
        least(greatest(floor((col("qty") - lit(0.0)) / lit(10.0)), lit(0L)), lit(24L))
          .as("bucket"))
      .groupBy("l_returnflag", "bucket")
      .agg(count(lit(1)).as("n"))
    val uy = hist.select(
      col("l_returnflag"),
      (col("bucket") - lit(12L)).as("u"),
      expr("LN(CAST(n AS DOUBLE))").as("y"))
    val m = uy.groupBy("l_returnflag").agg(
      count(lit(1)).cast("double").as("s0"),
      sum(col("u")).cast("double").as("su"),
      sum(col("u") * col("u")).cast("double").as("su2"),
      sum(col("u") * col("u") * col("u")).cast("double").as("su3"),
      sum(col("u") * col("u") * col("u") * col("u")).cast("double").as("su4"),
      DetAgg.dsum(col("y")).as("sy"),
      DetAgg.dsum(col("u") * col("y")).as("suy"),
      DetAgg.dsum(col("u") * col("u") * col("y")).as("su2y"))
    m.select(
        col("l_returnflag"),
        expr(s"($na)/($d)").as("a"),
        expr(s"($nb)/($d)").as("b"),
        expr(s"($nc)/($d)").as("c"))
      .select(
        col("l_returnflag"),
        expr(muT).as("mu"),
        expr(sgT).as("sigma"),
        expr(amT).as("amplitude"))
  }

  val n1Caruana: Q = Q(
    "n1_gaussian_caruana",
    Some(s"""$caruanaSqlPrefix
            |SELECT l_returnflag, ROUND(mu, 6) AS mu, ROUND(sigma, 6) AS sigma,
            |  ROUND(amplitude, 6) AS amplitude
            |FROM p""".stripMargin),
    (s, dir) =>
      caruanaFits(s, dir).select(
        col("l_returnflag"),
        round(col("mu"), 6).as("mu"),
        round(col("sigma"), 6).as("sigma"),
        round(col("amplitude"), 6).as("amplitude")))

  /** HASH-EXACT curve-sample twin (S13): [[graft.fit.CurveTables
    * .gaussianSamples]] over the closed-form fits — grid arithmetic and
    * the Gaussian kernel mirror as one shared IEEE tree; round-6 absorbs
    * the exp/pow last-ulp.
    */
  val n1CurveSamplesHash: Q = Q(
    "n1_curve_samples_hash",
    Some(s"""$caruanaSqlPrefix,
            |g AS (
            |  SELECT l_returnflag, mu, sigma, amplitude,
            |    UNNEST(generate_series(0, 49)) AS i
            |  FROM p),
            |sm AS (
            |  SELECT l_returnflag, mu, sigma, amplitude,
            |    (mu - 4.0e0 * sigma) + i * ((8.0e0 * sigma) / 49) AS x
            |  FROM g)
            |SELECT l_returnflag, ROUND(x, 6) AS x,
            |  ROUND(amplitude * EXP(-0.5e0 * POWER((x - mu) / sigma, 2)), 6) AS y
            |FROM sm""".stripMargin),
    (s, dir) =>
      graft.fit.CurveTables
        .gaussianSamples(caruanaFits(s, dir), Seq("l_returnflag"), nPoints = 50)
        .select(
          col("l_returnflag"),
          round(col("x"), 6).as("x"),
          round(col("y"), 6).as("y")))

  /** The fitted-curve sample VALUES (l_returnflag, x, y) the report
    * layer overlays on histograms — the pre-r14 `n1_curve_samples`
    * output, still the production surface
    * ([[graft.report.BetaScanReport]]).
    */
  def n1CurveSampleValues(s: SparkSession, dir: String): DataFrame =
    graft.fit.CurveTables.gaussianSamples(
      n1FitParams(s, dir), Seq("l_returnflag"), nPoints = 50)

  /** S13 support: the fitted-curve sample table a plot layer would
    * consume — Gaussian fits from N1 sampled on a per-group grid.
    *
    * CERTIFICATE ROW (r13 verdict item 4): the grid's x values ride on
    * the iterative fit's (mu, sigma), so the VALUES aren't portable SQL
    * — but the sampling kernel's geometry is checkable in-row: every y
    * is inside [0, amplitude] (`y_in_range`; exp(−t²/2) ≤ 1 exactly),
    * the curve is mirror-symmetric across the grid center (`sym_ok`;
    * x_i + x_{49−i} = 2·mu up to grid-arithmetic ulps), and it rises
    * monotonically to the center then falls (`mono_ok`). Oracle =
    * groups × grid indexes with literal-true verdicts; the hash-exact
    * value twin is `n1_curve_samples_hash` (closed-form fits).
    */
  val n1CurveSamples: Q = Q(
    "n1_curve_samples",
    Some("""SELECT l_returnflag, CAST(UNNEST(generate_series(0, 49)) AS BIGINT) AS i,
           |  TRUE AS y_in_range, TRUE AS sym_ok, TRUE AS mono_ok
           |FROM (SELECT DISTINCT l_returnflag FROM lineitem)""".stripMargin),
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // the SHARED sampling kernel (keepParams form) — the certificate
      // covers exactly the arithmetic the plot surface runs, not a
      // private re-derivation of it (r14 review)
      val samples = graft.fit.CurveTables.gaussianSamples(
        n1FitParams(s, dir), Seq("l_returnflag"), nPoints = 50, keepParams = true)
      val mirror = samples.select(
        col("l_returnflag"), (lit(49L) - col("i")).as("i"), col("y").as("y_m"))
      val w = Window.partitionBy("l_returnflag").orderBy("i")
      val eps = lit(1e-9) * (abs(col("y")) + lit(1.0))
      samples
        .join(mirror, Seq("l_returnflag", "i"))
        .withColumn("__prev", lag(col("y"), 1).over(w))
        .select(
          col("l_returnflag"),
          col("i"),
          (col("y") >= 0 && col("y") <= col("amplitude")).as("y_in_range"),
          (abs(col("y") - col("y_m")) <= lit(1e-6) * (abs(col("y")) + lit(1.0)))
            .as("sym_ok"),
          when(col("__prev").isNull, lit(true))
            .when(col("i") <= 24, col("y") >= col("__prev") - eps)
            .otherwise(col("y") <= col("__prev") + eps)
            .as("mono_ok"))
    })

  /** N3 closed-form twin: quantile-based erf-transition estimate — the
    * erf model's location is the ECDF median crossing and its width is
    * IQR / (2·z₀.₂₅) (z₀.₂₅ = 0.6744897501960817, the exact-double
    * normal quartile), with offset/scale from the exact ECDF envelope.
    * Every input is a bit-proven crossing or a cume_dist rational and
    * every op is ±·/ — hash-exact with no rounding at all, anchoring the
    * N3 family beside the Nelder–Mead fit (which stays spec-checked).
    */
  val n3ErfQuantile: Q = Q(
    "n3_erf_quantile",
    Some(s"""$crossingSqlPrefix,
            |mm AS (SELECT l_returnflag, MIN(y) AS ymin, MAX(y) AS ymax
            |       FROM m GROUP BY 1)
            |SELECT l_returnflag, x50 AS x0,
            |  (x75 - x25) / 1.3489795003921634e0 AS sigma,
            |  ymax - ymin AS y_scale, ymin AS y_offset
            |FROM piv JOIN mm USING (l_returnflag)""".stripMargin),
    (s, dir) => {
      val ecdf = ecdfProfile(s, dir)
      ecdf
        .groupBy("l_returnflag")
        .agg(
          FitAggregators.crossingAt(0.25)(col("l_quantity"), col("y")).as("x25"),
          FitAggregators.crossingAt(0.50)(col("l_quantity"), col("y")).as("x50"),
          FitAggregators.crossingAt(0.75)(col("l_quantity"), col("y")).as("x75"),
          min("y").as("ymin"),
          max("y").as("ymax"))
        .select(
          col("l_returnflag"),
          col("x50").as("x0"),
          expr("(x75 - x25) / 1.3489795003921634e0").as("sigma"),
          (col("ymax") - col("ymin")).as("y_scale"),
          col("ymin").as("y_offset"))
    })

  /** N2 closed-form twin: peak + half-width estimate of the Langauss
    * profile — the standard seed for the iterative fit (mpv ≈ peak-bin
    * center; width from the half-max crossing). The revenue profile is
    * TRUNCATED AT ZERO (its first bucket already sits above half max),
    * so the LEFT crossing does not exist and a two-sided FWHM is NULL
    * by construction (the r14 content audit caught exactly that) — the
    * emitted width is therefore the RIGHT-side half-width at half
    * maximum (HWHM, the falling-tail width a truncated peaked
    * distribution actually has; ×2 ≈ FWHM for a symmetric core). Bin
    * centers are exact dyadic doubles, counts are integers, the
    * half-max level is one exact division, and the crossing
    * interpolation is the same shared text on both sides — hash-exact
    * with no rounding.
    */
  val n2LangaussFwhm: Q = {
    val interp = "x0 + ((h - y0) / (y1 - y0)) * (x1 - x0)"
    Q(
      "n2_langauss_fwhm",
      Some(s"""WITH po AS (
              |  SELECT l_returnflag, l_orderkey,
              |    ${graft.functions.DetAgg.Sql.dsum("l_extendedprice * (1 - l_discount)")} AS rev
              |  FROM lineitem GROUP BY 1, 2),
              |hst AS (
              |  SELECT l_returnflag,
              |    CAST(LEAST(GREATEST(FLOOR((rev - 0.0e0) / 1.0e4), 0), 39) AS BIGINT) AS bucket,
              |    COUNT(*) AS n
              |  FROM po GROUP BY 1, 2),
              |pts AS (
              |  SELECT l_returnflag, bucket,
              |    0.0e0 + (bucket + 5.0e-1) * 1.0e4 AS x, CAST(n AS DOUBLE) AS y
              |  FROM hst),
              |pk AS (
              |  SELECT l_returnflag, x AS x_peak, y AS y_peak FROM (
              |    SELECT l_returnflag, x, y,
              |      ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY y DESC, bucket) AS rn
              |    FROM pts)
              |  WHERE rn = 1),
              |seg AS (
              |  SELECT l_returnflag, x AS x1, y AS y1,
              |    LAG(x) OVER w AS x0, LAG(y) OVER w AS y0
              |  FROM pts WINDOW w AS (PARTITION BY l_returnflag ORDER BY x)),
              |j AS (
              |  SELECT seg.l_returnflag, x0, y0, x1, y1, x_peak, y_peak / 2.0e0 AS h
              |  FROM seg JOIN pk ON seg.l_returnflag = pk.l_returnflag
              |  WHERE x0 IS NOT NULL)
              |SELECT l_returnflag,
              |  MAX(x_peak) AS mpv_est,
              |  MAX(h) AS half_max,
              |  MAX(CASE WHEN y0 >= h AND y1 < h AND x0 >= x_peak THEN $interp END)
              |    - MAX(x_peak) AS hwhm_right
              |FROM j GROUP BY l_returnflag""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        import graft.functions.DetAgg
        val po = Tables.load(s, dir, "lineitem")
          .groupBy("l_returnflag", "l_orderkey")
          .agg(DetAgg.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
        val hst = po
          .select(
            col("l_returnflag"),
            least(greatest(floor((col("rev") - lit(0.0)) / lit(10000.0)), lit(0L)), lit(39L))
              .as("bucket"))
          .groupBy("l_returnflag", "bucket")
          .agg(count(lit(1)).as("n"))
        val pts = hst.select(
          col("l_returnflag"), col("bucket"),
          (lit(0.0) + (col("bucket") + lit(0.5)) * lit(10000.0)).as("x"),
          col("n").cast("double").as("y"))
        val pk = pts
          .withColumn(
            "rn",
            row_number().over(
              Window.partitionBy("l_returnflag").orderBy(col("y").desc, col("bucket"))))
          .filter(col("rn") === 1)
          .select(col("l_returnflag"), col("x").as("x_peak"), col("y").as("y_peak"))
        val w = Window.partitionBy("l_returnflag").orderBy("x")
        val seg = pts
          .select(
            col("l_returnflag"), col("x").as("x1"), col("y").as("y1"),
            lag("x", 1).over(w).as("x0"), lag("y", 1).over(w).as("y0"))
          .filter(col("x0").isNotNull)
        val j = seg
          .join(pk, "l_returnflag")
          .withColumn("h", col("y_peak") / lit(2.0))
        val interpC = expr(interp)
        j.groupBy("l_returnflag")
          .agg(
            max("x_peak").as("mpv_est"),
            max("h").as("half_max"),
            (max(when(col("y0") >= col("h") && col("y1") < col("h")
                && col("x0") >= col("x_peak"), interpC))
              - max(col("x_peak"))).as("hwhm_right"))
      })
  }

  /** N3 regression twin — a FULL-DATA closed-form erf fit: probit
    * transform (Acklam inverse-normal, shared SQL text from
    * [[graft.fit.ClosedForm.probitText]]) linearizes the ECDF, then
    * ordinary least squares of x on z reads off location (intercept)
    * and width (slope). Uses every ECDF point below 1.0, not just three
    * quantiles; z-moments ride DetAgg decimals (absorbing the tail
    * branches' ln last-ulp), the OLS solve is one shared IEEE tree, and
    * outputs round at 6.
    */
  val n3ErfProbit: Q = {
    val zT = graft.fit.ClosedForm.probitText("y")
    val slope = "(n * szx - sz * sx) / (n * sz2 - sz * sz)"
    val icept = s"(sx - ($slope) * sz) / n"
    import graft.functions.DetAgg
    import graft.functions.DetAgg.{Sql => D}
    Q(
      "n3_erf_probit",
      Some(s"""WITH e AS (SELECT l_returnflag, l_quantity,
              |         cume_dist() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS cd
              |       FROM lineitem),
              |m AS (SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS x, MAX(cd) AS y
              |      FROM e GROUP BY 1, 2),
              |pz AS (SELECT l_returnflag, x, $zT AS z FROM m WHERE y < 1.0e0),
              |s AS (SELECT l_returnflag,
              |        CAST(COUNT(*) AS DOUBLE) AS n,
              |        ${D.dsum("z")} AS sz,
              |        ${D.dsum("x")} AS sx,
              |        ${D.dsum("z * x")} AS szx,
              |        ${D.dsum("z * z")} AS sz2
              |      FROM pz GROUP BY 1)
              |SELECT l_returnflag, ROUND($icept, 6) AS x0, ROUND($slope, 6) AS sigma
              |FROM s""".stripMargin),
      (s, dir) => {
        val pts = ecdfProfile(s, dir)
          .select(
            col("l_returnflag"),
            col("l_quantity").cast("double").as("x"),
            col("y"))
          .filter(col("y") < lit(1.0))
          .withColumn("z", expr(zT))
        pts
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).cast("double").as("n"),
            DetAgg.dsum(col("z")).as("sz"),
            DetAgg.dsum(col("x")).as("sx"),
            DetAgg.dsum(col("z") * col("x")).as("szx"),
            DetAgg.dsum(col("z") * col("z")).as("sz2"))
          .select(
            col("l_returnflag"),
            round(expr(icept), 6).as("x0"),
            round(expr(slope), 6).as("sigma"))
      })
  }

  def all: Seq[Q] =
    Seq(n1Gaussian, n2Langauss, n2LangaussFwhm, n3Erf, n3ErfQuantile, n3ErfProbit,
      n4Crossings, n1Caruana, n1CurveSamples, n1CurveSamplesHash)
}
