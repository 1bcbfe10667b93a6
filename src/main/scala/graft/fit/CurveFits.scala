package graft.fit

import org.apache.commons.math3.analysis.MultivariateFunction
import org.apache.commons.math3.optim.{InitialGuess, MaxEval, SimpleValueChecker}
import org.apache.commons.math3.optim.nonlinear.scalar.{GoalType, ObjectiveFunction}
import org.apache.commons.math3.optim.nonlinear.scalar.noderiv.{NelderMeadSimplex, SimplexOptimizer}
import org.apache.commons.math3.special.Erf

/** Curve-fitting kernels (SURVEY §2.8 N1–N3), commons-math3 based.
  *
  * scipy's `curve_fit` (Levenberg–Marquardt) is replaced by Nelder–Mead
  * least squares: derivative-free (no hand Jacobians for langauss),
  * deterministic, and parity is tolerance-based per BASELINE.md — fits are
  * never hash-compared. Bounds are enforced by parameter clamping inside
  * the objective (reference bounds σ∈[5µm,22µm] etc. at
  * `scripts/fit_erf_and_calculate_calibration_factor.py:19-73`).
  */
object CurveFits {

  final case class GaussParams(mu: Double, sigma: Double, amplitude: Double)
  final case class ErfParams(x0: Double, sigma: Double, yScale: Double, yOffset: Double)
  final case class LangaussParams(mpv: Double, xi: Double, sigma: Double, amplitude: Double)

  def gaussian(x: Double, p: GaussParams): Double =
    p.amplitude * math.exp(-0.5 * math.pow((x - p.mu) / p.sigma, 2))

  /** y_scale·erf((x−x0)/(σ√2)) + y_offset — the pad-transition model
    * (reference `scripts/fit_erf_and_calculate_calibration_factor.py:20`).
    */
  def erfModel(x: Double, p: ErfParams): Double =
    p.yScale * Erf.erf((x - p.x0) / (p.sigma * math.sqrt(2.0))) + p.yOffset

  private def minimizeSse(
      xs: Array[Double],
      ys: Array[Double],
      model: (Double, Array[Double]) => Double,
      start: Array[Double],
      lower: Array[Double],
      upper: Array[Double],
      maxEval: Int = 20000): Array[Double] = {
    def clamp(p: Array[Double]): Array[Double] = {
      val c = p.clone()
      var i = 0
      while (i < c.length) {
        if (c(i) < lower(i)) c(i) = lower(i)
        if (c(i) > upper(i)) c(i) = upper(i)
        i += 1
      }
      c
    }
    val objective = new MultivariateFunction {
      override def value(point: Array[Double]): Double = {
        val p = clamp(point)
        var sse = 0.0
        var i = 0
        while (i < xs.length) {
          val r = model(xs(i), p) - ys(i)
          sse += r * r
          i += 1
        }
        // soft penalty steers the simplex back inside the box
        var pen = 0.0
        i = 0
        while (i < point.length) {
          val d = math.max(0.0, math.max(lower(i) - point(i), point(i) - upper(i)))
          pen += d * d
          i += 1
        }
        sse * (1.0 + pen)
      }
    }
    val opt = new SimplexOptimizer(new SimpleValueChecker(1e-12, 1e-12))
    val res = opt.optimize(
      new MaxEval(maxEval),
      new ObjectiveFunction(objective),
      GoalType.MINIMIZE,
      new InitialGuess(start),
      new NelderMeadSimplex(start.length))
    clamp(res.getPoint)
  }

  /** Sum of squared residuals of `model(x, p)` over the profile — the
    * objective the Nelder–Mead fits minimize, exposed so certificate
    * queries can compare the returned params against the seed.
    */
  def sse(
      xs: Array[Double],
      ys: Array[Double],
      model: (Double, Array[Double]) => Double,
      p: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < xs.length) {
      val r = model(xs(i), p) - ys(i)
      s += r * r
      i += 1
    }
    s
  }

  private val gaussModel: (Double, Array[Double]) => Double =
    (x, p) => p(2) * math.exp(-0.5 * math.pow((x - p(0)) / p(1), 2))

  /** The reference's Gaussian initial-guess policy
    * (`scripts/time_resolution_beta_scan.py:177-193`): p0 = [argmax-bin
    * center, span/6 width, max height]. Shared by the fit (its start
    * simplex vertex) and the certificate (the SSE baseline the fit must
    * not lose to — Nelder–Mead's best vertex is monotone, so
    * SSE(fit) ≤ SSE(seed) is a guaranteed convergence invariant).
    */
  def gaussianSeed(xs: Array[Double], ys: Array[Double]): Array[Double] = {
    val ymax = ys.max
    Array(xs(ys.indexOf(ymax)), math.max((xs.last - xs.head) / 6.0, 1e-12), ymax)
  }

  /** Gaussian fit to histogram points with the reference's initial guess
    * policy ([[gaussianSeed]]); NaN params on failure.
    */
  def fitGaussian(xs: Array[Double], ys: Array[Double]): GaussParams = {
    try {
      require(xs.length >= 3)
      val ymax = ys.max
      val p = minimizeSse(
        xs, ys,
        gaussModel,
        gaussianSeed(xs, ys),
        Array(xs.head - (xs.last - xs.head), 1e-12, 0.0),
        Array(xs.last + (xs.last - xs.head), (xs.last - xs.head) * 10, ymax * 10))
      GaussParams(p(0), math.abs(p(1)), p(2))
    } catch {
      case _: Throwable => GaussParams(Double.NaN, Double.NaN, Double.NaN)
    }
  }

  /** [[fitGaussian]] plus the convergence certificate operands: the
    * fit's SSE and the seed's SSE over the same profile. `sseFit ≤
    * sseSeed` always holds for a successful fit (the seed is a vertex
    * of the start simplex and Nelder–Mead's best-vertex value is
    * non-increasing; the box penalty only inflates out-of-box values).
    */
  def fitGaussianCert(xs: Array[Double], ys: Array[Double]): GaussCert = {
    val p = fitGaussian(xs, ys)
    if (p.mu.isNaN) GaussCert(p.mu, p.sigma, p.amplitude, Double.NaN, Double.NaN)
    else GaussCert(
      p.mu, p.sigma, p.amplitude,
      sse(xs, ys, gaussModel, Array(p.mu, p.sigma, p.amplitude)),
      sse(xs, ys, gaussModel, gaussianSeed(xs, ys)))
  }

  final case class GaussCert(
      mu: Double, sigma: Double, amplitude: Double,
      sseFit: Double, sseSeed: Double)

  /** Bounded erf-transition fit; `mirrored = true` flips the transition
    * (the reference's right-pad model).
    */
  private def erfModelOf(sign: Double): (Double, Array[Double]) => Double =
    (x, p) => sign * p(2) * Erf.erf((x - p(0)) / (p(1) * math.sqrt(2.0))) + p(3)

  /** Erf initial-guess policy: p0 = [mid-profile x, span/10 width (or
    * the bound floor), slope-signed half-range scale, mid-range offset].
    */
  def erfSeed(
      xs: Array[Double],
      ys: Array[Double],
      bounds: Map[String, (Double, Double)] = Map.empty): Array[Double] = {
    val ymin = ys.min; val ymax = ys.max
    val span = xs.last - xs.head
    val (sLo, _) = bounds.getOrElse("sigma", (span * 1e-4, span))
    val slopeSign = if (ys.last >= ys.head) 1.0 else -1.0
    Array(xs(xs.length / 2), math.max(span / 10, sLo),
      slopeSign * (ymax - ymin) / 2, (ymax + ymin) / 2)
  }

  def fitErf(
      xs: Array[Double],
      ys: Array[Double],
      bounds: Map[String, (Double, Double)] = Map.empty,
      mirrored: Boolean = false): ErfParams = {
    try {
      require(xs.length >= 4)
      val sign = if (mirrored) -1.0 else 1.0
      val ymin = ys.min; val ymax = ys.max
      val span = xs.last - xs.head
      val (sLo, sHi) = bounds.getOrElse("sigma", (span * 1e-4, span))
      // falling profiles (left pad) fit with negative yScale — seed the
      // sign from the data's end-to-end slope and keep the bound two-sided
      val p = minimizeSse(
        xs, ys,
        erfModelOf(sign),
        erfSeed(xs, ys, bounds),
        Array(xs.head, sLo, -(ymax - ymin) * 2, ymin - (ymax - ymin)),
        Array(xs.last, sHi, (ymax - ymin) * 2, ymax + (ymax - ymin)))
      ErfParams(p(0), p(1), p(2), p(3))
    } catch {
      case _: Throwable => ErfParams(Double.NaN, Double.NaN, Double.NaN, Double.NaN)
    }
  }

  /** [[fitErf]] plus the convergence-certificate SSEs (the
    * [[fitGaussianCert]] invariant: sseFit ≤ sseSeed always holds for a
    * successful fit). `bounds`/`mirrored` plumb through to the fit AND
    * the certificate model/seed, so a bounded or mirrored production
    * fit is certified against the model it actually ran (r14 review:
    * the hard-coded defaults would have certified a different fit).
    */
  def fitErfCert(
      xs: Array[Double],
      ys: Array[Double],
      bounds: Map[String, (Double, Double)] = Map.empty,
      mirrored: Boolean = false): ErfCert = {
    val p = fitErf(xs, ys, bounds, mirrored)
    val sign = if (mirrored) -1.0 else 1.0
    if (p.x0.isNaN)
      ErfCert(p.x0, p.sigma, p.yScale, p.yOffset, Double.NaN, Double.NaN)
    else
      ErfCert(
        p.x0, p.sigma, p.yScale, p.yOffset,
        sse(xs, ys, erfModelOf(sign), Array(p.x0, p.sigma, p.yScale, p.yOffset)),
        sse(xs, ys, erfModelOf(sign), erfSeed(xs, ys, bounds)))
  }

  final case class ErfCert(
      x0: Double, sigma: Double, yScale: Double, yOffset: Double,
      sseFit: Double, sseSeed: Double)

  /** Langauss fit to a (possibly unnormalized) histogram, reference
    * initial-guess policy: mpv = argmax bin, ξ = spread/5, σ = ξ/10
    * (`scripts/clean_beta_scan.py:60-83`).
    */
  private val langaussModel: (Double, Array[Double]) => Double =
    (x, p) => p(3) * Landau.langauss(x, p(0), p(1), p(2))

  /** Langauss initial-guess policy (reference
    * `scripts/clean_beta_scan.py:60-83`): mpv = argmax bin, ξ =
    * span/20, σ = ξ/2, amplitude normalized to the peak height.
    */
  def langaussSeed(xs: Array[Double], ys: Array[Double]): Array[Double] = {
    val ymax = ys.max
    val mpv0 = xs(ys.indexOf(ymax))
    val span = math.max(xs.last - xs.head, 1e-12)
    val xi0 = span / 20.0
    Array(mpv0, xi0, xi0 / 2.0,
      ymax / math.max(Landau.langauss(mpv0, mpv0, xi0, xi0 / 2.0), 1e-12))
  }

  def fitLangauss(xs: Array[Double], ys: Array[Double]): LangaussParams = {
    try {
      require(xs.length >= 5)
      val span = math.max(xs.last - xs.head, 1e-12)
      val p = minimizeSse(
        xs, ys,
        langaussModel,
        langaussSeed(xs, ys),
        Array(xs.head, span * 1e-5, span * 1e-5, 0.0),
        Array(xs.last, span, span, Double.MaxValue),
        maxEval = 40000)
      LangaussParams(p(0), p(1), p(2), p(3))
    } catch {
      case _: Throwable =>
        LangaussParams(Double.NaN, Double.NaN, Double.NaN, Double.NaN)
    }
  }

  /** [[fitLangauss]] plus the convergence-certificate SSEs (the
    * [[fitGaussianCert]] invariant).
    */
  def fitLangaussCert(xs: Array[Double], ys: Array[Double]): LangaussCert = {
    val p = fitLangauss(xs, ys)
    if (p.mpv.isNaN)
      LangaussCert(p.mpv, p.xi, p.sigma, p.amplitude, Double.NaN, Double.NaN)
    else
      LangaussCert(
        p.mpv, p.xi, p.sigma, p.amplitude,
        sse(xs, ys, langaussModel, Array(p.mpv, p.xi, p.sigma, p.amplitude)),
        sse(xs, ys, langaussModel, langaussSeed(xs, ys)))
  }

  final case class LangaussCert(
      mpv: Double, xi: Double, sigma: Double, amplitude: Double,
      sseFit: Double, sseSeed: Double)
}
