package graft.fit

/** Landau probability density, Kölbig–Schorr rational approximation
  * (CERNLIB G110 `DENLAN`; the same public algorithm behind ROOT's
  * `TMath::Landau` and the `landaupy` package the reference imports at
  * `scripts/clean_beta_scan.py:10-11`). Pure function — usable inside
  * aggregators and UDFs (SURVEY §2.8 N2).
  */
object Landau {

  private val p1 = Array(0.4259894875, -0.1249762550, 0.03984243700, -0.006298287635, 0.001511162253)
  private val q1 = Array(1.0, -0.3388260629, 0.09594393323, -0.01608042283, 0.003778942063)
  private val p2 = Array(0.1788541609, 0.1173957403, 0.01488850518, -0.001394989411, 0.0001283617211)
  private val q2 = Array(1.0, 0.7428795082, 0.3153932961, 0.06694219548, 0.008790609714)
  private val p3 = Array(0.1788544503, 0.09359161662, 0.006325387654, 0.00006611667319, -0.000002031049101)
  private val q3 = Array(1.0, 0.6097809921, 0.2560616665, 0.04746722384, 0.006957301675)
  private val p4 = Array(0.9874054407, 118.6723273, 849.2794360, -743.7792444, 427.0262186)
  private val q4 = Array(1.0, 106.8615961, 337.6496214, 2016.712389, 1597.063511)
  private val p5 = Array(1.003675074, 167.5702434, 4789.711289, 21217.86767, -22324.94910)
  private val q5 = Array(1.0, 156.9424537, 3745.310488, 9834.698876, 66924.28357)
  private val p6 = Array(1.000827619, 664.9143136, 62972.92665, 475554.6998, -5743609.109)
  private val q6 = Array(1.0, 651.4101098, 56974.73333, 165917.4725, -2815759.939)
  private val a1 = Array(0.04166666667, -0.01996527778, 0.02709538966)
  private val a2 = Array(-1.845568670, -4.284640743)

  private def ratio(p: Array[Double], q: Array[Double], v: Double): Double = {
    // Horner, degree 4 over degree 4
    val num = p(0) + v * (p(1) + v * (p(2) + v * (p(3) + v * p(4))))
    val den = q(0) + v * (q(1) + v * (q(2) + v * (q(3) + v * q(4))))
    num / den
  }

  /** Density of the standard Landau distribution at v. */
  def pdf(v: Double): Double = {
    if (v < -5.5) {
      val u = math.exp(v + 1.0)
      if (u < 1e-10) 0.0
      else
        0.3989422803 * math.exp(-1.0 / u) * math.sqrt(u) *
          (1.0 + (a1(0) + (a1(1) + a1(2) * u) * u) * u)
    } else if (v < -1.0) {
      val u = math.exp(-v - 1.0)
      math.exp(-u) * math.sqrt(u) * ratio(p1, q1, v)
    } else if (v < 1.0) {
      ratio(p2, q2, v)
    } else if (v < 5.0) {
      ratio(p3, q3, v)
    } else if (v < 12.0) {
      val u = 1.0 / v
      u * u * ratio(p4, q4, u)
    } else if (v < 50.0) {
      val u = 1.0 / v
      u * u * ratio(p5, q5, u)
    } else if (v < 300.0) {
      val u = 1.0 / v
      u * u * ratio(p6, q6, u)
    } else {
      val u = 1.0 / (v - v * math.log(v) / (v + 1.0))
      u * u * (1.0 + (a2(0) + a2(1) * u) * u)
    }
  }

  /** Location/scale form: density of x for location mpv-ish `mu` and
    * scale `xi` (ξ).
    */
  def pdf(x: Double, mu: Double, xi: Double): Double =
    if (xi <= 0) Double.NaN else pdf((x - mu) / xi) / xi

  /** Landau ⊗ Gaussian (the "langauss" of
    * `scripts/clean_beta_scan.py:60-83`): numeric quadrature over ±5σ,
    * ROOT-convention mpv shift so the `mpv` parameter sits at the
    * convolved peak.
    */
  def langauss(x: Double, mpv: Double, xi: Double, sigma: Double, np: Int = 100): Double = {
    if (xi <= 0 || sigma <= 0) return Double.NaN
    val mpshift = -0.22278298
    val mpc = mpv - mpshift * xi
    val sc = 5.0
    val xlow = x - sc * sigma
    val xupp = x + sc * sigma
    val step = (xupp - xlow) / np
    var sum = 0.0
    var i = 1
    while (i <= np / 2) {
      val xx1 = xlow + (i - 0.5) * step
      val xx2 = xupp - (i - 0.5) * step
      sum += pdf(xx1, mpc, xi) * gauss(x - xx1, sigma)
      sum += pdf(xx2, mpc, xi) * gauss(x - xx2, sigma)
      i += 1
    }
    step * sum
  }

  private def gauss(d: Double, sigma: Double): Double =
    math.exp(-0.5 * d * d / (sigma * sigma)) / (sigma * math.sqrt(2.0 * math.Pi))
}
