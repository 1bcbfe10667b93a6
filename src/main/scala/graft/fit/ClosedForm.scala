package graft.fit

/** Closed-form Gaussian estimation (Caruana's algorithm): fit a parabola
  * a + b·u + c·u² to the log of the histogram counts by unweighted least
  * squares, then read the Gaussian parameters off the parabola —
  * μ = −b/2c, σ = √(−1/2c), A = exp(a − b²/4c). One aggregation pass, no
  * iteration — the SQL-expressible counterpart of the Nelder–Mead fit in
  * [[FitAggregators]] (reference fit loop:
  * `scripts/time_resolution_beta_scan.py:177-193`), and the estimator a
  * production pipeline would use to SEED that fit.
  *
  * Everything here is emitted as SQL TEXT shared verbatim between the
  * Spark plan (`expr(...)`) and the DuckDB oracle, so both engines
  * evaluate the identical IEEE expression tree — the same
  * generate-from-one-source trick that made the LSH oracle hash-exact.
  * Numeric constants use e-notation (`2.0e0`), which parses as DOUBLE in
  * both dialects (a bare `2.0` is DECIMAL in Spark SQL).
  *
  * Conditioning: callers should feed CENTERED, UNIT-SPACED bin indices
  * (u = bucket − nBins/2, exact small integers) rather than raw bin
  * centers — power sums up to u⁴ then stay exact integers and the
  * normal-equation matrix is well-conditioned, so the Cramer solve is
  * bit-stable. Map back with μ_x = center + width·μ_u, σ_x = width·σ_u.
  */
object ClosedForm {

  private def det3(
      m00: String, m01: String, m02: String,
      m10: String, m11: String, m12: String,
      m20: String, m21: String, m22: String): String =
    s"($m00*($m11*$m22 - $m12*$m21) - $m01*($m10*$m22 - $m12*$m20)" +
      s" + $m02*($m10*$m21 - $m11*$m20))"

  /** Cramer-rule texts `(d, na, nb, nc)` solving the 3×3 normal equations
    * M·[a,b,c]ᵀ = r over column names s0,su,su2,su3,su4 (power sums) and
    * sy,suy,su2y (moment sums): a = na/d, b = nb/d, c = nc/d.
    */
  val cramerTexts: (String, String, String, String) = {
    val d  = det3("s0", "su", "su2", "su", "su2", "su3", "su2", "su3", "su4")
    val na = det3("sy", "su", "su2", "suy", "su2", "su3", "su2y", "su3", "su4")
    val nb = det3("s0", "sy", "su2", "su", "suy", "su3", "su2", "su2y", "su4")
    val nc = det3("s0", "su", "sy", "su", "su2", "suy", "su2", "su3", "su2y")
    (d, na, nb, nc)
  }

  /** Acklam's inverse-normal-CDF approximation (public, ~1.15e-9 max
    * relative error) as shared SQL text over a probability column `p` ∈
    * (0, 1): piecewise rational polynomials, central branch pure ±·/,
    * tail branches via sqrt(−2·ln p). Feeding the result through a
    * DetAgg decimal (6 dp) before any cross-row sum absorbs the tail
    * branches' ln last-ulp, so probit REGRESSION is oracle-portable.
    */
  def probitText(p: String): String = {
    val a = Seq(
      "-3.969683028665376e1", "2.209460984245205e2", "-2.759285104469687e2",
      "1.38357751867269e2", "-3.066479806614716e1", "2.506628277459239e0")
    val b = Seq(
      "-5.447609879822406e1", "1.615858368580409e2", "-1.556989798598866e2",
      "6.680131188771972e1", "-1.328068155288572e1")
    val c = Seq(
      "-7.784894002430293e-3", "-3.223964580411365e-1", "-2.400758277161838e0",
      "-2.549732539343734e0", "4.374664141464968e0", "2.938163982698783e0")
    val d = Seq(
      "7.784695709041462e-3", "3.224671290700398e-1", "2.445134137142996e0",
      "3.754408661907416e0")
    def horner(coef: Seq[String], x: String): String =
      coef.reduceLeft((acc, k) => s"(($acc) * $x + $k)")
    val central = {
      val q = s"($p - 5.0e-1)"; val r = s"($q * $q)"
      s"(${horner(a, r)} * $q) / (${horner(b, r)} * $r + 1.0e0)"
    }
    val lowTail = {
      val q = s"SQRT(-2.0e0 * LN($p))"
      s"(${horner(c, q)}) / (${horner(d, q)} * $q + 1.0e0)"
    }
    val highTail = {
      val q = s"SQRT(-2.0e0 * LN(1.0e0 - $p))"
      s"(-(${horner(c, q)}) / (${horner(d, q)} * $q + 1.0e0))"
    }
    s"(CASE WHEN $p < 2.425e-2 THEN $lowTail" +
      s" WHEN $p > 9.7575e-1 THEN $highTail ELSE $central END)"
  }

  /** Abramowitz–Stegun 7.1.26 erf approximation (public, ≤ 1.5e-7 abs
    * error) as shared SQL text over a column expression `x` — the
    * [[probitText]] discipline: the approximation's constants live in
    * ONE text evaluated by both engines, so the approximation error
    * cancels in the comparison (a round-6 tail absorbs the EXP last-ulp
    * like probit's LN branches).
    */
  def erfText(x: String): String = {
    val t = s"(1.0e0 / (1.0e0 + 3.275911e-1 * ABS($x)))"
    val poly = Seq(
      "1.061405429e0", "-1.453152027e0", "1.421413741e0",
      "-2.84496736e-1", "2.54829592e-1")
      .reduceLeft((acc, k) => s"(($acc) * $t + $k)")
    s"((CASE WHEN ($x) < 0.0e0 THEN -1.0e0 ELSE 1.0e0 END)" +
      s" * (1.0e0 - ($poly) * $t * EXP(-(($x) * ($x)))))"
  }

  /** Standard-normal CDF `Φ(z) = ½(1 + erf(z/√2))` as shared SQL text —
    * the theoretical-CDF leg of the one-sample KS test.
    */
  def normalCdfText(z: String): String =
    s"(5.0e-1 * (1.0e0 + ${erfText(s"(($z) / 1.4142135623730951e0)")}))"

  /** Gaussian-parameter texts over solved columns (a, b, c), mapping the
    * u-space parabola back to x-space for bins of `width` centered (u=0)
    * at `center`. Non-concave parabolas (c ≥ 0 — no Gaussian peak) yield
    * NULL rather than a domain error in either engine.
    */
  def paramTexts(center: Double, width: Double): (String, String, String) =
    paramTextsCols(s"${center.toString}e0", s"${width.toString}e0")

  /** [[paramTexts]] with center/width as arbitrary column EXPRESSIONS —
    * for pipelines whose histogram range is data-driven (per-group
    * lo/hi) rather than a literal.
    */
  def paramTextsCols(center: String, width: String): (String, String, String) = {
    val mu = s"($center) + ($width) * (-(b) / (2.0e0 * c))"
    val sg = s"CASE WHEN c < 0.0e0 THEN ($width) * SQRT(-1.0e0 / (2.0e0 * c)) ELSE NULL END"
    val am = s"CASE WHEN c < 0.0e0 THEN EXP(a - (b * b) / (4.0e0 * c)) ELSE NULL END"
    (mu, sg, am)
  }
}
