package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic floating-point aggregates.
  *
  * Summing doubles is order-dependent, and Spark's partial aggregation order
  * differs run-to-run and engine-to-engine — a plain `sum(double)` will not
  * hash-match a DuckDB oracle. The fix: route sums through a fixed-scale
  * DECIMAL (exact, associative, order-independent) and cast the final result
  * back to double. Both engines then produce bit-identical values.
  *
  * This also matters at 100 TB: decimal sums stay exact no matter how many
  * partial-aggregation levels AQE inserts, so results are stable across
  * cluster sizes and retries.
  *
  * Mirror SQL text (DuckDB dialect; the final decimal→double hop is
  * VARCHAR-routed on BOTH sides — exact digits, one correct rounding —
  * because past 2^53 micro-units each engine's direct cast double-rounds
  * in its own way: DuckDB int128÷10^scale, Spark BigDecimal.doubleValue):
  *   dsum  -> CAST(CAST(SUM(CAST(x AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE)
  *   davg  -> dsum(x) / COUNT(x)
  *   dstd  -> explicit sum/sum-of-squares formula, see [[dstd]]
  */
object DetAgg {
  /** Fixed decimal scale: exact for money-like inputs (2-4 decimal digits)
    * and products of two such columns (<=6 digits).
    */
  val Scale = 6
  private val Dec = DecimalType(30, Scale)

  def dec(c: Column): Column = c.cast(Dec)

  /** Product-grade (scale-12) cast — the per-row half of [[dsumP]],
    * exposed so a caller can cast ONCE before a row-multiplying
    * operator (Expand/rollup replicates every input row per grouping
    * level; pre-casting keeps the per-copy work to pure addition).
    * `sum(decP(x))` is value-identical to `dsumP(x)` minus the final
    * double cast.
    */
  def decP(c: Column): Column = c.cast(DecP)

  /** Correctly-rounded decimal→double for the ENGINE side — the exact
    * mirror of [[Sql.dsumExact]]'s VARCHAR route, needed one decade up
    * from where the oracle needed it: past 2^53 micro-units Spark's
    * `Decimal.toDouble` (JDK `BigDecimal.doubleValue`) DOUBLE-ROUNDS the
    * inflated path (unscaled→double, then ÷10^scale), which is 1 ulp off
    * nearest — the r15 sf1 drive measured it on Σ price² ≈ 7.4e15.483:
    * Spark rounded the .483 UP while the VARCHAR-routed oracle correctly
    * rounded down. Decimal→string emits the exact digits and
    * string→double is `Double.parseDouble` (correctly rounded), so this
    * cast is exact-digit single-rounding in both engines at any
    * magnitude. One string per GROUP, not per row — free.
    */
  private def toD(c: Column): Column = c.cast(StringType).cast(DoubleType)

  /** Order-independent sum of a double column, returned as double. */
  def dsum(c: Column): Column = toD(sum(dec(c)))

  /** Order-independent sum of an EXACT product: each factor is cast to
    * DECIMAL(18,6) (exact for money/quantity-grade inputs below ~1e9,
    * where the double ulp is still far inside the 5e-7 cast boundary)
    * and multiplied IN DECIMAL — decimal(37,12), exact — so no engine
    * ever rounds a double PRODUCT. `dsum(x*y)` casts the double product
    * instead, and once the product magnitude reaches ~1e9 the double's
    * ulp (2^-52·|v|) crosses the scale-6 rounding boundary spacing:
    * Spark rounds the product's exact binary expansion, DuckDB its
    * shortest decimal form, and the per-row casts diverge — measured at
    * sf1 as a Σ price² disagreement of 0.52 micro-units after 2M rows
    * (`a12_linreg`, r15). Sum magnitude stays exact to 10²⁶ (decimal 38
    * scale 12). The factor casts are ASYMMETRIC — (19,6) × (18,6) —
    * because DuckDB keeps an 18×18 multiply in int64 storage and
    * overflows at these magnitudes; one 19-wide factor forces hugeint,
    * giving DECIMAL(37,12) there and DECIMAL(38,12) in Spark, both
    * exact. Mirror: [[Sql.dsumProd]].
    */
  def dsumProd(x: Column, y: Column): Column =
    toD(sum(x.cast(DecimalType(19, Scale)) * y.cast(DecimalType(18, Scale))))

  /** Product-grade scale: a product of two scale-6 quantities is EXACT
    * at 12 decimals, so summing such products at scale 12 never rounds —
    * which matters because the engines' double→decimal casts round
    * DIFFERENTLY at a boundary (Spark rounds the double's exact binary
    * expansion, DuckDB its shortest decimal representation; a product
    * whose shortest form terminates in "…5" at the 7th decimal, e.g.
    * 0.2058315 ≈ 0.20583149999999997, splits them). Scale-12 sums of
    * round-6 × round-6 products sit ON the grid, 5e-13 from any
    * boundary, so the cast is exact in both engines. Oracle mirror must
    * use [[Sql.dsumP]] (VARCHAR-routed: pico-unit magnitudes exceed 2^53
    * — the [[Sql.dsumExact]] double-rounding hazard).
    */
  val ScaleP = 12
  private val DecP = DecimalType(30, ScaleP)

  /** Order-independent sum of PRODUCTS of two round-6 quantities —
    * exact, boundary-free (see [[ScaleP]]).
    */
  def dsumP(c: Column): Column = toD(sum(c.cast(DecP)))

  /** Order-independent mean: exact decimal sum divided by count (one
    * IEEE division — identical in any engine evaluating the same text).
    */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Multiplicity-weighted [[davg]] — BIT-IDENTICAL to `davg` over the
    * frame with each row physically repeated `w` times: the exact
    * decimal sum of w copies of x equals the exact decimal sum of x·w
    * (integer w), and the denominator counts only rows whose value is
    * non-null, exactly as `count(c)` does over the exploded form. Lets
    * bootstrap consumers aggregate multiplicities instead of exploding
    * them (guide §2.3).
    */
  def davgW(c: Column, w: Column): Column =
    toD(sum(dec(c) * w)) /
      sum(when(c.isNotNull, w.cast("long")).otherwise(0L))

  /** Multiplicity-weighted [[dsum]] — BIT-IDENTICAL to `dsum` over the
    * frame with each row physically repeated `w` times (the [[davgW]]
    * lemma: the exact decimal sum of w integer copies of x equals the
    * exact decimal sum of x·w). Lets the sharded GOF kernels compute
    * their moment statistics from the distinct-value relation they
    * already build, instead of paying a second full pass over the rows.
    */
  def dsumW(c: Column, w: Column): Column = toD(sum(dec(c) * w))

  /** Sample standard deviation via exact moments:
    * sqrt((sxx - sx*sx/n) / (n-1)). sx and sxx are exact decimals; the
    * final expression is a fixed sequence of IEEE double ops, so any engine
    * computing the same formula gets the same bits. SQL mirror:
    *   SQRT((CAST(SUM(CAST(x*x AS DECIMAL(30,6))) AS DOUBLE)
    *         - CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DOUBLE)
    *           * CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DOUBLE)
    *           / COUNT(x)) / (COUNT(x) - 1))
    */
  def dstd(c: Column): Column = {
    val sx  = toD(sum(dec(c)))
    val sxx = toD(sum(dec(c * c)))
    val n   = count(c)
    sqrt((sxx - sx * sx / n) / (n - lit(1)))
  }

  /** SQL-text builders for the DuckDB oracle side, kept adjacent to the
    * Scala forms above so the two can never drift.
    */
  object Sql {
    /** VARCHAR-routed like [[dsumExact]] — since r15 the two forms are
      * the same: below 2^53 micro-units the direct and VARCHAR casts
      * agree exactly, above it only the VARCHAR route is correctly
      * rounded, so there is no regime where the direct cast is the one
      * you want (and the engine side is now string-routed to match at
      * every magnitude).
      */
    def dsum(x: String): String = dsumExact(x)

    /** Correctly-rounded decimal→double for the oracle side. DuckDB's
      * direct `CAST(DECIMAL AS DOUBLE)` double-rounds (int128 → double,
      * then ÷10^scale), which is 1 ulp off nearest for sums whose
      * micro-unit magnitude exceeds 2^53 — e.g. Σ price² at sf0.01 is
      * ~7.4e13 with 6 decimals ≈ 20 significant digits, and all three
      * l_returnflag groups land on a misrounded ulp. Spark's
      * `Decimal.toDouble` (BigDecimal.doubleValue) is correctly rounded,
      * so the engines disagree on the MOMENT, not on any later
      * arithmetic. Routing the oracle cast through VARCHAR (exact
      * digits → fast_float strtod, single correct rounding) restores
      * bit-parity with no change on the engine side. Use this form in
      * any oracle whose unrounded result consumes a sum that can exceed
      * 2^53 micro-units.
      */
    def dsumExact(x: String): String =
      s"CAST(CAST(SUM(CAST($x AS DECIMAL(30,$Scale))) AS VARCHAR) AS DOUBLE)"

    /** Mirror of [[DetAgg.dsumProd]] — factor-wise DECIMAL(18,6) casts,
      * exact decimal product, VARCHAR-routed final cast.
      */
    def dsumProd(x: String, y: String): String =
      s"CAST(CAST(SUM(CAST($x AS DECIMAL(19,$Scale)) * CAST($y AS DECIMAL(18,$Scale))) AS VARCHAR) AS DOUBLE)"
    /** Mirror of [[DetAgg.dsumP]] — VARCHAR-routed like [[dsumExact]]
      * because scale-12 sums exceed 2^53 pico-units almost immediately.
      */
    def dsumP(x: String): String =
      s"CAST(CAST(SUM(CAST($x AS DECIMAL(30,${DetAgg.ScaleP}))) AS VARCHAR) AS DOUBLE)"

    def davg(x: String): String =
      s"${dsum(x)} / COUNT($x)"
    def dstd(x: String): String =
      s"SQRT((${dsum(s"($x)*($x)")} - ${dsum(x)} * ${dsum(x)} / COUNT($x)) / (COUNT($x) - 1))"
  }
}
