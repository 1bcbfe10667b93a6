package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog (Flajolet et al. 2007) built to be ORACLE-REPLAYABLE —
  * unlike Spark's built-in `approx_count_distinct` (HLL++ with an opaque
  * binary sketch, verifiable only rows-only), every piece of this one is
  * portable integer arithmetic, so a DuckDB oracle reproduces the
  * registers AND the estimate bit-for-bit:
  *
  *  - the hash is a 32-bit multiply–fold (three 16-bit-multiplier
  *    rounds, every intermediate < 2^63: BIGINT overflow is an error in
  *    ANSI engines, silent wrap in Java — avoid both);
  *  - registers are a `MAX` hash-aggregate per bucket (mergeable,
  *    m = 2^p cells of state — the whole point at 100 TB: distinct
  *    counts from constant memory, shard sketches merging by cell-wise
  *    MAX exactly like [[CountMin]] merges by sum);
  *  - ρ (leading-zero rank) is an integer CASE ladder, not
  *    `floor(log2(w))` (whose float round-off at exact powers of two is
  *    an engine-dependent hazard);
  *  - the harmonic denominator Σ 2^−reg is EXACT in double regardless
  *    of addition order: every term is a power of two with exponent in
  *    [−25, 0], so the running sum's mantissa spans ≤ 25+log2(m) < 53
  *    bits — no DetAgg routing needed, the float sum is deterministic
  *    by construction;
  *  - the bias constant α·m² is embedded as ONE shared literal, and the
  *    small-range linear-counting branch (`E ≤ 2.5m` with empty
  *    registers) is the only place a transcendental (ln) appears —
  *    the final estimate is rounded at 6 there (the PMI discipline).
  */
object Hll {

  val P = 8
  val M = 1 << P // 256 registers
  val AlphaM2 = "47072.71267120224" // 0.7213/(1+1.079/256) * 256², shared literal
  val WBits = 32 - P // rank window

  /** `x · c mod 2^32` WITHOUT a 64-bit wrap (which would be an error in
    * ANSI engines): split x into 16-bit halves — the high half's
    * contribution mod 2^32 is `((hi·c) mod 2^16) · 2^16`, so every
    * intermediate stays < 2^49.
    */
  private def mul32(x: Column, c: Long): Column =
    pmod(
      pmod(x, lit(65536L)) * c +
        pmod(shiftright(x, 16) * c, lit(65536L)) * 65536L,
      lit(4294967296L))

  /** 32-bit portable hash of a NON-NEGATIVE BIGINT column: fold the
    * halves, then the murmur3 fmix32 finalizer (xor-shift / wrap-multiply
    * rounds — full avalanche, so sequential and strided id spaces
    * disperse properly; the first 16-bit-multiplier attempt measurably
    * did not). Mirror: [[hashSql]].
    */
  def hash32(v: Column): Column = {
    val f = pmod(v, lit(4294967296L)).bitwiseXOR(shiftright(v, 32))
    val a = f.bitwiseXOR(shiftright(f, 16))
    val b = mul32(a, 0x85ebca6bL)
    val c = b.bitwiseXOR(shiftright(b, 13))
    val d = mul32(c, 0xc2b2ae35L)
    d.bitwiseXOR(shiftright(d, 16))
  }

  private def mul32Sql(x: String, c: Long): String =
    s"(($x % 65536 * $c + ($x // 65536 * $c % 65536) * 65536) % 4294967296)"

  /** The same hash as SQL text over non-negative `v` (kept adjacent —
    * the DetAgg.Sql discipline). `//` and `%` match `shiftright`/`pmod`
    * because every operand is non-negative by construction.
    */
  def hashSql(v: String): String = {
    val f = s"xor($v % 4294967296, $v // 4294967296)"
    val a = s"xor($f, $f // 65536)"
    val b = mul32Sql(s"($a)", 0x85ebca6bL)
    val c = s"xor($b, $b // 8192)"
    val d = mul32Sql(s"($c)", 0xc2b2ae35L)
    s"xor($d, $d // 65536)"
  }

  /** Integer CASE ladder for ρ = (leading zeros of the `WBits`-bit word
    * `w`) + 1; w = 0 ⇒ WBits + 1.
    */
  def rho(w: Column): Column =
    (1 to WBits).foldLeft(when(w >= (1L << (WBits - 1)), 1)) { (acc, i) =>
      if (i == 1) acc
      else acc.when(w >= (1L << (WBits - i)), i)
    }.otherwise(WBits + 1)

  /** The ρ ladder as SQL text. */
  def rhoSql(w: String): String =
    (1 to WBits).map(i => s"WHEN $w >= ${1L << (WBits - i)} THEN $i")
      .mkString("CASE ", " ", s" ELSE ${WBits + 1} END")

  /** The m-cell register relation (bucket, reg) over a non-negative
    * BIGINT column `v`; absent buckets mean register 0.
    */
  def registers(values: DataFrame): DataFrame = {
    val h = hash32(col("v"))
    values
      .select(pmod(h, lit(M.toLong)).as("bucket"), shiftright(h, P).as("__w"))
      .groupBy("bucket").agg(max(rho(col("__w"))).as("reg"))
  }

  /** One-row (n_est) estimate from a register relation: raw harmonic
    * estimate, linear-counting correction in the small range.
    */
  def estimate(regs: DataFrame): DataFrame =
    regs
      .agg(
        count(lit(1)).as("__nz"), // buckets with reg ≥ 1 (present rows)
        sum(expr("1.0 / CAST(shiftleft(CAST(1 AS BIGINT), reg) AS DOUBLE)")).as("__s"))
      .select(
        (lit(M) - col("__nz")).as("__zeros"),
        (col("__s") + (lit(M) - col("__nz")).cast("double")).as("__denom"))
      .select(
        when(
          expr(s"$AlphaM2 / __denom") <= 2.5 * M && col("__zeros") > 0,
          round(lit(M.toDouble) * log(lit(M.toDouble) / col("__zeros").cast("double")), 6))
          .otherwise(round(expr(s"$AlphaM2 / __denom"), 6))
          .as("n_est"))
}
