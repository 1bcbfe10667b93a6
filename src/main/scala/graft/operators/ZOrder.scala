package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of two quantized
  * dimensions so range-partitioned, sorted-within-partition output keeps
  * BOTH dimensions locally narrow per file. Parquet prunes row groups by
  * min/max stats, so a 2-D box predicate skips most files of a z-ordered
  * layout where a single-column sort only helps its own column — the
  * standard layout trick for multi-dimension scan-heavy tables (event
  * time × user, voltage × temperature, …).
  *
  * Pure column arithmetic (quantize → bit-interleave as a fixed fold of
  * shifts/masks) — no UDF, stays in codegen.
  */
object ZOrder {

  /** Morton value of (x, y) quantized to `bits` bits per dimension over
    * the given value ranges (plan-side constants — compute them once with
    * [[Profile.describeNumeric]] or domain knowledge).
    */
  def zValue(
      x: Column, xMin: Double, xMax: Double,
      y: Column, yMin: Double, yMax: Double,
      bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits per dimension must be in [1, 31]")
    def q(c: Column, lo: Double, hi: Double): Column =
      least(
        greatest(floor((c - lit(lo)) / lit(hi - lo) * lit(1L << bits)), lit(0L)),
        lit((1L << bits) - 1)).cast("long")
    val bx = q(x, xMin, xMax)
    val by = q(y, yMin, yMax)
    (0 until bits).map { b =>
      shiftleft(shiftright(bx, b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftright(by, b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduce(_ + _) // disjoint bit positions: sum == OR
  }

  /** Range-partition by the z-value and sort within partitions — each
    * output file then covers a compact Morton range, i.e. a small box in
    * (x, y) space.
    */
  def clusterBy(df: DataFrame, zv: Column, partitions: Int): DataFrame =
    df.repartitionByRange(partitions, zv).sortWithinPartitions(zv)
}
