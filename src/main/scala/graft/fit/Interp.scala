package graft.fit

/** 1-D linear interpolation + level-crossing inversion (SURVEY §2.8 N4 —
  * reference `scipy.interpolate.interp1d` usage at
  * `scripts/calculate_inter_pixel_distance_for_single_1D_scan.py:11-43`).
  * Pure Scala over small per-group profiles (the scale axis is the number
  * of groups, not points per group).
  */
object Interp {

  /** Linear interpolation y(x) over (xs, ys) sorted by xs ascending.
    * Clamps outside the domain (scipy `fill_value` edge behavior).
    */
  def interp1d(xs: Array[Double], ys: Array[Double], x: Double): Double = {
    require(xs.length == ys.length && xs.nonEmpty)
    if (x <= xs.head) return ys.head
    if (x >= xs.last) return ys.last
    var i = java.util.Arrays.binarySearch(xs, x)
    if (i >= 0) return ys(i)
    i = -i - 1 // insertion point: xs(i-1) < x < xs(i)
    val t = (x - xs(i - 1)) / (xs(i) - xs(i - 1))
    ys(i - 1) + t * (ys(i) - ys(i - 1))
  }

  /** All x positions where the piecewise-linear y(x) crosses `level`,
    * found by bracket scan + inverse interpolation (the 50%-crossing
    * search of the reference's inter-pixel-distance estimate).
    */
  def crossings(xs: Array[Double], ys: Array[Double], level: Double): Array[Double] = {
    require(xs.length == ys.length)
    val out = Array.newBuilder[Double]
    var i = 1
    while (i < xs.length) {
      val (y0, y1) = (ys(i - 1), ys(i))
      if (y0 == level) out += xs(i - 1)
      else if ((y0 < level && y1 >= level) || (y0 > level && y1 <= level)) {
        val t = (level - y0) / (y1 - y0)
        out += xs(i - 1) + t * (xs(i) - xs(i - 1))
      }
      i += 1
    }
    if (xs.nonEmpty && ys.last == level) out += xs.last
    out.result().distinct
  }

  /** First crossing or NaN. */
  def firstCrossing(xs: Array[Double], ys: Array[Double], level: Double): Double = {
    val c = crossings(xs, ys, level)
    if (c.isEmpty) Double.NaN else c.head
  }
}
