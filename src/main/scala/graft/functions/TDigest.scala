package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable t-digest quantile sketch (Dunning & Ertl, "Computing
  * extremely accurate quantiles using t-digests" — public algorithm).
  *
  * The 100 TB quantile tier: per-partition sketches of BOUNDED size
  * (O(compression) centroids regardless of row count) merge
  * associatively in the shuffle, so a full-table quantile costs one
  * map-side pass + a tiny reduce — unlike exact `median` (full sort) or
  * buffering aggregators (unbounded state, die around 10⁸ rows per
  * group). Accuracy concentrates at the tails by construction: centroid
  * size is capped by 4·n·q·(1−q)/δ, so q01/q99 are far tighter than the
  * uniform-error guarantee of `percentile_approx`'s KLL-ish sketch.
  *
  * Buffer layout: a flat array of (mean, weight) pairs — `bufN` merged
  * centroids in sorted order, plus up to `UnmergedCap` unsorted raw
  * points appended after them; `compress()` re-clusters both. Kryo
  * serialization between partial and final aggregation stays small
  * because the buffer is compressed before it exceeds ~4δ entries.
  */
object TDigest {

  final val UnmergedCap = 512

  /** Sketch state: centroid means/weights (first `n` slots merged +
    * sorted), then `u` unmerged raw points; tracked global min/max for
    * tail clamping.
    */
  final class Buf(
      var means: Array[Double],
      var weights: Array[Double],
      var n: Int,
      var u: Int,
      var lo: Double,
      var hi: Double) {
    def this() = this(new Array[Double](0), new Array[Double](0), 0, 0,
      Double.PositiveInfinity, Double.NegativeInfinity)
  }

  final class Agg(compression: Double, quantiles: Seq[Double])
      extends Aggregator[java.lang.Double, Buf, Seq[Double]] {

    private def ensure(b: Buf, extra: Int): Unit = {
      val need = b.n + b.u + extra
      if (b.means.length < need) {
        val cap = math.max(need, math.max(16, b.means.length * 2))
        b.means = java.util.Arrays.copyOf(b.means, cap)
        b.weights = java.util.Arrays.copyOf(b.weights, cap)
      }
    }

    /** Re-cluster everything in `b` (merged + unmerged) with the
      * 4·n·q·(1−q)/δ size bound.
      */
    private def compress(b: Buf): Unit = {
      val m = b.n + b.u
      if (m == 0) { b.u = 0; return }
      // sort all (mean, weight) pairs by mean
      val idx = (0 until m).sortBy(i => b.means(i))
      val sm = idx.map(i => b.means(i)).toArray
      val sw = idx.map(i => b.weights(i)).toArray
      val total = sw.sum
      var outN = 0
      var curMean = sm(0); var curW = sw(0); var wSoFar = 0.0
      val om = new Array[Double](m); val ow = new Array[Double](m)
      var i = 1
      while (i < m) {
        // size bound evaluated at the MIDPOINT of the would-be merged
        // centroid (Dunning's published form) — the right-edge variant
        // slightly over-admits merges near the tails
        val q = (wSoFar + (curW + sw(i)) / 2) / total
        val limit = 4.0 * total * q * (1.0 - q) / compression
        if (curW + sw(i) <= limit) {
          // weighted-mean merge into the current centroid
          curMean = (curMean * curW + sm(i) * sw(i)) / (curW + sw(i))
          curW += sw(i)
        } else {
          om(outN) = curMean; ow(outN) = curW; outN += 1
          wSoFar += curW
          curMean = sm(i); curW = sw(i)
        }
        i += 1
      }
      om(outN) = curMean; ow(outN) = curW; outN += 1
      b.means = java.util.Arrays.copyOf(om, math.max(outN, 16))
      b.weights = java.util.Arrays.copyOf(ow, math.max(outN, 16))
      b.n = outN
      b.u = 0
    }

    def zero: Buf = new Buf()

    def reduce(b: Buf, x: java.lang.Double): Buf = {
      if (x == null || x.isNaN) return b
      val v = x.doubleValue()
      ensure(b, 1)
      b.means(b.n + b.u) = v
      b.weights(b.n + b.u) = 1.0
      b.u += 1
      if (v < b.lo) b.lo = v
      if (v > b.hi) b.hi = v
      if (b.u >= UnmergedCap) compress(b)
      b
    }

    def merge(a: Buf, c: Buf): Buf = {
      if (c.n + c.u == 0) return a
      ensure(a, c.n + c.u)
      System.arraycopy(c.means, 0, a.means, a.n + a.u, c.n + c.u)
      System.arraycopy(c.weights, 0, a.weights, a.n + a.u, c.n + c.u)
      a.u += c.n + c.u
      if (c.lo < a.lo) a.lo = c.lo
      if (c.hi > a.hi) a.hi = c.hi
      compress(a)
      a
    }

    def finish(b: Buf): Seq[Double] = {
      compress(b)
      if (b.n == 0) return quantiles.map(_ => Double.NaN)
      val total = (0 until b.n).map(i => b.weights(i)).sum
      quantiles.map { q =>
        val target = q * total
        // piecewise-linear through centroid midpoints, clamped to
        // observed min/max at the tails
        var cum = 0.0; var i = 0; var res = Double.NaN
        var prevMid = 0.0; var prevMean = b.lo
        while (i < b.n && res.isNaN) {
          val mid = cum + b.weights(i) / 2
          if (target <= mid) {
            val frac = if (mid - prevMid <= 0) 0.0 else (target - prevMid) / (mid - prevMid)
            res = prevMean + frac * (b.means(i) - prevMean)
          } else { prevMid = mid; prevMean = b.means(i); cum += b.weights(i); i += 1 }
        }
        if (res.isNaN) res = b.hi
        math.min(b.hi, math.max(b.lo, res))
      }
    }

    def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** `tdigest_quantiles(col)` → array<double> of the requested quantiles. */
  def quantilesAgg(c: Column, qs: Seq[Double], compression: Double = 100.0): Column =
    udaf(new Agg(compression, qs)).apply(c)
}
