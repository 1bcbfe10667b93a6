package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.plans.VectorExpressions

/** Principal-component extraction over the embedding table — the
  * dimensionality probe of a corpus (is the embedding space collapsing to
  * a few directions? what fraction of variance does the top component
  * hold?).
  *
  * Two-phase, the trained-model discipline ([[TrainCache]] family):
  *
  *   1. ONE distributed pass folds the corpus into the exact integer Gram
  *      sketch — count, per-dim sums, and the upper-triangular Σ qᵢ·qⱼ of
  *      the µ-quantized vectors (`floor(x·1e6 + 0.5)`, the
  *      `emb_quantize_int8` rounding discipline) — via a typed
  *      [[Aggregator]] with an `Array[Long]` buffer: O(d²) longs per
  *      partition, associative and ORDER-INDEPENDENT (integer adds), so
  *      the sketch is bit-identical on any cluster shape. d²·8 bytes
  *      (32 KiB at d = 64) is the whole shuffle payload.
  *   2. The d×d covariance (tiny, driver-side — the allowed trained-model
  *      collect) runs `iters` power iterations for the dominant
  *      eigenvector; the sign is canonicalized (first component of
  *      magnitude > 1e-12 made positive) so the output never flips
  *      between runs.
  *
  * Scoring then projects every row onto the component with the codegen'd
  * [[VectorExpressions.dotFast]] — one map-side pass, no shuffle.
  */
object Pca {

  /** Exact integer Gram sketch: buffer layout `[n, s_0..s_{d-1},
    * p_00, p_01, .., p_0{d-1}, p_11, ..]` (upper triangle row-major).
    */
  final class GramAgg(dim: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    private val nTri = dim * (dim + 1) / 2
    def zero: Array[Long] = new Array[Long](1 + dim + nTri)
    def reduce(b: Array[Long], v: Seq[Long]): Array[Long] = {
      if (v != null && v.length == dim) {
        b(0) += 1L
        val a = v.toArray
        var i = 0
        var t = 1 + dim
        while (i < dim) {
          b(1 + i) += a(i)
          var j = i
          while (j < dim) { b(t) += a(i) * a(j); t += 1; j += 1 }
          i += 1
        }
      }
      b
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
    def finish(b: Array[Long]): Seq[Long] = b.toSeq
    // ExpressionEncoders, not Kryo: the long-array buffer serializes as a
    // native unsafe array (faster), and Kryo's FieldSerializer trips JDK-17
    // module access on a bare JVM (no --add-opens) — the Verify entrypoint.
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** `residual` is the eigen-equation defect ‖Cw − λw‖₂ of the returned
    * (w, λ) — the convergence certificate: a small residual relative to
    * λ proves w is (numerically) a true eigenvector, independent of how
    * many iterations ran.
    */
  final case class Component(
      w: Array[Double], eigenvalue: Double, n: Long,
      residual: Double = Double.NaN)

  /** Dominant covariance eigenvector of `vecCol` (array column, `dim`
    * entries) by the two-phase pass above. Covariance is computed in
    * µ²-units from the exact integer sketch, then rescaled — so the
    * matrix handed to the power iteration is deterministic to the bit.
    */
  def topComponent(df: DataFrame, vecCol: String, dim: Int, iters: Int = 30): Component = {
    val sp = df.sparkSession
    import sp.implicits._
    val quant = df
      .select(transform(
        col(vecCol).cast("array<double>"),
        x => floor(x * lit(1000000d) + lit(0.5d)).cast("long")).as("q"))
      .as[Seq[Long]]
    val sketch = quant.select(new GramAgg(dim).toColumn).head()
    val n = sketch.head
    require(n > 0, s"PCA over an empty relation")
    val s = sketch.slice(1, 1 + dim).map(_.toDouble)
    val cov = Array.ofDim[Double](dim, dim)
    var t = 1 + dim
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = (sketch(t).toDouble - s(i) * s(j) / n) / n / 1e12
        cov(i)(j) = c; cov(j)(i) = c
        t += 1; j += 1
      }
      i += 1
    }
    var w = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var lambda = 0.0
    var it = 0
    while (it < iters) {
      val nw = Array.tabulate(dim) { r =>
        var acc = 0.0; var c = 0
        while (c < dim) { acc += cov(r)(c) * w(c); c += 1 }
        acc
      }
      val norm = math.sqrt(nw.map(x => x * x).sum)
      if (norm > 0) { lambda = norm; w = nw.map(_ / norm) }
      it += 1
    }
    val lead = w.indexWhere(x => math.abs(x) > 1e-12)
    if (lead >= 0 && w(lead) < 0) w = w.map(-_)
    // eigen-equation defect of the final iterate (one more d² multiply,
    // driver-side): ‖Cw − λw‖₂
    val defect = math.sqrt(
      (0 until dim).map { r =>
        var acc = 0.0; var c = 0
        while (c < dim) { acc += cov(r)(c) * w(c); c += 1 }
        val d0 = acc - lambda * w(r)
        d0 * d0
      }.sum)
    Component(w, lambda, n, defect)
  }

  /** Projection scores of every row onto a fixed component — the
    * map-only serving pass.
    */
  def scores(df: DataFrame, id: String, vecCol: String, w: Array[Double]): DataFrame = {
    val wLit = array(w.map(lit(_)): _*)
    df.select(
      col(id),
      VectorExpressions.dotFast(col(vecCol).cast("array<double>"), wLit).as("score"))
  }
}
