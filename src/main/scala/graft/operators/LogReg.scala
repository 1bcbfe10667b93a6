package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.DetAgg

/** Distributed logistic-regression trainer by full-batch gradient
  * descent — the model-based quality-classifier step of a curation
  * pipeline (fastText-style filtering), built so the TRAINING LOOP
  * itself is a deterministic Spark plan:
  *
  *   β⁽ᵏ⁺¹⁾_j = β⁽ᵏ⁾_j − lr · Σᵢ (σ(xᵢ·β⁽ᵏ⁾) − yᵢ) · xᵢⱼ / N
  *
  * Each iteration is ONE hash aggregate over the feature table with the
  * current β as a broadcast 1-row relation (the PSI/chi² shape); no
  * driver-side collect anywhere — `iters` iterations chain as `iters`
  * aggregates in a single plan, each a full scan with map-side partials.
  * At 100 TB that is the textbook distributed GD: per-iteration cost is
  * one pass, parallelism is the scan's, and the only state is p+1
  * broadcast doubles.
  *
  * Determinism (the part plain GD gets wrong): features are quantized
  * to 6 decimals once, σ is rounded to 6 decimals (the LM-score
  * ln-parity contract — absorbs the ≤1-ulp engine spread of `exp`), and
  * per-feature gradient terms (σ−y)·xⱼ — products of two round-6
  * quantities, hence EXACT at 12 decimals — ride [[DetAgg.dsumP]]
  * scale-12 decimal sums, which are order-independent AND boundary-free
  * (a plain scale-6 cast of the product is where the engines' exact-
  * value vs shortest-repr double→decimal roundings split — see
  * [[DetAgg.ScaleP]]). The β update is a fixed IEEE expression over
  * those exact sums, so the trained coefficients are bit-identical
  * across engines and cluster sizes, and a DuckDB oracle can replay
  * training exactly.
  */
object LogReg {

  /** Train on `df`: `features` are double columns (include a constant
    * 1.0 column for the intercept), `label` a 0.0/1.0 column. Returns
    * (feature string, coef double), one row per feature, in `features`
    * order.
    */
  def train(
      df: DataFrame,
      features: Seq[String],
      label: Column,
      iters: Int = 5,
      lr: Double = 0.5): DataFrame = {
    require(features.nonEmpty && iters >= 1 && lr > 0, "bad training config")
    val p = features.size
    val feats = df.select(
      features.map(f => round(col(f), 6).as(f)) :+ label.cast("double").as("__y"): _*)
    var beta: DataFrame = feats.sparkSession.range(1)
      .select((0 until p).map(j => lit(0.0).as(s"__b$j")): _*)
    for (_ <- 1 to iters) {
      val joined = feats.crossJoin(broadcast(beta))
      val z = features.zipWithIndex
        .map { case (f, j) => col(s"__b$j") * col(f) }
        .reduce(_ + _)
      val g = round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
      val bcols = (0 until p).map(j => col(s"__b$j"))
      val aggs = features.zipWithIndex.map { case (f, j) =>
        DetAgg.dsumP((g - col("__y")) * col(f)).as(s"__g$j")
      } :+ count(lit(1)).as("__n")
      val grads = joined.groupBy(bcols: _*).agg(aggs.head, aggs.tail: _*)
      beta = grads.select((0 until p).map(j =>
        (col(s"__b$j") - lit(lr) * col(s"__g$j") / col("__n")).as(s"__b$j")): _*)
    }
    beta.select(posexplode(array((0 until p).map(j => col(s"__b$j")): _*))
      .as(Seq("__i", "coef")))
      .select(
        element_at(array(features.map(lit): _*), col("__i") + 1).as("feature"),
        col("coef"))
  }

  /** The matching DuckDB oracle text: `featsSql` must be a CTE body
    * selecting the same feature columns and `y`; feature expressions in
    * the iteration are the bare column names. Kept adjacent to [[train]]
    * (the DetAgg.Sql discipline) so the two loop bodies can never drift.
    */
  def oracleSql(
      featsCte: String,
      features: Seq[String],
      iters: Int = 5,
      lr: Double = 0.5): String = {
    val out = features.zipWithIndex.map { case (f, j) =>
      s"SELECT '$f' AS feature, b$j AS coef FROM b$iters"
    }.mkString("\nUNION ALL ")
    s"""WITH ${trainingCtes(featsCte, features, iters, lr)}
       |$out""".stripMargin
  }

  /** Reliability-diagram bins + ECE + Brier over a scored relation
    * `(g double round-6 ∈ [0,1], y double 0/1)` — the calibration tail
    * shared by `ml_calibration_bins` (which hash-checks it against the
    * DuckDB replay) and LogRegSpec's separable fixture (which pins the
    * arithmetic by hand). Per equal-width bin: count, mean confidence
    * (exact decimal sum ÷ count), observed rate (exact integers); ECE
    * folds round-6 per-bin terms on the exact-decimal route (order-
    * free); Brier rides dsumP. Everything heavy is one hash aggregate.
    */
  def calibrationBins(scored: DataFrame, nBins: Int = 10): DataFrame = {
    val bins = scored.select(
      least(floor(col("g") * nBins).cast("long"), lit(nBins - 1L)).as("bin"),
      col("g"), col("y"))
    val agg = bins.groupBy("bin").agg(
      count(lit(1)).as("n_bin"),
      DetAgg.dsum(col("g")).as("sg"),
      sum(col("y").cast("long")).cast("long").as("n_pos"))
    val tot = bins.agg(
      count(lit(1)).as("n"),
      DetAgg.dsumP((col("g") - col("y")) * (col("g") - col("y"))).as("sq"))
    val ece = agg.crossJoin(broadcast(tot)).agg(
      DetAgg.dsum(round(
        abs(col("n_pos").cast("double") / col("n_bin") - col("sg") / col("n_bin"))
          * col("n_bin") / col("n"), 6)).as("ece"))
    agg.crossJoin(broadcast(tot)).crossJoin(broadcast(ece))
      .select(
        col("bin"), col("n_bin"),
        round(col("sg") / col("n_bin"), 6).as("conf"),
        round(col("n_pos").cast("double") / col("n_bin"), 6).as("acc"),
        round(col("ece"), 6).as("ece"),
        round(col("sq") / col("n"), 6).as("brier"))
  }

  /** The training-replay CTE chain alone — `feats(…features…, y)` round-6
    * quantized and `b0..b$iters` coefficient relations — so downstream
    * oracles (calibration, scoring) can CROSS JOIN the trained `b$iters`
    * without duplicating the loop text. [[oracleSql]] is this plus the
    * exploded coefficient select.
    */
  def trainingCtes(
      featsCte: String,
      features: Seq[String],
      iters: Int = 5,
      lr: Double = 0.5): String = {
    val D = DetAgg.Sql
    val p = features.size
    val b0 = (0 until p).map(j => s"0.0 AS b$j").mkString(", ")
    val its = (1 to iters).map { k =>
      val z = features.zipWithIndex
        .map { case (f, j) => s"b$j * $f" }.mkString(" + ")
      val g = s"ROUND(1.0 / (1.0 + EXP(-($z))), 6)"
      val sums = features.zipWithIndex.map { case (f, j) =>
        s"${D.dsumP(s"($g - y) * $f")} AS g$j"
      }.mkString(",\n      ")
      val bsel = (0 until p).map(j => s"b$j - $lr * g$j / n AS b$j").mkString(", ")
      val bprev = (0 until p).map(j => s"b$j").mkString(", ")
      s"""g$k AS (
         |  SELECT $bprev,
         |      $sums,
         |      COUNT(*) AS n
         |  FROM feats CROSS JOIN b${k - 1} GROUP BY $bprev),
         |b$k AS (SELECT $bsel FROM g$k)""".stripMargin
    }.mkString(",\n")
    // same round-6 feature quantization as [[train]]
    val fq = features.map(f => s"ROUND($f, 6) AS $f").mkString(", ")
    s"""feats_raw AS ($featsCte),
       |feats AS (SELECT $fq, y FROM feats_raw),
       |b0 AS (SELECT $b0),
       |$its""".stripMargin
  }
}
