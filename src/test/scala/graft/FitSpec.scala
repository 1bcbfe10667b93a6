package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.fit.{CurveFits, FitAggregators, Interp, Landau}

class FitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("Landau pdf: known value at 0, peak location, unit mass") {
    assert(math.abs(Landau.pdf(0.0) - 0.1788541609) < 1e-9)
    // mode of the standard Landau is near -0.2228
    val grid = BigDecimal(-2.0) to BigDecimal(2.0) by BigDecimal(0.0001)
    val mode = grid.map(_.toDouble).maxBy(Landau.pdf)
    assert(math.abs(mode - (-0.2228)) < 0.01, s"mode=$mode")
    // heavy right tail, but mass integrates to ~1
    val mass = (BigDecimal(-8.0) to BigDecimal(3000.0) by BigDecimal(0.01))
      .map(v => Landau.pdf(v.toDouble) * 0.01).sum
    assert(mass > 0.98 && mass < 1.005, s"mass=$mass")
  }

  test("langauss: wider than landau, peak near mpv parameter") {
    val mpv = 10.0; val xi = 0.8; val sigma = 1.2
    val xs = (0 to 400).map(i => i * 0.1).toArray
    val ys = xs.map(Landau.langauss(_, mpv, xi, sigma))
    val peak = xs(ys.indexOf(ys.max))
    assert(math.abs(peak - mpv) < 1.0, s"peak=$peak")
  }

  test("fitGaussian recovers injected parameters on a noiseless curve") {
    val p0 = CurveFits.GaussParams(5.0, 2.0, 10.0)
    val xs = (-40 to 200).map(_ * 0.1).toArray
    val ys = xs.map(CurveFits.gaussian(_, p0))
    val got = CurveFits.fitGaussian(xs, ys)
    assert(math.abs(got.mu - 5.0) < 1e-3)
    assert(math.abs(got.sigma - 2.0) < 1e-3)
    assert(math.abs(got.amplitude - 10.0) < 1e-2)
  }

  test("ClosedForm Caruana solve recovers injected Gaussian from log-histogram") {
    import spark.implicits._
    val (mu0, sg0, a0) = (1.7, 3.1, 500.0)
    // noiseless log-parabola input: y = ln(A·exp(−(u−μ)²/2σ²)) on u∈[−12,12]
    val rows = (-12 to 12).map { u =>
      ("g", u.toLong, math.log(a0) - (u - mu0) * (u - mu0) / (2 * sg0 * sg0))
    }
    val uy = rows.toDF("g", "u", "y")
    val m = uy.groupBy("g").agg(
      count(lit(1)).cast("double").as("s0"),
      sum(col("u")).cast("double").as("su"),
      sum(col("u") * col("u")).cast("double").as("su2"),
      sum(col("u") * col("u") * col("u")).cast("double").as("su3"),
      sum(col("u") * col("u") * col("u") * col("u")).cast("double").as("su4"),
      sum(col("y")).as("sy"),
      sum(col("u") * col("y")).as("suy"),
      sum(col("u") * col("u") * col("y")).as("su2y"))
    val (d, na, nb, nc) = graft.fit.ClosedForm.cramerTexts
    val (muT, sgT, amT) = graft.fit.ClosedForm.paramTexts(center = 0.0, width = 1.0)
    val got = m
      .select(
        expr(s"($na)/($d)").as("a"),
        expr(s"($nb)/($d)").as("b"),
        expr(s"($nc)/($d)").as("c"))
      .select(expr(muT).as("mu"), expr(sgT).as("sigma"), expr(amT).as("amplitude"))
      .head()
    assert(math.abs(got.getDouble(0) - mu0) < 1e-9, s"mu=${got.getDouble(0)}")
    assert(math.abs(got.getDouble(1) - sg0) < 1e-9, s"sigma=${got.getDouble(1)}")
    assert(math.abs(got.getDouble(2) - a0) < 1e-6, s"amp=${got.getDouble(2)}")
  }

  test("ClosedForm yields NULL params on a non-concave (no-peak) profile") {
    import spark.implicits._
    val uy = (-5 to 5).map(u => ("g", u.toLong, 0.1 * u * u)).toDF("g", "u", "y")
    val m = uy.groupBy("g").agg(
      count(lit(1)).cast("double").as("s0"),
      sum(col("u")).cast("double").as("su"),
      sum(col("u") * col("u")).cast("double").as("su2"),
      sum(col("u") * col("u") * col("u")).cast("double").as("su3"),
      sum(col("u") * col("u") * col("u") * col("u")).cast("double").as("su4"),
      sum(col("y")).as("sy"),
      sum(col("u") * col("y")).as("suy"),
      sum(col("u") * col("u") * col("y")).as("su2y"))
    val (d, na, nb, nc) = graft.fit.ClosedForm.cramerTexts
    val (_, sgT, amT) = graft.fit.ClosedForm.paramTexts(center = 0.0, width = 1.0)
    val got = m
      .select(
        expr(s"($na)/($d)").as("a"),
        expr(s"($nb)/($d)").as("b"),
        expr(s"($nc)/($d)").as("c"))
      .select(expr(sgT).as("sigma"), expr(amT).as("amplitude"))
      .head()
    assert(got.isNullAt(0) && got.isNullAt(1))
  }

  test("fitErf recovers injected parameters") {
    val p0 = CurveFits.ErfParams(1.0, 0.5, 2.0, 1.0)
    val xs = (-60 to 80).map(_ * 0.05).toArray
    val ys = xs.map(CurveFits.erfModel(_, p0))
    val got = CurveFits.fitErf(xs, ys)
    assert(math.abs(got.x0 - 1.0) < 1e-2)
    assert(math.abs(got.sigma - 0.5) < 1e-2)
    assert(math.abs(got.yScale - 2.0) < 1e-2)
    assert(math.abs(got.yOffset - 1.0) < 1e-2)
  }

  test("fitLangauss recovers injected parameters on a noiseless curve") {
    val (mpv, xi, sigma, a) = (100.0, 8.0, 5.0, 1000.0)
    val xs = (40 to 300 by 2).map(_.toDouble).toArray
    val ys = xs.map(x => a * Landau.langauss(x, mpv, xi, sigma))
    val got = CurveFits.fitLangauss(xs, ys)
    assert(math.abs(got.mpv - mpv) / mpv < 0.05, s"mpv=${got.mpv}")
    assert(math.abs(got.xi - xi) / xi < 0.25, s"xi=${got.xi}")
    assert(math.abs(got.sigma - sigma) / sigma < 0.35, s"sigma=${got.sigma}")
  }

  test("quantile-based erf estimate recovers location and width of a normal CDF") {
    // y = Φ((x − 3)/2): x0 = 3, σ = 2
    val xs = (-700 to 1300).map(_ * 0.01).toArray
    val ys = xs.map(x => 0.5 * (1.0 +
      org.apache.commons.math3.special.Erf.erf((x - 3.0) / (2.0 * math.sqrt(2.0)))))
    val x25 = Interp.firstCrossing(xs, ys, 0.25)
    val x50 = Interp.firstCrossing(xs, ys, 0.50)
    val x75 = Interp.firstCrossing(xs, ys, 0.75)
    val sigma = (x75 - x25) / 1.3489795003921634
    assert(math.abs(x50 - 3.0) < 1e-3, s"x0=$x50")
    assert(math.abs(sigma - 2.0) < 1e-3, s"sigma=$sigma")
  }

  test("Acklam probit regression recovers a normal CDF's location and width") {
    import spark.implicits._
    // exact Φ((x − 3)/2) points, including both tail branches of Acklam
    val pts = (-500 to 1100 by 10).map { i =>
      val x = i * 0.01
      (x, 0.5 * (1.0 +
        org.apache.commons.math3.special.Erf.erf((x - 3.0) / (2.0 * math.sqrt(2.0)))))
    }.filter { case (_, y) => y > 1e-12 && y < 1.0 - 1e-12 }
    val df = pts.toDF("x", "y")
      .withColumn("z", expr(graft.fit.ClosedForm.probitText("y")))
    val r = df.agg(
      count(lit(1)).cast("double").as("n"),
      sum("z").as("sz"), sum("x").as("sx"),
      sum(col("z") * col("x")).as("szx"), sum(col("z") * col("z")).as("sz2"))
      .select(
        expr("(n * szx - sz * sx) / (n * sz2 - sz * sz)").as("sigma"),
        expr("(sx - ((n * szx - sz * sx) / (n * sz2 - sz * sz)) * sz) / n").as("x0"))
      .head()
    assert(math.abs(r.getDouble(0) - 2.0) < 1e-6, s"sigma=${r.getDouble(0)}")
    assert(math.abs(r.getDouble(1) - 3.0) < 1e-6, s"x0=${r.getDouble(1)}")
  }

  test("interp1d + crossings: exact on piecewise-linear data") {
    val xs = Array(0.0, 1.0, 2.0, 3.0)
    val ys = Array(0.0, 10.0, 10.0, 0.0)
    assert(Interp.interp1d(xs, ys, 0.5) == 5.0)
    assert(Interp.interp1d(xs, ys, -1.0) == 0.0) // clamp
    val c = Interp.crossings(xs, ys, 5.0)
    assert(c.toSeq == Seq(0.5, 2.5))
  }

  test("gaussianFit aggregator runs distributed per group") {
    import spark.implicits._
    val p = CurveFits.GaussParams(0.0, 1.0, 5.0)
    val rows = for {
      g <- Seq("a", "b"); i <- -50 to 50
    } yield (g, i * 0.1, CurveFits.gaussian(i * 0.1, p))
    val got = rows.toDF("g", "x", "y")
      .groupBy("g")
      .agg(FitAggregators.gaussianFit(col("x"), col("y")).as("fit"))
      .select(col("g"), col("fit.mu"), col("fit.sigma"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(got.length == 2)
    got.foreach { case (_, mu, sigma) =>
      assert(math.abs(mu) < 1e-3 && math.abs(sigma - 1.0) < 1e-3)
    }
  }
}
