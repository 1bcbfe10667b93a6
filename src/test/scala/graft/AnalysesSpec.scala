package graft

import org.apache.commons.math3.special.Erf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analyses.{InterPixelDistance, IvCurves, TimeResolution}

class AnalysesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("time resolution pipeline recovers the injected jitter sigma") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val sigma1 = 35.36e-12
    val nTriggers = 600
    // two devices; per-trigger timing jitter identical across thresholds
    val rows = (0 until nTriggers).flatMap { i =>
      val j1 = rnd.nextGaussian() * sigma1
      val j2 = rnd.nextGaussian() * sigma1
      Seq(("d1", i.toLong, j1), ("d2", i.toLong, j2))
    }
    val base = rows.toDF("device_name", "n_trigger", "jitter")
    val wide = TimeResolution.KGrid.foldLeft(base) { (df, k) =>
      df.withColumn(s"t_$k (s)", col("jitter") + lit(k * 1e-10))
    }.drop("jitter")
    val perReplica = TimeResolution.run(
      wide, TimeResolution.Config("d1", "d2", replicas = 8, seed = 1L, histBins = 40))
    val summary = TimeResolution.summarize(perReplica).collect().head
    val sigmaFit = summary.getAs[Double]("time_resolution_sigma")
    val sigmaTrue = math.sqrt(2.0) * sigma1 // ≈ 50 ps
    assert(math.abs(sigmaFit - sigmaTrue) / sigmaTrue < 0.25,
      s"fit $sigmaFit vs true $sigmaTrue")
    val err = summary.getAs[Double]("sigma_error")
    assert(err > 0 && err < sigmaTrue, s"bootstrap error $err")
  }

  test("binned-IQR flagship tier recovers sigma and leaks no cached RDDs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val sigma1 = 35.36e-12
    val rows = (0 until 600).flatMap { i =>
      Seq(("d1", i.toLong, rnd.nextGaussian() * sigma1),
        ("d2", i.toLong, rnd.nextGaussian() * sigma1))
    }
    val base = rows.toDF("device_name", "n_trigger", "jitter")
    val wide = TimeResolution.KGrid.foldLeft(base) { (df, k) =>
      df.withColumn(s"t_$k (s)", col("jitter") + lit(k * 1e-10))
    }.drop("jitter")
    val perReplica = TimeResolution.run(
      wide, TimeResolution.Config("d1", "d2", replicas = 8, seed = 1L,
        histBins = 40, iqrSpread = true))
    val summary = TimeResolution.summarize(perReplica).collect().head
    val sigmaFit = summary.getAs[Double]("time_resolution_sigma")
    val sigmaTrue = math.sqrt(2.0) * sigma1
    assert(math.abs(sigmaFit - sigmaTrue) / sigmaTrue < 0.25,
      s"fit $sigmaFit vs true $sigmaTrue")
    // run() is eager and bracket-cached: nothing stays persisted
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"leaked RDD caches: ${spark.sparkContext.getPersistentRDDs.keys}")
  }

  test("IPD pipeline recovers the injected 100 um gap") {
    import spark.implicits._
    val sigma = 20e-6
    val xs = (-40 to 40).map(_ * 5e-6)
    val rows = xs.flatMap { x =>
      val l = 0.5 * (1 - Erf.erf((x + 50e-6) / (sigma * math.sqrt(2))))
      val r = 0.5 * (1 + Erf.erf((x - 50e-6) / (sigma * math.sqrt(2))))
      Seq(("m1", "left", x, l), ("m1", "right", x, r))
    }
    val profile = rows.toDF("measurement_name", "Pad", "Distance (m)", "Normalized collected charge")
    val got = InterPixelDistance.ipd(profile).collect().head
    val ipd50 = got.getAs[Double]("IPD (m) at 50%")
    assert(math.abs(ipd50 - 100e-6) < 1e-6, s"ipd50=$ipd50")
    // symmetric thresholds bracket the 50% value
    assert(got.getAs[Double]("IPD (m) at 8%") != ipd50)
    val cal = InterPixelDistance.calibration(profile, windowSize = 300e-6).collect().head
    assert(math.abs(cal.getAs[Double]("scale") - 3.0) < 0.1)
    assert(math.abs(cal.getAs[Double]("offset")) < 2e-6)
  }

  test("IV federation: ramp-up trim + device join + per-voltage stats") {
    import spark.implicits._
    val iv = (for {
      m <- Seq("m1", "m2"); rep <- 0 until 4; v <- 0 until 10
    } yield {
      // first 20 readings ramp up, next 20 ramp down (reference keeps half)
      val idx = rep * 10 + v
      (m, "devX", (v * 10).toDouble, 1e-9 * (v + 1) + 1e-12 * rep,
        java.sql.Timestamp.valueOf(f"2022-01-01 00:${idx / 60}%02d:${idx % 60}%02d"))
    }).toDF("measurement_name", "device_name", "Bias voltage (V)", "Bias current (A)", "When")
    val devices = Seq(("devX", "ACME", "W3")).toDF("device_name", "Manufacturer", "Wafer")
    val got = IvCurves.collect(iv, devices)
    val n = got.count()
    assert(n > 0 && n <= 20, s"rows=$n")
    val cols = got.columns.toSet
    assert(cols.contains("Bias current (A) mean") && cols.contains("Bias current (A) std"))
    assert(got.filter(col("`Bias current (A) mean`") <= 0).count() == 0)
  }
}
