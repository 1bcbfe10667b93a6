package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analyses.Calibration

class CalibrationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("normalizedCharge: metal region → 0, silicon plateau → 1 (utils.py:79-116)") {
    import spark.implicits._
    val window = 300e-6
    // symmetric scan: metal charge ~ 2.0 (offset), silicon plateau ~ 12.0
    val xs = (-60 to 60).map(_ * 5e-6)
    val rows = for (x <- xs; pad <- Seq("left", "right"); pulse <- Seq(1, 2)) yield {
      val inWindow = math.abs(x) < window / 2
      val charge = if (!inWindow) 2.0 else if (math.abs(x) > 50e-6) 12.0 else 7.0
      (pad, pulse, x, charge)
    }
    val df = rows.toDF("Pad", "n_pulse", "Distance (m)", "Collected charge (V s)")
    val got = Calibration.normalizedCharge(df, window)
    val metal = got.filter(abs(col("`Distance (m)`")) > lit(window / 2 + 20e-6))
      .agg(avg("`Normalized collected charge`")).collect().head.getDouble(0)
    val silicon = got.filter(
      abs(col("`Distance (m)`")) < lit(window / 2 - 20e-6) &&
        abs(col("`Distance (m)`")) > lit(70e-6))
      .agg(avg("`Normalized collected charge`")).collect().head.getDouble(0)
    assert(math.abs(metal) < 1e-9, s"metal=$metal")
    assert(math.abs(silicon - 1.0) < 1e-9, s"silicon=$silicon")
  }

  test("pinChargeTheory matches the reference formula (P8)") {
    // e * (31*ln(50) + 128) * 50 / 3.65 for 50 um
    val want = 1.602176634e-19 * (31 * math.log(50.0) + 128) * 50.0 / 3.65
    assert(math.abs(Calibration.pinChargeTheory(50e-6) - want) / want < 1e-12)
  }

  test("coulombConversionFactor: theory / measured mean (N9)") {
    import spark.implicits._
    val pins = Seq(
      ("PIN1", 120.0, 2.0e-12), ("PIN1", 150.0, 2.2e-12),
      ("PIN2", 130.0, 1.8e-12), ("PIN2", 90.0, 99.0) // below minVoltage — excluded
    ).toDF("Device name", "Bias voltage (V)", "Collected charge (V s) x_mpv value_on_data")
    val f = Calibration.coulombConversionFactor(pins).collect().head
    val measuredMean = ((2.0e-12 + 2.2e-12) / 2 + 1.8e-12) / 2
    val want = Calibration.pinChargeTheory(50e-6) / measuredMean
    assert(math.abs(f.getAs[Double]("mean (C/V/s)") - want) / want < 1e-12)
  }

  test("applyCoulombConversion converts (V s) columns by name pattern (N9/P7)") {
    import spark.implicits._
    val df = Seq((1.0e-12, 0.1e-12, 5.0))
      .toDF("Collected charge (V s)", "Collected charge std (V s)", "other")
    val got = Calibration.applyCoulombConversion(df, factorMean = 2.0, factorStd = 0.5)
    val cols = got.columns.toSet
    assert(cols.contains("Collected charge (C)") && cols.contains("Collected charge std (C)"))
    val row = got.collect().head
    assert(row.getAs[Double]("Collected charge (C)") == 2.0e-12)
    val std = row.getAs[Double]("Collected charge std (C)")
    assert(math.abs(std - math.sqrt(math.pow(0.2e-12, 2) + 0.25)) < 1e-9)
  }
}
