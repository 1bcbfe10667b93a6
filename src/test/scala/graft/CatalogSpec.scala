package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.MeasurementCatalog

class CatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("measurement_type matches the reference docstring golden (measurements.py:14-35)") {
    val cases = Seq(
      ("20220328170454_MS03_IV_Curve", Set.empty[String], "IV curve"),
      ("20220404021350_MS07_1DScan_228V", Set("scan_1D"), "TCT 1D scan fixed voltage"),
      ("20220317155531_BetaScan_SpeedyGonzalez12_at_98V", Set.empty[String], "beta fixed voltage"),
      ("20220405203845_MS08_3_probe_station", Set.empty[String], "IV curve probe station"),
      ("20220403214116_MS07_sweeping_bias_voltage", Set("scan_1D_sweeping_bias_voltage"),
        "TCT 1D scan sweeping bias voltage"))
    cases.foreach { case (name, subdirs, want) =>
      assert(MeasurementCatalog.measurementType(name, subdirs) == want, name)
    }
  }

  test("timestamp prefix, device tokens, voltage token parse") {
    val name = "20220404021350_MS07_1DScan_228V"
    val when = MeasurementCatalog.measurementWhen(name).get
    assert(when.getYear == 2022 && when.getMonthValue == 4 && when.getDayOfMonth == 4)
    assert(when.getHour == 2 && when.getMinute == 13 && when.getSecond == 50)
    assert(MeasurementCatalog.measuredDevices(name) == Seq("MS07"))
    assert(MeasurementCatalog.measuredDevices("x_MS03_MS04_y") == Seq("MS03", "MS04"))
    assert(MeasurementCatalog.voltageToken(name).contains(228))
    assert(MeasurementCatalog.voltageToken("foo_bar").isEmpty)
  }

  test("catalogTable derives the same keys as the Scala parsers, distributed") {
    val names = Seq(
      "20220404021350_MS07_1DScan_228V",
      "20220328170454_MS03_IV_Curve")
    val r1 = MeasurementCatalog.catalogTable(spark, names).collect()
      .map(r => r.getString(0) -> ((r.getSeq[String](2), Option(r.get(3))))).toMap
    assert(r1("20220404021350_MS07_1DScan_228V")._1 == Seq("MS07"))
    assert(r1("20220404021350_MS07_1DScan_228V")._2.contains(228))
    assert(r1("20220328170454_MS03_IV_Curve")._1 == Seq("MS03"))
    assert(r1("20220328170454_MS03_IV_Curve")._2.isEmpty)
  }
}
