package graft.catalog

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import scala.util.Try

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's filesystem-as-catalog convention (SURVEY §1.1): each
  * measurement directory NAME encodes the primary key —
  * `yyyyMMddHHmmss_<tokens>` with device tokens starting `MS` and the
  * type inferable from name substrings (+ subdirectory presence).
  *
  * Two forms of every parser: a pure Scala function (driver-side catalog
  * construction, golden-tested against the reference docstring at
  * `scripts/measurements.py:14-35`) and a Column expression (derive the
  * same keys at SCAN time from `input_file_name()`/partition values, so
  * catalog attributes ride the distributed plan).
  */
object MeasurementCatalog {

  private val tsFmt = DateTimeFormatter.ofPattern("yyyyMMddHHmmss")

  /** Timestamp prefix of a measurement name
    * (`scripts/measurements.py:117`).
    */
  def measurementWhen(name: String): Option[LocalDateTime] =
    Try(LocalDateTime.parse(name.take(14), tsFmt)).toOption

  /** Device tokens: `_`-separated tokens starting with `MS`
    * (`scripts/measurements.py:259-267`).
    */
  def measuredDevices(name: String): Seq[String] =
    name.split('_').filter(_.startsWith("MS")).toSeq

  /** Measurement-type inference (`scripts/measurements.py:37-53`):
    * name-substring rules; `subdirs` stands in for the reference's
    * directory listing.
    */
  def measurementType(name: String, subdirs: Set[String] = Set.empty): String = {
    val lower = name.toLowerCase
    var t = "unknown"
    if (lower.contains("beta")) {
      t = "beta"
      if (!lower.contains("sweeping")) t += " fixed voltage"
      else if (lower.contains("sweeping_bias_voltage")) t += " voltage scan"
    } else if ((lower.contains("iv") && lower.contains("curve")) || name.contains("IV")) {
      t = "IV curve"
    }
    if (lower.contains("probe") && lower.contains("station")) t = "IV curve probe station"
    else if (name.contains("1DScan") && subdirs.contains("scan_1D"))
      t = "TCT 1D scan fixed voltage"
    else if (lower.contains("sweeping_bias_voltage") &&
      subdirs.contains("scan_1D_sweeping_bias_voltage"))
      t = "TCT 1D scan sweeping bias voltage"
    t
  }

  /** Trailing voltage token: `..._228V` → 228 (`scripts/utils.py:51-52`,
    * `scripts/collected_charge_vs_bias_voltage_beta_scan.py:56`).
    */
  def voltageToken(name: String): Option[Int] =
    "(\\d+)V$".r.findFirstMatchIn(name.split('_').last).map(_.group(1).toInt)

  // ---- Column forms (scan-time derivation, SURVEY §1.4) ----

  /** `to_timestamp(substring(name, 1, 14), 'yyyyMMddHHmmss')`. */
  def whenCol(name: Column): Column =
    to_timestamp(substring(name, 1, 14), "yyyyMMddHHmmss")

  /** Array of MS-prefixed device tokens. */
  def devicesCol(name: Column): Column =
    filter(split(name, "_"), t => t.startsWith("MS"))

  /** Trailing `<digits>V` voltage as int (null when absent — NULLIF
    * guards the ANSI cast against regexp_extract's empty-string miss).
    */
  def voltageCol(name: Column): Column =
    nullif(regexp_extract(element_at(split(name, "_"), -1), "(\\d+)V$", 1), lit(""))
      .cast("int")

  /** Catalog table from a list of measurement names — the reference's
    * `create_table_of_measurements` (`scripts/measurements.py:269-301`).
    */
  def catalogTable(spark: org.apache.spark.sql.SparkSession, names: Seq[String]): DataFrame = {
    import spark.implicits._
    val df = names.toDF("Measurement name")
    df.select(
      col("Measurement name"),
      whenCol(col("Measurement name")).as("Measurement when"),
      devicesCol(col("Measurement name")).as("Measured device(s)"),
      voltageCol(col("Measurement name")).as("Bias voltage (V) from name"))
  }
}
