package graft.queries

import org.apache.spark.sql.functions._

import graft.analyses.{InterPixelDistance, IvCurves}
import graft.functions.DetAgg.{Sql => D}
import graft.sources.Tables

/** Composed end-to-end registry queries for the reference's second and
  * third most-used pipelines — §3.2 IV federation
  * (`scripts/compare_measurements.py:7-60`) and §3.3 inter-pixel-distance
  * (`scripts/calculate_inter_pixel_distance_vs_bias_voltage_...py:80-207`)
  * — driven from synthetic shapes derived from the TPC-H-ish tables so
  * the WHOLE chain (trim → abs → agg → dim join; profile → crossing
  * interpolation → pad pairing) is DuckDB-oracle-checked.
  *
  * Both constructions use exact dyadic/integer arithmetic so every
  * intermediate double is bit-identical between engines: IV currents are
  * multiples of 0.125 (squares exact in 6 decimals → DetAgg decimals are
  * lossless), IPD profiles are clamped LINEAR ramps on an integer grid
  * (crossing interpolation is the same IEEE op sequence in both
  * engines — no rounding needed anywhere).
  */
object FederationQueries {

  /** §3.2: IV-curve federation over 24 synthetic measurements derived
    * from `orders` (voltage = orderkey grid, current = dyadic rationals,
    * ramp order = order date), device dimension from `region`.
    */
  private val ivOracle: String = s"""WITH iv AS (
            |  SELECT 'm' || CAST(o_custkey % 24 AS VARCHAR) AS measurement_name,
            |    'dev' || CAST(o_custkey % 4 AS VARCHAR) AS device_name,
            |    CAST(o_orderkey % 41 AS DOUBLE) * 5.0 - 100.0 AS v,
            |    CAST(o_orderkey % 997 AS DOUBLE) * 0.125
            |      * (CASE WHEN o_custkey % 2 = 0 THEN -1.0 ELSE 1.0 END) AS i,
            |    o_orderdate AS w
            |  FROM orders),
            |h AS (
            |  SELECT *,
            |    ROW_NUMBER() OVER (PARTITION BY measurement_name ORDER BY w, v, i) AS rn,
            |    COUNT(*) OVER (PARTITION BY measurement_name) AS cnt
            |  FROM iv),
            |f AS (
            |  SELECT measurement_name, device_name, ABS(v) AS av, ABS(i) AS ai
            |  FROM h WHERE rn <= FLOOR(cnt / 2)),
            |a AS (
            |  SELECT measurement_name, device_name, av AS "Bias voltage (V)",
            |    ${D.davg("ai")} AS "Bias current (A) mean",
            |    CASE WHEN COUNT(ai) > 1 THEN ROUND(${D.dstd("ai")}, 6)
            |         ELSE 0.0 END AS "Bias current (A) std"
            |  FROM f GROUP BY 1, 2, 3)
            |SELECT a.*, d."Manufacturer"
            |FROM a LEFT JOIN (
            |  SELECT 'dev' || CAST(r_regionkey AS VARCHAR) AS device_name,
            |    r_name AS "Manufacturer"
            |  FROM region) d USING (device_name)""".stripMargin

  /** The synthetic 24-measurement IV relation — shared by the direct
    * registry row and the catalog-layout one.
    */
  private def ivBase(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "orders").select(
        concat(lit("m"), (col("o_custkey") % 24).cast("string")).as("measurement_name"),
        concat(lit("dev"), (col("o_custkey") % 4).cast("string")).as("device_name"),
        ((col("o_orderkey") % 41).cast("double") * lit(5.0) - lit(100.0))
          .as("Bias voltage (V)"),
        ((col("o_orderkey") % 997).cast("double") * lit(0.125)
          * when(col("o_custkey") % 2 === 0, lit(-1.0)).otherwise(lit(1.0)))
          .as("Bias current (A)"),
        col("o_orderdate").as("When"))

  private def ivDevices(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "region").select(
      concat(lit("dev"), col("r_regionkey").cast("string")).as("device_name"),
      col("r_name").as("Manufacturer"))

  val ivFederation: Q = Q(
    "pipeline_iv_federation",
    Some(ivOracle),
    (s, dir) => IvCurves.collect(ivBase(s, dir), ivDevices(s, dir), deterministic = true))

  /** FILESYSTEM-AS-CATALOG end to end, the federation side (r13 verdict
    * item 6): the 24 sub-measurements become REAL DIRECTORIES —
    * `measurement_dir=<ts>_MS<j>_IV_curve_m<k>/` (SURVEY §1.1) — and the
    * catalog keys are re-derived at scan time FROM THE DIRECTORY NAME:
    * the device via [[graft.catalog.MeasurementCatalog.devicesCol]] (the
    * `MS*` token rule, `scripts/measurements.py:259-267`) and the
    * measurement id from the trailing token. Identical oracle as
    * `pipeline_iv_federation`: hash-equality proves the layout write →
    * directory walk → name parse round trip is lossless through the
    * federation chain.
    */
  val catalogIvFederation: Q = Q(
    "catalog_iv_federation",
    Some(ivOracle),
    (s, dir) => {
      import graft.catalog.MeasurementCatalog
      val named = ivBase(s, dir)
        .withColumn(
          "measurement_dir",
          concat(lit("20220101000000_"),
            regexp_replace(col("device_name"), "^dev", "MS"),
            lit("_IV_curve_"), col("measurement_name")))
        .select(
          col("measurement_dir"),
          col("Bias voltage (V)").as("v"),
          col("Bias current (A)").as("i"),
          col("When").as("w"))
      val layout = graft.pipeline.PipelineStage.scratchPartitioned(
        named, "catalog-iv", "measurement_dir")
      val iv = layout.select(
        element_at(split(col("measurement_dir"), "_"), -1).as("measurement_name"),
        concat(lit("dev"), substring(
          element_at(MeasurementCatalog.devicesCol(col("measurement_dir")), 1),
          3, 16)).as("device_name"),
        col("v").as("Bias voltage (V)"),
        col("i").as("Bias current (A)"),
        col("w").as("When"))
      IvCurves.collect(iv, ivDevices(s, dir), deterministic = true)
    })

  private val IpdThresholds = InterPixelDistance.DefaultThresholds // 8..92

  /** §3.3: inter-pixel distance over 8 synthetic measurements derived
    * from `part`: per (measurement, pad) an 81-point clamped linear
    * charge ramp; the oracle mirrors the crossing aggregator with a
    * lag-window bracket + identical interpolation arithmetic.
    */
  val ipdChain: Q = Q(
    "pipeline_ipd",
    Some {
      val tList = IpdThresholds.map(t => (t / 100.0).toString).mkString(", ")
      val ipdCols = IpdThresholds.map { t =>
        val tv = t / 100.0
        s"""  ABS(MAX(CASE WHEN pad = 'right' AND t = $tv THEN xc END)
           |    - MAX(CASE WHEN pad = 'left' AND t = $tv THEN xc END)) AS "IPD (m) at $t%"""".stripMargin
      }.mkString(",\n")
      s"""WITH prof AS (
         |  SELECT 'm' || CAST(p_partkey // 162 AS VARCHAR) AS measurement_name,
         |    CASE WHEN (p_partkey // 81) % 2 = 0 THEN 'left' ELSE 'right' END AS pad,
         |    CAST(p_partkey % 81 AS DOUBLE) * 5.0 - 200.0 AS x,
         |    45.0 + CAST(p_partkey // 162 AS DOUBLE) * 5.0 AS g
         |  FROM part WHERE p_partkey < 1296),
         |pts AS (
         |  SELECT measurement_name, pad, x,
         |    CASE WHEN pad = 'right'
         |      THEN LEAST(1.0, GREATEST(0.0, (x - (g - 15.0)) / 30.0))
         |      ELSE LEAST(1.0, GREATEST(0.0, ((15.0 - g) - x) / 30.0)) END AS y
         |  FROM prof),
         |seg AS (
         |  SELECT measurement_name, pad, x AS x1, y AS y1,
         |    LAG(x) OVER w AS x0, LAG(y) OVER w AS y0
         |  FROM pts WINDOW w AS (PARTITION BY measurement_name, pad ORDER BY x)),
         |crossings AS (
         |  SELECT measurement_name, pad, tt.t,
         |    MIN(x0 + ((tt.t - y0) / (y1 - y0)) * (x1 - x0)) AS xc
         |  FROM seg, (SELECT UNNEST([$tList]) AS t) tt
         |  WHERE x0 IS NOT NULL
         |    AND ((y0 < tt.t AND y1 >= tt.t) OR (y0 > tt.t AND y1 <= tt.t))
         |  GROUP BY 1, 2, 3)
         |SELECT measurement_name,
         |$ipdCols
         |FROM crossings GROUP BY measurement_name""".stripMargin
    },
    (s, dir) => {
      val m = floor(col("p_partkey") / 162).cast("long")
      val g = lit(45.0) + m.cast("double") * lit(5.0)
      val x = (col("p_partkey") % 81).cast("double") * lit(5.0) - lit(200.0)
      val pad = when(floor(col("p_partkey") / 81).cast("long") % 2 === 0, "left")
        .otherwise("right")
      val profile = Tables.load(s, dir, "part")
        .filter(col("p_partkey") < 1296)
        .select(
          concat(lit("m"), m.cast("string")).as("measurement_name"),
          pad.as("Pad"),
          x.as("Distance (m)"),
          when(pad === "right",
            least(lit(1.0), greatest(lit(0.0), (x - (g - lit(15.0))) / lit(30.0))))
            .otherwise(
              least(lit(1.0), greatest(lit(0.0), ((lit(15.0) - g) - x) / lit(30.0))))
            .as("Normalized collected charge"))
      InterPixelDistance.ipd(profile, IpdThresholds)
    })

  /** The power-supply conditions series (`scripts/plot_power_supply.py:
    * 22-37` — the last reference script without a mapped table, r12
    * verdict missing item 3): per measurement, the When-series of bias
    * voltage and bias current, resampled onto a regular weekly grid
    * with linear gap-fill ([[graft.operators.Resample]]) — the table
    * the reference's two-row subplot draws, in long (measurement,
    * variable, bucket, value) form so one relation carries both panel
    * rows. Synthetic series from `orders` (the ivFederation shape):
    * dyadic-valued conditions (exact at scale 6, so the DetAgg bucket
    * means and the interpolation formula are bit-portable), dates as
    * the `When` axis. Scale shape: one hash aggregate over the fact
    * rows, then per-(measurement, variable) windows bounded by each
    * series' own span — no corpus-scale sort.
    */
  val powerSupply: Q = Q(
    "pipeline_power_supply",
    Some(s"""WITH src AS (
            |  SELECT 'm' || CAST(o_custkey % 8 AS VARCHAR) AS mname,
            |    o_orderdate AS w,
            |    CAST(o_orderkey % 41 AS DOUBLE) * 1.25e-1 AS bv,
            |    CAST(o_orderkey % 83 AS DOUBLE) * 1.5625e-2 AS bc
            |  FROM orders),
            |lng AS (
            |  SELECT mname || '|' || 'Bias voltage (V)' AS key, w, bv AS value FROM src
            |  UNION ALL
            |  SELECT mname || '|' || 'Bias current (A)' AS key, w, bc AS value FROM src),
            |obs AS (
            |  SELECT key, CAST(FLOOR(epoch(w) / 604800) AS BIGINT) AS bucket,
            |    ${D.davg("value")} AS v
            |  FROM lng GROUP BY 1, 2),
            |g AS (
            |  SELECT key, unnest(generate_series(MIN(bucket), MAX(bucket))) AS bucket
            |  FROM obs GROUP BY key),
            |f AS (
            |  SELECT g.key, g.bucket, obs.v
            |  FROM g LEFT JOIN obs ON g.key = obs.key AND g.bucket = obs.bucket),
            |wn AS (
            |  SELECT key, bucket, v,
            |    last_value(v IGNORE NULLS) OVER wp AS pv,
            |    last_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER wp AS pb,
            |    first_value(v IGNORE NULLS) OVER wf AS nv,
            |    first_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER wf AS nb
            |  FROM f
            |  WINDOW
            |    wp AS (PARTITION BY key ORDER BY bucket ROWS UNBOUNDED PRECEDING),
            |    wf AS (PARTITION BY key ORDER BY bucket
            |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
            |SELECT string_split(key, '|')[1] AS "Measurement name",
            |  string_split(key, '|')[2] AS "variable", bucket,
            |  COALESCE(v, pv + (nv - pv) * (bucket - pb) / (nb - pb)) AS value,
            |  v IS NOT NULL AS observed
            |FROM wn""".stripMargin),
    (s, dir) => {
      val src = Tables.load(s, dir, "orders").select(
        concat(lit("m"), (col("o_custkey") % 8).cast("string"))
          .as("Measurement name"),
        col("o_orderdate").as("When"),
        ((col("o_orderkey") % 41).cast("double") * lit(1.25e-1))
          .as("Bias voltage (V)"),
        ((col("o_orderkey") % 83).cast("double") * lit(1.5625e-2))
          .as("Bias current (A)"))
      val long = src
        .unpivot(
          Array(col("`Measurement name`"), col("When")),
          Array(col("`Bias voltage (V)`"), col("`Bias current (A)`")),
          "variable", "value")
        .withColumn(
          "key", concat(col("`Measurement name`"), lit("|"), col("variable")))
      graft.operators.Resample
        .linearInterpolate(long, "key", col("When"), col("value"),
          bucketSeconds = 604800L)
        .select(
          split(col("key"), "\\|").getItem(0).as("Measurement name"),
          split(col("key"), "\\|").getItem(1).as("variable"),
          col("bucket"), col("value"), col("observed"))
    })

  def all: Seq[Q] = Seq(ivFederation, ipdChain, powerSupply, catalogIvFederation)
}
