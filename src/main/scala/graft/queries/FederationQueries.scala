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
  val ivFederation: Q = Q(
    "pipeline_iv_federation",
    Some(s"""WITH iv AS (
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
            |  FROM region) d USING (device_name)""".stripMargin),
    (s, dir) => {
      val iv = Tables.load(s, dir, "orders").select(
        concat(lit("m"), (col("o_custkey") % 24).cast("string")).as("measurement_name"),
        concat(lit("dev"), (col("o_custkey") % 4).cast("string")).as("device_name"),
        ((col("o_orderkey") % 41).cast("double") * lit(5.0) - lit(100.0))
          .as("Bias voltage (V)"),
        ((col("o_orderkey") % 997).cast("double") * lit(0.125)
          * when(col("o_custkey") % 2 === 0, lit(-1.0)).otherwise(lit(1.0)))
          .as("Bias current (A)"),
        col("o_orderdate").as("When"))
      val devices = Tables.load(s, dir, "region").select(
        concat(lit("dev"), col("r_regionkey").cast("string")).as("device_name"),
        col("r_name").as("Manufacturer"))
      IvCurves.collect(iv, devices, deterministic = true)
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

  def all: Seq[Q] = Seq(ivFederation, ipdChain)
}
