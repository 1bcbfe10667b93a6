package graft.analyses

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.DetAgg
import graft.operators.Windows

/** Cross-measurement IV-curve federation (reference
  * `scripts/compare_measurements.py::collect_IV_curves`, SURVEY §3.2):
  * partitioned scan over measurements → ramp-up-half trim → absolute
  * voltage/current → mean/std per voltage point → broadcast device-info
  * join. Entirely built-in operators; scales as one shuffle on the
  * grouping key.
  *
  * The device join runs AFTER aggregation: device attributes are labels
  * on the collected curves (reference joins them for plotting), so
  * joining the tiny aggregated frame beats carrying the attributes
  * through the shuffle.
  */
object IvCurves {

  /** @param iv      (measurement_name, device_name, `Bias voltage (V)`,
    *                `Bias current (A)`, When) — the union of per-measurement
    *                curves (pandas concat → unionByName, SURVEY U1)
    * @param devices small dimension table keyed by device_name
    * @param deterministic route the float aggregates through [[DetAgg]]
    *                (order-independent decimal sums) — the oracle-checkable
    *                tier. Default keeps plain float aggs: DetAgg's
    *                fixed-scale decimals would round nano-ampere currents
    *                to zero on real IV data.
    */
  def collect(
      iv: DataFrame,
      devices: DataFrame,
      deterministic: Boolean = false): DataFrame = {
    // keep the voltage-ramp-up half of each measurement  [W1]
    val half = Windows.firstHalf(
      iv, Seq("measurement_name"),
      Seq(col("When"), col("`Bias voltage (V)`"), col("`Bias current (A)`")))
    // |V|, |I| (reference scripts/measurements.py:82-84)  [P6]
    val absed = half
      .withColumn("Bias voltage (V)", abs(col("`Bias voltage (V)`")))
      .withColumn("Bias current (A)", abs(col("`Bias current (A)`")))
    // mean/std per (measurement, device, voltage)  [A3]
    val i = col("`Bias current (A)`")
    val (meanAgg, stdAgg) =
      if (deterministic)
        (DetAgg.davg(i),
          // std rounded (sum-of-squares ulps) and 0 for singleton groups —
          // Spark NaN vs DuckDB division-by-zero semantics differ
          when(count(i) > 1, round(DetAgg.dstd(i), 6)).otherwise(lit(0.0)))
      else
        (avg(i), stddev_samp(i))
    val curves = absed
      .groupBy("measurement_name", "device_name", "Bias voltage (V)")
      .agg(
        meanAgg.as("Bias current (A) mean"),
        stdAgg.as("Bias current (A) std"))
    // broadcast dimension join on the aggregated frame  [J2]
    curves.join(broadcast(devices), Seq("device_name"), "left")
  }
}
