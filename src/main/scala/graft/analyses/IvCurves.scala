package graft.analyses

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Windows

/** Cross-measurement IV-curve federation (reference
  * `scripts/compare_measurements.py::collect_IV_curves`, SURVEY §3.2):
  * partitioned scan over measurements → ramp-up-half trim → absolute
  * voltage/current → broadcast device-info join → mean/std per voltage
  * point. Entirely built-in operators; scales as one shuffle on the
  * grouping key.
  */
object IvCurves {

  /** @param iv      (measurement_name, device_name, `Bias voltage (V)`,
    *                `Bias current (A)`, When) — the union of per-measurement
    *                curves (pandas concat → unionByName, SURVEY U1)
    * @param devices small dimension table keyed by device_name
    */
  def collect(iv: DataFrame, devices: DataFrame): DataFrame = {
    // keep the voltage-ramp-up half of each measurement  [W1]
    val half = Windows.firstHalf(
      iv, Seq("measurement_name"),
      Seq(col("When"), col("`Bias voltage (V)`"), col("`Bias current (A)`")))
    // |V|, |I| (reference scripts/measurements.py:82-84)  [P6]
    val absed = half
      .withColumn("Bias voltage (V)", abs(col("`Bias voltage (V)`")))
      .withColumn("Bias current (A)", abs(col("`Bias current (A)`")))
    // broadcast dimension join  [J2]
    val enriched = absed.join(broadcast(devices), Seq("device_name"), "left")
    // mean/std per (measurement, device, voltage)  [A3]. Plain float aggs:
    // DetAgg's fixed-scale decimals are for money-magnitude oracle columns
    // and would round nano-ampere currents to zero.
    enriched
      .groupBy("measurement_name", "device_name", "Bias voltage (V)")
      .agg(
        avg(col("`Bias current (A)`")).as("Bias current (A) mean"),
        stddev_samp(col("`Bias current (A)`")).as("Bias current (A) std"))
  }
}
