package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TDigest

/** Streaming quantile monitoring: windowed t-digest sketches over the
  * event stream — the "latency/score percentiles per window" dashboard a
  * pipeline owner watches. The t-digest `Aggregator` is MERGEABLE, so it
  * composes with Structured Streaming's partial aggregation exactly like
  * any built-in agg: bounded per-window state (one ~100-centroid sketch
  * per group), watermark-bounded window count, append-mode emission when
  * the watermark passes. No custom state store code — the same sketch
  * object serves batch, streaming, and cross-file merge.
  */
object QuantileStream {

  /** Per (5-minute window, event_type): t-digest quantile estimates of
    * `value` plus exact count/min/max (the cheap exact envelope that
    * bounds the sketch).
    */
  def windowedQuantiles(
      spark: SparkSession,
      path: String,
      qs: Seq[Double]): DataFrame =
    windowedQuantilesOf(EventsStream.readStreamed(spark, path), qs)

  /** The windowed-sketch PLAN over any events relation — one function
    * serves the stream above and the batch-replay registry twin
    * (`stream_quantile_monitor`), so the two can never drift. The
    * watermark is a no-op on a batch input.
    */
  def windowedQuantilesOf(events: DataFrame, qs: Seq[Double]): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(
        TDigest.quantilesAgg(col("value"), qs).as("q"),
        count(lit(1)).as("n"),
        min(col("value")).as("vmin"),
        max(col("value")).as("vmax"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("q"), col("n"), col("vmin"), col("vmax"))

  /** Synchronous local drive into a memory sink (spec/smoke path). */
  def runOnce(
      spark: SparkSession,
      path: String,
      qs: Seq[Double],
      sinkTable: String): Unit = {
    val q = windowedQuantiles(spark, path, qs)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(sinkTable)
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
