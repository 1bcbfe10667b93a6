package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Train-offline / flag-online METRIC anomaly serving — the streaming
  * face of [[graft.operators.Anomaly]]: per-category median/MAD
  * baselines of bucket counts are computed once in batch (yesterday's
  * traffic), embedded as plan literals, and every event-time window of
  * the stream is flagged when its count deviates from its category
  * baseline by more than `k · 1.4826 · MAD` — the robust gate that the
  * anomalies themselves can't shift, now as a monitor.
  *
  * Streaming shape: ONE watermarked windowed aggregate grouped by
  * (window, category) — state is open windows × live categories,
  * released by the watermark; the baseline lookup is a literal CASE
  * chain (categories are known at plan time), so no stream-static join
  * and no second stateful operator. Flags are exact-integer arithmetic
  * against literal longs — bit-stable across retries, partitionings,
  * and the batch replay (AnomalyStreamSpec pins streamed ≡ batch).
  */
object AnomalyStream {

  /** The batch trainer: per-category (median, MAD) of bucket counts via
    * [[graft.operators.Anomaly.robustFlags]]'s own median machinery.
    * The collect is ≤ #categories rows.
    */
  def baselines(
      df: DataFrame,
      category: String,
      ts: String,
      bucketSeconds: Long): Map[String, (Long, Long)] = {
    val counts = df.groupBy(
      col(category),
      floor(unix_timestamp(col(ts)) / bucketSeconds).cast("long").as("__b"))
      .agg(count(lit(1)).as("__n"))
    graft.operators.Anomaly.robustFlags(counts, Seq(category), "__n")
      .select(col(category), col("med"), col("mad"))
      .distinct()
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
  }

  /** Per event-time window and category: `(window_start, category, n,
    * med, mad, is_anomaly)`. Categories the baseline has never seen get
    * null med/mad and a TRUE flag — an unknown traffic class appearing
    * at volume IS an anomaly.
    */
  def monitor(
      base: Map[String, (Long, Long)],
      events: DataFrame, // streaming: category, ts (timestamp)
      category: String = "event_type",
      ts: String = "ts",
      watermark: String = "10 minutes",
      windowLen: String = "1 hour",
      k: Double = 3.0): DataFrame = {
    require(base.nonEmpty, "empty baseline map")
    val cats = base.keys.toSeq.sorted
    val med = cats.foldLeft(lit(null).cast("long")) { (acc, c) =>
      when(col(category) === c, lit(base(c)._1)).otherwise(acc)
    }
    val mad = cats.foldLeft(lit(null).cast("long")) { (acc, c) =>
      when(col(category) === c, lit(base(c)._2)).otherwise(acc)
    }
    events
      .withWatermark(ts, watermark)
      .groupBy(window(col(ts), windowLen), col(category))
      .agg(count(lit(1)).as("n"))
      .withColumn("med", med)
      .withColumn("mad", mad)
      .withColumn(
        "is_anomaly",
        when(col("med").isNull, lit(true))
          .otherwise(abs(col("n") - col("med")) > lit(k) * lit(1.4826) * col("mad")))
      .select(
        col("window.start").as("window_start"), col(category),
        col("n"), col("med"), col("mad"), col("is_anomaly"))
  }

  /** Synchronous local drive into a memory sink (spec/smoke path). */
  def runOnce(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType,
      base: Map[String, (Long, Long)],
      sinkTable: String): Unit = {
    val events = spark.readStream.schema(schema).parquet(path)
    val q = monitor(base, events)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(sinkTable)
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
