package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured Streaming ingest of the `events` table (SURVEY §2.9: the
  * reference is batch-only; this is the driver-mandated streaming
  * extension, §7.2 #8). Watermarked tumbling-window aggregation — the
  * canonical readStream → transform → writeStream shape; state is bounded
  * by the watermark, so it runs forever at any input rate.
  */
object EventsStream {

  /** The events parquet stores `ts` as nanosecond INT64, which the
    * streaming parquet reader refuses to coerce to TimestampType (batch
    * reads do) — so ingest it as long and convert with exact integer
    * division (double division would lose precision above 2⁵³ ns).
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Windowed per-type counts/sums over a parquet directory source. */
  def windowedAgg(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema(eventsSchema)
      .parquet(path)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Synchronous local drive: run the stream over whatever is in `path`,
    * park results in an in-memory table, return after all available data
    * is processed (the SURVEY §5 smoke path).
    */
  def runOnce(spark: SparkSession, path: String, sinkTable: String): StreamingQuery = {
    val q = windowedAgg(spark, path)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(sinkTable)
      .start()
    q.processAllAvailable()
    q
  }
}
