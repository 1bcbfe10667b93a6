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

  /** Reader schema for the raw-INT64 generation of the events parquet
    * (ts = nanoseconds since epoch, a physical type Spark's schema
    * inference rejects — so it must be forced to long and converted with
    * exact integer division; double division would lose precision above
    * 2⁵³ ns). Later generations annotate `ts` as a proper µs TIMESTAMP,
    * handled by [[eventsSchemaTs]] — use [[readBatch]]/[[readStreamed]]
    * to get the right one for whatever is on disk.
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Reader schema for the annotated-TIMESTAMP generation: forcing
    * TimestampType makes the parquet reader deliver the stored micros
    * verbatim (no session-timezone conversion anywhere on the path), so
    * epochs agree bit-exactly with any other engine reading the file.
    */
  val eventsSchemaTs: StructType = StructType(
    eventsSchema.fields.map {
      case StructField("ts", _, n, m) => StructField("ts", TimestampType, n, m)
      case f => f
    })

  /** True when `path`'s events parquet carries `ts` as an annotated
    * TIMESTAMP column (current test-data generation); false for the raw
    * ns-INT64 generation — either a plain INT64 footer (inferred as
    * LongType) or a TIMESTAMP(NANOS)-annotated one, which Spark's schema
    * inference rejects with the `PARQUET_TYPE_*` analysis conditions.
    * ONLY that rejection selects the legacy branch; anything else — a
    * missing path (`PATH_NOT_FOUND` is also an AnalysisException, hence
    * the condition match, not a type match), a corrupt footer, a
    * transient IO failure — propagates to the caller instead of being
    * memoized as "legacy" for the JVM lifetime, which would silently
    * misread annotated-µs data 1000× off: exactly the round-7 failure
    * mode this probe was built to prevent. (`computeIfAbsent` does not
    * cache when the mapping function throws, so a one-off hiccup never
    * poisons the cache.) One footer read, no data scan, memoized per
    * path for the JVM's lifetime (a dataset's physical schema cannot
    * change under a running job).
    */
  def tsIsTimestamp(spark: SparkSession, path: String): Boolean =
    unitCache.computeIfAbsent(
      path,
      _ => try spark.read.parquet(path).schema("ts").dataType != LongType
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if Option(e.getCondition).exists(_.startsWith("PARQUET_TYPE")) =>
          java.lang.Boolean.FALSE
      })

  private val unitCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]

  /** Batch scan of an events parquet with `ts` normalized to
    * TimestampType (µs), whichever generation is on disk.
    */
  def readBatch(spark: SparkSession, path: String): DataFrame =
    if (tsIsTimestamp(spark, path))
      spark.read.schema(eventsSchemaTs).parquet(path)
    else
      spark.read.schema(eventsSchema).parquet(path)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Streaming scan of an events parquet directory, `ts` normalized to
    * TimestampType (µs). The unit is probed batch-side from whatever is
    * already at `path` before the stream starts (streaming sources
    * require an explicit schema, so the probe cannot ride the stream
    * itself); files arriving later must keep the same physical schema,
    * which is the standing contract of a parquet directory source anyway.
    */
  def readStreamed(spark: SparkSession, path: String): DataFrame =
    if (tsIsTimestamp(spark, path))
      spark.readStream.schema(eventsSchemaTs).parquet(path)
    else
      spark.readStream.schema(eventsSchema).parquet(path)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Windowed per-type counts/sums over a parquet directory source. */
  def windowedAgg(spark: SparkSession, path: String): DataFrame =
    readStreamed(spark, path)
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
