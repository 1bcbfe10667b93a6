package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventsStream

/** Pins the unit-probing events reader against both physical generations
  * of the test data: raw INT64 `ts` (epoch nanoseconds, which Spark's
  * schema inference reads as plain LongType — the legacy branch) and an
  * annotated µs TIMESTAMP column (the current generator). The round-7
  * correctness regression (e1/e2/stream_quality_monitor collapsing
  * 1000×) was exactly this: a hard-coded ns→µs division applied to data
  * that had become µs. The probe-and-branch must keep both generations
  * normalizing to the same epoch.
  *
  * Note: Spark cannot WRITE a parquet footer annotated TIMESTAMP(NANOS)
  * — that generation is only producible by Arrow-side writers — but its
  * forced-LongType read path is byte-identical to the plain-INT64 one
  * exercised here (both deliver the stored integer), so the long fixture
  * covers the legacy branch faithfully.
  */
class EventsReadSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // one event at a known instant: 2024-03-01T00:00:05.123456 UTC
  private val micros = 1709251205123456L

  private def writeFixture(tsCol: org.apache.spark.sql.Column, dirTag: String): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory(s"graft_evread_$dirTag").toString
    val path = s"$dir/events.parquet"
    Seq((1L, 7L, "click", 2.5, """{"k":1}"""))
      .toDF("event_id", "user_id", "event_type", "value", "props")
      .withColumn("ts", tsCol)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(path)
    path
  }

  test("probe distinguishes long-ts from timestamp-ts footers") {
    val longPath = writeFixture(lit(micros * 1000L), "long")
    val tsPath = writeFixture(timestamp_micros(lit(micros)), "ts")
    assert(!EventsStream.tsIsTimestamp(spark, longPath))
    assert(EventsStream.tsIsTimestamp(spark, tsPath))
  }

  test("probe propagates a missing path instead of memoizing legacy") {
    // ADVICE r8: the old catch-all turned ANY failure (missing path,
    // corrupt footer, IO hiccup) into a permanently-cached "legacy
    // ns-INT64" verdict — the silent 1000×-misread class again. Only the
    // PARQUET_TYPE_* schema-inference rejection may select legacy.
    val ghost = s"/nonexistent/graft_evread_${System.nanoTime()}/events.parquet"
    intercept[org.apache.spark.sql.AnalysisException] {
      EventsStream.tsIsTimestamp(spark, ghost)
    }
    // and the failure is NOT cached: a second probe still throws (a
    // poisoned FALSE entry would return silently instead)
    intercept[org.apache.spark.sql.AnalysisException] {
      EventsStream.tsIsTimestamp(spark, ghost)
    }
  }

  test("readBatch normalizes both generations to the same µs epoch") {
    val longPath = writeFixture(lit(micros * 1000L), "long2")
    val tsPath = writeFixture(timestamp_micros(lit(micros)), "ts2")
    for (p <- Seq(longPath, tsPath)) {
      val row = EventsStream.readBatch(spark, p)
        .select(unix_micros(col("ts")).as("us"), col("event_id"), col("value"))
        .collect().head
      assert(row.getLong(0) == micros, s"path=$p")
      assert(row.getLong(1) == 1L && row.getDouble(2) == 2.5)
    }
  }

  test("readBatch matches the real test data's own annotated timestamps") {
    // the shipped sf0.001 events table, whatever its current generation:
    // bucketing must span the full corpus (not a 1000×-compressed one) —
    // a 30-day corpus at 5-minute buckets is thousands of buckets, while
    // the regression collapsed it to single digits
    val df = graft.sources.Tables.loadEvents(spark, "/root/testdata/sf0.001")
    val buckets = df
      .select(floor(unix_timestamp(col("ts")) / 300).as("b"))
      .agg(countDistinct(col("b"))).collect().head.getLong(0)
    assert(buckets > 100, s"only $buckets distinct 5-minute buckets — unit regression")
  }

  test("readStreamed handles the legacy long-ts generation end-to-end") {
    // events every 4 minutes across 2 hours, stored as epoch-ns longs —
    // the branch no other streaming spec exercises now that the shipped
    // test data is µs-typed
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evread_streamlong").toString
    val path = s"$dir/events.parquet"
    (0 until 30).map { i =>
      (i.toLong, (micros + i * 240L * 1000000L) * 1000L, 7L, "click", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(path)
    val q = EventsStream.runOnce(spark, path, "evread_stream_long_out")
    try {
      val streamed = spark.table("evread_stream_long_out")
        .select(unix_timestamp(col("window_start")).as("ws"), col("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(streamed.nonEmpty, "no closed windows emitted")
      val batch = EventsStream.readBatch(spark, path)
        .groupBy(window(col("ts"), "5 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(unix_timestamp(col("window.start")).as("ws"), col("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      // append mode withholds windows newer than the final watermark
      assert(streamed.toSet.subsetOf(batch.toSet), s"streamed=$streamed batch=$batch")
      // window starts must sit at the true (uncompressed) epoch
      assert(streamed.keys.forall(ws =>
        math.abs(ws - micros / 1000000L) < 3 * 3600), streamed.keys.toString)
    } finally q.stop()
  }
}
