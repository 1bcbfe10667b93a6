package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventsStream

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming windowed agg over the events table matches the batch result") {
    val dir = Files.createTempDirectory("graft_stream")
    Files.copy(
      Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val q = EventsStream.runOnce(spark, dir.toString, "stream_out")
    try {
      val streamed = spark.table("stream_out")
      assert(streamed.count() > 0)
      // batch recomputation of the same windowed aggregate
      import org.apache.spark.sql.functions._
      val batch = spark.read.schema(EventsStream.eventsSchema)
        .parquet(dir.toString)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("window_start"), col("event_type"), col("n"))
      val s = streamed.select("window_start", "event_type", "n").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      val b = batch.collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      // append mode withholds windows newer than the final watermark, so
      // the streamed result is a (large) subset of the batch recomputation
      assert(s.nonEmpty && s.subsetOf(b), s"streamed=${s.size} batch=${b.size}")
    } finally q.stop()
  }
}
