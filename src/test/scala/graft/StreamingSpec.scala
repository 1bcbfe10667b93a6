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
      val batch = EventsStream.readBatch(spark, dir.toString)
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

  test("streaming t-digest window quantiles: estimates sit inside the exact envelope") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_stream_q")
    Files.copy(
      Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    graft.streaming.QuantileStream.runOnce(
      spark, dir.toString, qs = Seq(0.25, 0.5, 0.75), "stream_q_out")
    val rows = spark.table("stream_q_out").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val qs = r.getSeq[Double](2)
      val (n, vmin, vmax) = (r.getLong(3), r.getDouble(4), r.getDouble(5))
      assert(qs.length == 3)
      // quantile estimates must be monotone and inside [min, max]
      assert(qs.sliding(2).forall(p => p.head <= p.last), qs.toString)
      assert(qs.head >= vmin - 1e-9 && qs.last <= vmax + 1e-9,
        s"q=$qs outside [$vmin,$vmax] (n=$n)")
    }
    // per-window medians should agree with exact batch medians in rank:
    // the true rank of the streamed estimate must be within 5% of 0.5
    val batch = EventsStream.readBatch(spark, dir.toString)
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(collect_list(col("value")).as("vs"))
      .select(col("window.start").as("window_start"), col("event_type"), col("vs"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getSeq[Double](2).sorted)
      .toMap
    rows.foreach { r =>
      val key = (r.getTimestamp(0), r.getString(1))
      val med = r.getSeq[Double](2)(1)
      val vs = batch(key)
      val rank = vs.count(_ <= med).toDouble / vs.length
      assert(math.abs(rank - 0.5) < 0.05 || vs.length < 20,
        s"median rank $rank off for $key (n=${vs.length})")
    }
  }

  test("streaming CMS counters run as a real stream and match the batch plan") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_stream_cms")
    Files.copy(
      Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val q = graft.streaming.CountMinStream
      .windowedCounters(EventsStream.readStreamed(spark, dir.toString), d = 4, w = 512)
      .writeStream.outputMode("append").format("memory")
      .queryName("cms_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("cms_out").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val batch = graft.streaming.CountMinStream
        .windowedCounters(EventsStream.readBatch(spark, dir.toString), d = 4, w = 512)
        .collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      // append mode withholds windows newer than the final watermark —
      // streamed counters are a (large) identical-valued subset
      assert(streamed.nonEmpty && streamed.subsetOf(batch),
        s"streamed=${streamed.size} batch=${batch.size}")
      assert(streamed.size >= batch.size / 2, "watermark held back most windows")
    } finally q.stop()
  }

  test("CMS probe boundedness: LocalRelation and Range leaves are statically bounded (r12 ADVICE)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.streaming.CountMinStream
    val cap = CountMinStream.MaxProbeKeys
    // bounded leaves — no counting job needed
    assert(CountMinStream.staticallyBounded(Seq(1L, 2L, 3L).toDF("v")))
    assert(CountMinStream.staticallyBounded(
      spark.range(5).select(col("id").as("v"))))
    assert(CountMinStream.staticallyBounded(
      Seq(1L, 2L).toDF("v").filter(col("v") > 0).distinct()))
    // over-cap leaves are NOT blessed
    assert(!CountMinStream.staticallyBounded(
      spark.range(cap + 1L).select(col("id").as("v"))))
    // the LIMIT chain still works, and a limit UNDER a row-multiplying
    // node still does not bless the plan
    assert(CountMinStream.staticallyBounded(spark.range(10L * cap).limit(7).toDF()))
    val expander = spark.range(3).select(col("id").as("k"))
    val limited = spark.range(10L * cap).limit(7).select(lit(1L).as("k"))
    assert(!CountMinStream.staticallyBounded(limited.join(expander, "k")))
  }
}
