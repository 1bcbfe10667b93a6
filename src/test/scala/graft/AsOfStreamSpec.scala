package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin
import graft.streaming.AsOfStream

class AsOfStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 00:${s / 60}%02d:${s % 60}%02d")

  test("streaming as-of matches the batch operator across out-of-order triggers") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext

    // (key, left_id, ts) probes and (key, value, ts) references
    val leftRows = Seq(
      (1L, 100L, ts(50)), (1L, 101L, ts(150)), (1L, 102L, ts(240)),
      (2L, 200L, ts(60)), (3L, 300L, ts(90)))
    val rightRows = Seq(
      (1L, 2.0, ts(140)), (2L, 9.0, ts(70)), (1L, 1.0, ts(10)),
      (1L, 3.0, ts(150))) // key 2's right is AFTER its probe; key 3 has none

    val lefts = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val rights = MemoryStream[(Long, Double, java.sql.Timestamp)]
    val out = AsOfStream.asOfStream(
      lefts.toDF().toDF("key", "left_id", "ts"),
      rights.toDF().toDF("key", "value", "ts"),
      watermark = "2 minutes")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("asof_out").start()
    try {
      // trigger 1: some data, deliberately not time-ordered
      rights.addData((1L, 2.0, ts(140)), (2L, 9.0, ts(70)), (1L, 1.0, ts(10)))
      lefts.addData((1L, 101L, ts(150)), (2L, 200L, ts(60)))
      q.processAllAvailable()
      // trigger 2 (watermark now 30s): out-of-order but in-watermark
      // probes, plus the exact-tie right for key 1
      rights.addData((1L, 3.0, ts(150)))
      lefts.addData((1L, 100L, ts(50)), (3L, 300L, ts(90)))
      q.processAllAvailable()
      // trigger 3: advance the watermark far enough to flush everything —
      // keys 1/2/3 flush via the TIMEOUT path (no new data for them)
      lefts.addData((1L, 102L, ts(240)))
      rights.addData((9L, 0.0, ts(2000)))
      lefts.addData((9L, 900L, ts(2000)))
      q.processAllAvailable()
      rights.addData((9L, 0.0, ts(4000)))
      q.processAllAvailable()

      val streamed = spark.table("asof_out")
        .filter(col("key") =!= 9L)
        .select("key", "left_id", "asof_value")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet

      val batch = AsOfJoin.asOf(
        leftRows.toDF("key", "left_id", "ts"),
        rightRows.toDF("key", "value", "ts"),
        keys = Seq("key"), leftTime = "ts", rightTime = "ts",
        valueCols = Seq("value"))
        .select("key", "left_id", "asof_value")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet

      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      // spot-check the semantics: probe at 150 sees the value AT 150
      // (<= semantics), probe at 50 sees the 10s value, key-2 probe at 60
      // precedes its only right row, key 3 has no reference at all
      assert(streamed.contains((1L, 101L, Some(3.0))))
      assert(streamed.contains((1L, 100L, Some(1.0))))
      assert(streamed.contains((2L, 200L, None)))
      assert(streamed.contains((3L, 300L, None)))
    } finally q.stop()
  }

  test("a probe older than the watermark is dropped, not answered wrongly") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val lefts = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val rights = MemoryStream[(Long, Double, java.sql.Timestamp)]
    val out = AsOfStream.asOfStream(
      lefts.toDF().toDF("key", "left_id", "ts"),
      rights.toDF().toDF("key", "value", "ts"),
      watermark = "1 seconds")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("asof_late_out").start()
    try {
      // rights at 10 and 100; the 300s row drives the watermark to 299,
      // after which the state retains only the newest right ≤ wm (100)
      rights.addData((1L, 5.0, ts(10)), (1L, 7.0, ts(100)), (2L, 0.0, ts(300)))
      q.processAllAvailable()
      // probe at 50 is LATE (wm = 299). Its true match (the 10s right) was
      // legitimately pruned — emitting None would be plausible-but-wrong,
      // so the probe must be dropped at ingest.
      lefts.addData((1L, 50L, ts(50)))
      // an in-time probe on the same key still matches the retained right
      lefts.addData((1L, 51L, ts(400)))
      rights.addData((2L, 0.0, ts(1000)))
      q.processAllAvailable()
      rights.addData((2L, 0.0, ts(2000)))
      q.processAllAvailable()
      val got = spark.table("asof_late_out")
        .filter(col("key") === 1L)
        .select("left_id", "asof_value").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
      assert(!got.contains(50L), s"late probe should be dropped, got=$got")
      assert(got.get(51L).contains(Some(7.0)), s"got=$got")
    } finally q.stop()
  }

  test("idle TTL drops a key's retained reference; a pre-TTL probe still matches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val lefts = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val rights = MemoryStream[(Long, Double, java.sql.Timestamp)]
    val out = AsOfStream.asOfStream(
      lefts.toDF().toDF("key", "left_id", "ts"),
      rights.toDF().toDF("key", "value", "ts"),
      watermark = "1 seconds", idleTtlSeconds = 60L)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("asof_ttl_out").start()
    try {
      rights.addData((1L, 5.0, ts(0)))
      lefts.addData((1L, 10L, ts(30))) // within TTL of the reference
      rights.addData((2L, 1.0, ts(35))) // watermark driver
      q.processAllAvailable()
      lefts.addData((2L, 20L, ts(40)))
      rights.addData((3L, 1.0, ts(200))) // wm 199: flushes + expires key 1
      q.processAllAvailable()
      lefts.addData((1L, 11L, ts(500))) // key 1 probe AFTER its TTL expiry
      rights.addData((4L, 1.0, ts(1000)))
      q.processAllAvailable()
      lefts.addData((4L, 40L, ts(2000)))
      rights.addData((5L, 1.0, ts(3000)))
      q.processAllAvailable()
      val got = spark.table("asof_ttl_out")
        .filter(col("key").isin(1L))
        .select("left_id", "asof_value").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
      assert(got(10L) == Some(5.0)) // pre-TTL probe matched
      assert(got(11L) == None, s"got=$got") // post-TTL probe: reference expired
    } finally q.stop()
  }
}
