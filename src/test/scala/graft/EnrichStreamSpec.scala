package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EnrichStream

class EnrichStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 00:${s / 60}%02d:${s % 60}%02d")

  test("stream-static dimension enrichment broadcasts per micro-batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("event_id", "dev")
    val dim = Seq(("d1", "ACME"), ("d2", "Initech")).toDF("dev", "maker")
    val q = EnrichStream.withDimension(stream, dim, "dev")
      .writeStream.outputMode("append").format("memory").queryName("enrich_out").start()
    try {
      input.addData((1L, "d1"), (2L, "d2"), (3L, "dX"))
      q.processAllAvailable()
      val got = spark.table("enrich_out").collect()
        .map(r => r.getLong(1) -> Option(r.getString(2))).toMap
      assert(got == Map(1L -> Some("ACME"), 2L -> Some("Initech"), 3L -> None))
    } finally q.stop()
  }

  test("stream-stream interval join pairs each click with recent views only") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val views = MemoryStream[(Long, Double, java.sql.Timestamp)]
    val c = clicks.toDF().toDF("click_id", "user_id", "cts")
    val v = views.toDF().toDF("user_id", "value", "vts")
    val joined = EnrichStream.intervalJoin(
      c, v, "user_id", "cts", "vts", intervalSeconds = 60, watermark = "5 minutes")
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("interval_out").start()
    try {
      views.addData((7L, 1.0, ts(0)), (7L, 2.0, ts(100)), (8L, 9.0, ts(10)))
      clicks.addData((100L, 7L, ts(110)), (101L, 8L, ts(200)))
      q.processAllAvailable()
      val got = spark.table("interval_out")
        .select("click_id", "value").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      // click 100 at t=110: view 2.0 (t=100) is within 60s, view 1.0 (t=0) is not;
      // click 101 at t=200: view 9.0 (t=10) is 190s old — no pair
      assert(got == Set((100L, 2.0)), s"got $got")
    } finally q.stop()
  }
}
