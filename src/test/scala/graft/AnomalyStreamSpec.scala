package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.AnomalyStream

/** Train-offline / flag-online metric anomaly serving: median/MAD
  * baselines from a batch reference flag event-time windows of a
  * stream — a steady window must not flag, a spiked window must, an
  * unseen category must flag by definition, and the streamed emission
  * must be bit-identical to the same plan run in batch.
  */
class AnomalyStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("steady window quiet, spike flags, unseen category flags, streamed == batch") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def at(hour: Int, min: Int = 1) =
      new java.sql.Timestamp(base.getTime + (hour * 60L + min) * 60000L)
    // reference traffic: 48 hours of steady per-hour counts 9..11 per type
    val refRows = (0 until 48).flatMap { h =>
      Seq.fill(9 + h % 3)(("click", at(h))) ++ Seq.fill(10)(("view", at(h)))
    }
    val ref = refRows.toDF("event_type", "ts")
    val baseMap = AnomalyStream.baselines(ref, "event_type", "ts", 3600L)
    assert(baseMap("click")._1 == 10L && baseMap("view")._1 == 10L)
    assert(baseMap("view")._2 == 0L)

    // live stream: hour 0 steady (10 clicks), hour 1 spiked (100 clicks)
    // + 3 events of a category the baseline never saw; a late tail closes
    // the watermark
    val live = Seq.fill(10)(("click", at(100))) ++
      Seq.fill(100)(("click", at(101))) ++
      Seq.fill(3)(("bot", at(101, 2))) ++
      Seq(("click", at(105)))
    val dir = Files.createTempDirectory("graft_anomaly_stream")
    val liveDf = live.toDF("event_type", "ts")
    liveDf.write.mode("overwrite").parquet(dir.toString)

    AnomalyStream.runOnce(spark, dir.toString, liveDf.schema, baseMap, "anomaly_stream_out")
    val out = spark.table("anomaly_stream_out").collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(5))))
      .toMap
    assert(out((at(100, 0), "click")) == ((10L, false)), "steady hour must not flag")
    assert(out((at(101, 0), "click"))._2, "spiked hour must flag")
    assert(out((at(101, 0), "bot")) == ((3L, true)), "unseen category must flag")

    // bit-identical batch replay of the same plan
    val batch = AnomalyStream.monitor(baseMap, spark.read.parquet(dir.toString))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(5))))
      .toMap
    out.foreach { case (k, v) => assert(batch(k) == v, s"window $k: $v vs ${batch(k)}") }
  }
}
