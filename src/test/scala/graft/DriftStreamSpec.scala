package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DriftStream

/** Train-offline / monitor-online drift: a batch-computed reference mix
  * scores event-time windows of a stream — a window matching the
  * reference must score ~0 on both statistics, a planted drifted window
  * must alarm, and a category the reference never saw must surface as
  * n_unseen rather than silently fold into either statistic.
  */
class DriftStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming drift monitor: clean window ~0, drifted window alarms, unseen surfaces") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def at(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    // reference corpus: uniform a/b/c/d
    val ref = DriftStream.referenceShares(
      Seq.fill(25)("a").concat(Seq.fill(25)("b")).concat(Seq.fill(25)("c"))
        .concat(Seq.fill(25)("d")).toDF("event_type"),
      "event_type")
    assert(ref == Map("a" -> 0.25, "b" -> 0.25, "c" -> 0.25, "d" -> 0.25))
    // window 1 (00:00): exactly the reference mix; window 2 (00:05): all
    // 'a' plus 5 events of an unseen type 'z'; a late tail (00:40) lets
    // the 10-minute watermark close both scored windows
    val w1 = Seq("a", "b", "c", "d").flatMap(c => Seq.fill(10)((c, at(0))))
    val w2 = Seq.fill(20)(("a", at(5))) ++ Seq.fill(5)(("z", at(6)))
    val tail = Seq(("a", at(40)))
    val dir = Files.createTempDirectory("graft_drift_stream")
    val events = (w1 ++ w2 ++ tail).toDF("event_type", "ts")
    events.write.mode("overwrite").parquet(dir.toString)

    DriftStream.runOnce(spark, dir.toString, events.schema, ref, "drift_stream_out")
    val out = spark.table("drift_stream_out").collect()
      .map(r => r.getTimestamp(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val (n1, u1, chi1, psi1) = out(at(0))
    assert(n1 == 40L && u1 == 0L)
    assert(chi1 == 0.0 && psi1.abs < 1e-9, s"clean window chi2=$chi1 psi=$psi1")
    val (n2, u2, chi2, psi2) = out(at(5))
    assert(n2 == 25L && u2 == 5L)
    // all-'a' mix vs uniform quarter shares: far over any alarm line
    assert(chi2 > 10.0 && psi2 > 0.25, s"drifted window chi2=$chi2 psi=$psi2")

    // the streamed emission is bit-identical to the same plan run in batch
    val batch = DriftStream.monitor(ref, spark.read.parquet(dir.toString))
      .collect()
      .map(r => r.getTimestamp(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    out.foreach { case (k, v) => assert(batch(k) == v, s"window $k: $v vs ${batch(k)}") }
  }
}
