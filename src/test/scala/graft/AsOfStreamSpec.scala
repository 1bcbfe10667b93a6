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

  test("as-of stream killed mid-run resumes from checkpoint ≡ uninterrupted, TTL expiry crossing the restart") {
    // the r11 verdict's remaining recovery gap: SessionizeStream's
    // kill-and-resume is proven, AsOfStream (flatMapGroupsWithState +
    // event-time TTL) is the other custom-state operator and restart is
    // where TTL bugs live. Drive the SAME file-arrival sequence through
    // two pipelines — one killed after the first flush and restarted
    // from its checkpoint — and require identical emitted rows. The
    // sequence is built so key 1's retained reference EXPIRES (idle
    // TTL) in a trigger that runs AFTER the restart: the buffered
    // right row, its timeout timestamp, and the watermark must all
    // round-trip the state store for the post-restart probe to come
    // back None in the resumed run too.
    import java.nio.file.{Files, StandardCopyOption}
    import org.apache.spark.sql.types._
    import spark.implicits._

    def dropFile(df: org.apache.spark.sql.DataFrame, dir: java.nio.file.Path, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft_asofrec_w")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.copy(part, dir.resolve(name), StandardCopyOption.REPLACE_EXISTING)
    }

    val leftSchema = StructType(Seq(
      StructField("key", LongType), StructField("left_id", LongType),
      StructField("ts", TimestampType)))
    val rightSchema = StructType(Seq(
      StructField("key", LongType), StructField("value", DoubleType),
      StructField("ts", TimestampType)))

    def drive(kill: Boolean): Seq[(Long, Long, Option[Double])] = {
      val lDir = Files.createTempDirectory("graft_asofrec_l")
      val rDir = Files.createTempDirectory("graft_asofrec_r")
      val ckpt = Files.createTempDirectory("graft_asofrec_ckpt")
      val out = Files.createTempDirectory("graft_asofrec_out")
      def start() = AsOfStream.asOfStream(
        spark.readStream.schema(leftSchema).parquet(lDir.toString),
        spark.readStream.schema(rightSchema).parquet(rDir.toString),
        watermark = "10 seconds", idleTtlSeconds = 60L)
        .toDF()
        .writeStream.outputMode("append").format("parquet")
        .option("checkpointLocation", ckpt.toString)
        .option("path", out.toString)
        .start()
      // batch A: key 1's reference (t=10) + probe (t=50); the key-99
      // right at t=200 drives the watermark to 190, flushing the probe
      // with Some(1.0) and arming key 1's idle TTL at 190+60 = 250
      dropFile(Seq((1L, 1.0, ts(10)), (99L, 0.0, ts(200))).toDF("key", "value", "ts"), rDir, "ra.parquet")
      dropFile(Seq((1L, 100L, ts(50))).toDF("key", "left_id", "ts"), lDir, "la.parquet")
      val q1 = start()
      q1.processAllAvailable()
      // KILL between the flush and the TTL expiry
      val q2 = if (kill) { q1.stop(); start() } else q1
      // batch B: watermark to 390 — key 1's 250s timeout fires in a
      // post-restart trigger with no probes buffered → state dropped
      dropFile(Seq((99L, 0.0, ts(400))).toDF("key", "value", "ts"), rDir, "rb.parquet")
      q2.processAllAvailable()
      // batch C: a NEW key-1 probe after the expiry…
      dropFile(Seq((1L, 101L, ts(450))).toDF("key", "left_id", "ts"), lDir, "lc.parquet")
      q2.processAllAvailable()
      // …flushed by watermark 690: its reference is gone → None
      dropFile(Seq((99L, 0.0, ts(700))).toDF("key", "value", "ts"), rDir, "rd.parquet")
      q2.processAllAvailable()
      q2.stop()
      spark.read.schema(StructType(Seq(
        StructField("key", LongType), StructField("left_id", LongType),
        StructField("ts", TimestampType), StructField("asof_value", DoubleType))))
        .parquet(out.toString)
        .filter(col("key") === 1L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
        .toSeq.sortBy(t => (t._1, t._2))
    }

    val uninterrupted = drive(kill = false)
    val resumed = drive(kill = true)
    assert(uninterrupted == Seq(
      (1L, 100L, Some(1.0)), // pre-kill probe: matched its reference
      (1L, 101L, None)), // post-expiry probe: reference TTL'd out
      s"control run wrong: $uninterrupted")
    assert(resumed == uninterrupted,
      s"resumed run diverged:\nresumed=$resumed\ncontrol=$uninterrupted")
  }
}
