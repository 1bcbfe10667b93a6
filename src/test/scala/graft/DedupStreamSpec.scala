package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DedupStream

class DedupStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming content dedup keeps the batch path's survivors") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val df = input.toDF().toDF("doc_id", "text", "ts")
    val deduped = DedupStream.dedupByContent(df, "text", "ts", "10 minutes")
    val q = deduped.writeStream
      .outputMode("append").format("memory").queryName("dedup_out").start()
    try {
      def t(s: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:${s / 60}%02d:${s % 60}%02d")
      input.addData(
        (1L, "the quick brown fox", t(0)),
        (2L, "THE  QUICK   BROWN FOX  ", t(10)), // normalizes to same fp
        (3L, "something else entirely", t(20)))
      q.processAllAvailable()
      input.addData(
        (4L, "the quick brown fox", t(30)), // dup across micro-batches
        (5L, "a third distinct text", t(40)))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 3L, 5L), s"got $ids")
      // batch twin agrees on the survivor set
      val batch = Seq(
        (1L, "the quick brown fox"), (2L, "THE  QUICK   BROWN FOX  "),
        (3L, "something else entirely"), (4L, "the quick brown fox"),
        (5L, "a third distinct text")).toDF("doc_id", "text")
      val batchKeep = graft.operators.Dedup.exactGroups(
        batch, "doc_id", graft.functions.TextFunctions.fingerprint(col("text")))
        .select("keep_id").collect().map(_.getLong(0)).toSet
      assert(batchKeep == ids)
    } finally q.stop()
  }

  test("streaming id dedup drops replayed event ids within the watermark") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val df = input.toDF().toDF("event_id", "ts")
    val q = DedupStream.dedupById(df, "event_id", "ts", "5 minutes")
      .writeStream.outputMode("append").format("memory").queryName("iddedup_out").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      input.addData((1L, t0), (2L, t0), (1L, t0)) // replay within batch
      q.processAllAvailable()
      input.addData((2L, t0), (3L, t0)) // replay across batches
      q.processAllAvailable()
      val ids = spark.table("iddedup_out").select("event_id")
        .collect().map(_.getLong(0)).toSeq.sorted
      assert(ids == Seq(1L, 2L, 3L), s"got $ids")
    } finally q.stop()
  }
}
