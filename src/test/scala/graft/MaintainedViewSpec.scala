package graft

import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.MaintainedView

/** The composed IVM maintained-MV under REAL streaming machinery (r13
  * verdict item 5): a file-source stream driven through
  * [[MaintainedView.sink]] (`foreachBatch` + versioned parquet state +
  * delta log), with a kill-and-restart across a batch boundary and a
  * planted delete batch that underflows a k=2 MIN heap — so the repair
  * path must rescan the delta log's survivors, post-restart, from state
  * that round-tripped parquet. Resumed ≡ uninterrupted ≡ from-scratch
  * rebuild is the whole claim of incremental view maintenance.
  */
class MaintainedViewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("k", StringType),
    StructField("value", DoubleType), StructField("vb", LongType),
    StructField("op", StringType)))

  private def dropFile(
      rows: Seq[(Long, String, Option[Double], Option[Long], String)],
      dir: java.nio.file.Path, name: String): Unit = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_mv_w")
    rows.toDF("id", "k", "value", "vb", "op")
      .select(col("id"), col("k"), col("value").cast("double"),
        col("vb").cast("long"), col("op"))
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).toArray.map(_.asInstanceOf[java.nio.file.Path])
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.copy(part, dir.resolve(name), StandardCopyOption.REPLACE_EXISTING)
  }

  // three generations: base inserts, more inserts, then a delete batch
  // that (a) removes BOTH tracked copies of group a's minimum — heap
  // exhaustion at k = 2 with survivors left, the repair trigger — and
  // (b) deletes a NULL-measure row (must decrement n only)
  private def r(id: Long, k: String, v: Double, op: String = "I") =
    (id, k, Some(v), Some(math.floor(v * 10).toLong), op)
  private def rNull(id: Long, k: String, op: String) =
    (id, k, None: Option[Double], None: Option[Long], op)

  private val b0 = Seq(r(1, "a", 1.0), r(2, "a", 1.0), r(3, "a", 5.0),
    r(4, "b", 2.0), rNull(5, "b", "I"))
  private val b1 = Seq(r(6, "a", 9.0), r(7, "b", 4.0), r(8, "b", 2.0))
  private val b2 = Seq(r(1, "a", 1.0, "D"), r(2, "a", 1.0, "D"),
    rNull(5, "b", "D"))

  private def drive(kill: Boolean): Seq[Row] = {
    val srcDir = Files.createTempDirectory("graft_mv_src")
    val ckpt = Files.createTempDirectory("graft_mv_ckpt")
    val stateDir = Files.createTempDirectory("graft_mv_state").toString
    def start() = spark.readStream.schema(schema).parquet(srcDir.toString)
      .writeStream
      .foreachBatch(MaintainedView.sink(
        stateDir, "id", Seq("k"), "value", "vb", k = 2) _)
      .option("checkpointLocation", ckpt.toString)
      .start()
    dropFile(b0, srcDir, "b0.parquet")
    val q1 = start()
    q1.processAllAvailable()
    // KILL across the batch boundary: the resumed run must fold b1/b2
    // from the parquet state version b0 committed
    val q2 = if (kill) { q1.stop(); start() } else q1
    dropFile(b1, srcDir, "b1.parquet")
    q2.processAllAvailable()
    dropFile(b2, srcDir, "b2.parquet")
    q2.processAllAvailable()
    q2.stop()
    // version pruning holds: the state never grows past parent + current
    for (c <- Seq("agg", "minmax", "distinct")) {
      val n = new java.io.File(s"$stateDir/$c").list().count(_.startsWith("v="))
      assert(n <= 2, s"$c state holds $n versions — pruning failed")
    }
    MaintainedView.latestView(spark, stateDir, Seq("k"))
      .orderBy("k").collect().toSeq.map(Row.of)
  }

  case class Row(k: String, n: Long, total: Double, mean: Option[Double],
      min: Option[Double], max: Option[Double], nDistinct: Long)
  object Row {
    def of(r: org.apache.spark.sql.Row): Row = Row(
      r.getString(0), r.getLong(1), r.getDouble(2),
      if (r.isNullAt(3)) None else Some(r.getDouble(3)),
      if (r.isNullAt(4)) None else Some(r.getDouble(4)),
      if (r.isNullAt(5)) None else Some(r.getDouble(5)),
      r.getLong(6))
  }

  test("streamed maintained view: kill-and-resume ≡ uninterrupted ≡ from-scratch rebuild") {
    // survivors: a = {5.0, 9.0}; b = {2.0, 4.0, 2.0} (the NULL row and
    // both a-minimum copies deleted). The a-group delete EXHAUSTS the
    // k=2 lo heap ([1.0, 1.0] tracked, both deleted, 5.0/9.0 survive) —
    // underflow, so the sink's repair must rescan the log survivors.
    val expected = Seq(
      Row("a", 2L, 14.0, Some(7.0), Some(5.0), Some(9.0), 2L),
      Row("b", 3L, 8.0, Some(8.0 / 3.0), Some(2.0), Some(4.0), 2L))
    val uninterrupted = drive(kill = false)
    assert(uninterrupted == expected, s"uninterrupted: $uninterrupted")
    val resumed = drive(kill = true)
    assert(resumed == expected, s"resumed: $resumed")
  }

  test("delete-then-reinsert under the same id survives the underflow repair (net-count log)") {
    import spark.implicits._
    // r14 review finding: an anti join on the id would drop a
    // re-inserted row from the repair's survivor set while the fold
    // states still count it. id=1 (a, 1.0) is deleted in batch 1 and
    // RE-INSERTED in batch 2; batch 3 deletes both remaining copies of
    // a's 5.0 minimum — exhausting the k=2 lo heap, so the repair MUST
    // rescan the log and must see the re-inserted 1.0 as a's min.
    val stateDir = Files.createTempDirectory("graft_mv_reins").toString
    def toDf(rows: Seq[(Long, String, Option[Double], Option[Long], String)]) =
      rows.toDF("id", "k", "value", "vb", "op")
        .select(col("id"), col("k"), col("value").cast("double"),
          col("vb").cast("long"), col("op"))
    val sink = MaintainedView.sink(stateDir, "id", Seq("k"), "value", "vb", k = 2) _
    // id=1 (4.0) sits OUTSIDE the k=2 lo heap [1.0, 2.0] the whole time;
    // it is deleted, re-inserted, and must be the repaired min after the
    // heap's covered window is exhausted
    sink(toDf(Seq(r(1, "a", 4.0), r(2, "a", 1.0), r(3, "a", 2.0), r(4, "a", 9.0))), 0L)
    sink(toDf(Seq(r(1, "a", 4.0, "D"))), 1L)
    sink(toDf(Seq(r(1, "a", 4.0))), 2L)
    sink(toDf(Seq(r(2, "a", 1.0, "D"), r(3, "a", 2.0, "D"))), 3L)
    val got = MaintainedView.latestView(spark, stateDir, Seq("k"))
      .collect().toSeq.map(Row.of)
    // survivors: {4.0 (re-inserted), 9.0} — the anti-join form repaired
    // to {9.0} only and reported min = 9.0
    assert(got == Seq(Row("a", 2L, 13.0, Some(6.5), Some(4.0), Some(9.0), 2L)),
      got.toString)
  }

  test("replayed batch id re-folds from the same parent (exactly-once under the crash window)") {
    import spark.implicits._
    val stateDir = Files.createTempDirectory("graft_mv_replay").toString
    def toDf(rows: Seq[(Long, String, Option[Double], Option[Long], String)]) =
      rows.toDF("id", "k", "value", "vb", "op")
        .select(col("id"), col("k"), col("value").cast("double"),
          col("vb").cast("long"), col("op"))
    val sink = MaintainedView.sink(stateDir, "id", Seq("k"), "value", "vb", k = 2) _
    sink(toDf(b0), 0L)
    sink(toDf(b1), 1L)
    // the crash window: batch 2 runs, commit log never written, batch 2
    // REPLAYS with the same id — the state must not double-apply it
    sink(toDf(b2), 2L)
    sink(toDf(b2), 2L)
    val got = MaintainedView.latestView(spark, stateDir, Seq("k"))
      .orderBy("k").collect().toSeq.map(Row.of)
    assert(got == Seq(
      Row("a", 2L, 14.0, Some(7.0), Some(5.0), Some(9.0), 2L),
      Row("b", 3L, 8.0, Some(8.0 / 3.0), Some(2.0), Some(4.0), 2L)),
      got.toString)
  }
}
