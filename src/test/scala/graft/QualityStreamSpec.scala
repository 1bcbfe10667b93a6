package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DetAgg
import graft.operators.LmScore
import graft.streaming.QualityScoreStream

/** Train-offline / score-online: a batch-trained LM model scores a
  * document stream statelessly; windowed per-source quality matches the
  * batch recomputation on the emitted (watermark-closed) windows, and
  * unscoreable docs stay VISIBLE as volume.
  */
class QualityStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming quality monitor matches the batch windowed aggregation") {
    import spark.implicits._
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    // planted ingest failure: a burst of empty/too-short docs — the
    // monitor must count them as volume, not silently drop them
    val garbage = (0 until 40)
      .map(i => (900000L + i, s"src${i % 4}", if (i % 2 == 0) "" else "ab"))
      .toDF("doc_id", "source", "text")
    val batchDocs = real.unionByName(garbage)
      // event time spread over ~100 minutes so the 10-minute watermark
      // closes most 5-minute windows after one pass
      .withColumn(
        "ts",
        expr("to_timestamp('2026-01-01 00:00:00') + make_interval(0, 0, 0, 0, 0, CAST(doc_id % 100 AS INT), 0)"))
    val dir = Files.createTempDirectory("graft_quality_stream")
    batchDocs.write.mode("overwrite").parquet(dir.toString)

    val model = LmScore.train(batchDocs, "doc_id", "text")
    QualityScoreStream.runOnce(
      spark, dir.toString, batchDocs.schema, model, "quality_stream_out")
    val streamed = spark.table("quality_stream_out").collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) Double.NaN else r.getDouble(4),
          if (r.isNullAt(5)) Double.NaN else r.getDouble(5))))
      .toMap
    assert(streamed.nonEmpty)

    // batch recomputation with the same model and expressions
    val batch = LmScore.scoreWith(model, spark.read.parquet(dir.toString),
        "doc_id", "text", keep = Seq("source", "ts"), keepUnscored = true)
      .groupBy(window(col("ts"), "5 minutes"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        count(col("avg_nll")).as("n_scored"),
        round(DetAgg.dsum(col("avg_nll")) / count(col("avg_nll")), 6).as("mean_nll"),
        max(col("avg_nll")).as("worst_nll"))
      .select(col("window.start"), col("source"),
        col("n_docs"), col("n_scored"), col("mean_nll"), col("worst_nll"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) Double.NaN else r.getDouble(4),
          if (r.isNullAt(5)) Double.NaN else r.getDouble(5))))
      .toMap

    // append mode withholds windows newer than the final watermark: the
    // streamed map is a (large) subset of the batch map, value-identical
    // (NaN stands in for null on unscoreable-only windows)
    streamed.foreach { case (k, v) =>
      val b = batch.get(k)
      assert(b.isDefined, s"window $k missing from batch")
      val e = b.get
      def eq(a: Double, x: Double) = (a.isNaN && x.isNaN) || a == x
      assert(v._1 == e._1 && v._2 == e._2 && eq(v._3, e._3) && eq(v._4, e._4),
        s"window $k: streamed=$v batch=$e")
    }
    assert(streamed.size >= batch.size / 2,
      s"too few closed windows: streamed=${streamed.size} batch=${batch.size}")
    // the planted garbage is VISIBLE: its windows count it in n_docs but
    // not in n_scored
    val withGarbage = streamed.filter { case (_, (nDocs, nScored, _, _)) => nDocs > nScored }
    assert(withGarbage.nonEmpty, "unscoreable docs vanished from the monitor")
  }
}
