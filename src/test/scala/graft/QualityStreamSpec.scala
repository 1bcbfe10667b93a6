package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DetAgg
import graft.operators.LmScore
import graft.streaming.QualityScoreStream

/** Train-offline / score-online: a batch-trained LM model scores a
  * document stream statelessly; windowed per-source quality matches the
  * batch recomputation on the emitted (watermark-closed) windows.
  */
class QualityStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming quality monitor matches the batch windowed aggregation") {
    import spark.implicits._
    val batchDocs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
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
        ((r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(streamed.nonEmpty)

    // batch recomputation with the same model and expressions
    val batch = LmScore.scoreWith(model, spark.read.parquet(dir.toString),
        "doc_id", "text", keep = Seq("source", "ts"))
      .groupBy(window(col("ts"), "5 minutes"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(DetAgg.dsum(col("avg_nll")) / count(lit(1)), 6).as("mean_nll"),
        max(col("avg_nll")).as("worst_nll"))
      .select(col("window.start"), col("source"), col("n_docs"), col("mean_nll"), col("worst_nll"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap

    // append mode withholds windows newer than the final watermark: the
    // streamed map is a (large) subset of the batch map, value-identical
    streamed.foreach { case (k, v) =>
      assert(batch.get(k).contains(v), s"window $k: streamed=$v batch=${batch.get(k)}")
    }
    assert(streamed.size >= batch.size / 2,
      s"too few closed windows: streamed=${streamed.size} batch=${batch.size}")
    // model-serving contract: the same Model instance scored both paths,
    // so per-window means are bit-identical, not merely close
  }
}
