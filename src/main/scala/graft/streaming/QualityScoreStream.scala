package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.DetAgg
import graft.operators.LmScore

/** Train-offline / score-online quality monitoring — the model-serving
  * shape of a production ingest: a char-trigram LM model trained on a
  * reference corpus in batch ([[LmScore.train]]) scores a document
  * stream, and a watermarked window aggregates per-source quality the
  * way a pipeline owner watches an ingest dashboard.
  *
  * The scoring pass composes with Structured Streaming precisely BECAUSE
  * it is map-only (PlanSpec pins that shape): no join, no shuffle, no
  * state — the model rides the task closure, so scoring adds zero state
  * store. The only stateful operator is the windowed aggregate, whose
  * state is bounded by (open windows × sources) and released as the
  * watermark passes; mean NLL sums through DetAgg decimals, so emitted
  * windows are bit-stable across retries and partitionings.
  */
object QualityScoreStream {

  /** Per (event-time window, source): TOTAL document volume (including
    * unscoreable empty/garbage-short docs — a flood of those is exactly
    * the ingest failure a monitor must surface, so `keepUnscored` keeps
    * them visible as volume), scoreable count, decimal-summed mean NLL
    * over the scoreable ones, and the window's worst (highest-NLL) score.
    */
  def monitor(
      model: LmScore.Model,
      docs: DataFrame, // streaming: id, source, ts (timestamp), text
      id: String = "doc_id",
      text: String = "text",
      watermark: String = "10 minutes",
      windowLen: String = "5 minutes"): DataFrame =
    LmScore.scoreWith(model, docs, id, text, keep = Seq("source", "ts"), keepUnscored = true)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        count(col("avg_nll")).as("n_scored"),
        round(DetAgg.dsum(col("avg_nll")) / count(col("avg_nll")), 6).as("mean_nll"),
        max(col("avg_nll")).as("worst_nll"))
      .select(
        col("window.start").as("window_start"),
        col("source"), col("n_docs"), col("n_scored"), col("mean_nll"), col("worst_nll"))

  /** Synchronous local drive into a memory sink (spec/smoke path):
    * read a parquet-backed document stream, score with `model`, emit
    * closed windows in append mode.
    */
  def runOnce(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType,
      model: LmScore.Model,
      sinkTable: String): Unit = {
    val docs = spark.readStream.schema(schema).parquet(path)
    val q = monitor(model, docs)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(sinkTable)
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
