package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Dedup

/** Streaming decontamination gate — the ingest-time form of
  * [[graft.operators.Decontam]]: the benchmark's distinct shingle hashes
  * are precomputed ONCE in batch (benchmarks are tiny and static) and
  * shipped as a broadcast literal, so each incoming document scores its
  * overlap in a pure stateless projection — no streaming state, no
  * shuffle, no watermark. This is the right production shape: the gate
  * composes with any downstream sink and its throughput is the scan
  * rate.
  */
object DecontamStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Flag a document stream against a static benchmark: emits (doc_id,
    * n_sh, n_hit, overlap, contaminated) for every shingle-able doc —
    * same columns and semantics as `Decontam.overlap`.
    */
  def flagged(
      spark: SparkSession,
      path: String,
      benchmark: DataFrame,
      k: Int,
      threshold: Double): DataFrame = {
    val benchHashes: Seq[Long] = Dedup
      .shingles(benchmark, "doc_id", "text", k)
      .select(xxhash64(col("shingle")))
      .distinct()
      .collect()
      .map(_.getLong(0))
      .toSeq
    val bset = typedlit(benchHashes)
    val ratio = col("n_hit").cast("double") / col("n_sh")
    spark.readStream
      .schema(docSchema)
      .parquet(path)
      .withColumn(
        "sh",
        transform(Dedup.shingleArray(col("text"), k), s => xxhash64(s)))
      .withColumn("n_sh", size(col("sh")).cast("long"))
      .filter(col("n_sh") > 0)
      .withColumn("n_hit", size(array_intersect(col("sh"), bset)).cast("long"))
      .select(
        col("doc_id"), col("n_sh"), col("n_hit"),
        ratio.as("overlap"),
        (ratio >= lit(threshold)).as("contaminated"))
  }

  /** Synchronous local drive into a memory sink (spec/smoke path). */
  def runOnce(
      spark: SparkSession,
      path: String,
      benchmark: DataFrame,
      k: Int,
      threshold: Double,
      sinkTable: String): Unit = {
    val q = flagged(spark, path, benchmark, k, threshold)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(sinkTable)
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
