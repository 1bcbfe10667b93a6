package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.{Components, Dedup}

/** The dedup family's HONEST 10× data point (r12 verdict item 4).
  *
  * The wave-48 sf1 rehearsal replicated documents as EXACT clones, which
  * inflates duplicate PAIRS quadratically (10 clones of one doc = 45
  * cross-pairs each) — 28,000× the pair volume for 10× the rows, so its
  * 14–21× wall ratios measured the replica artifact, not the operators.
  * This probe builds the content-shifted corpus instead
  * ([[ScaleProbe.scaledDocs]]: a fixed-width per-copy token suffix makes
  * every copy's shingle space disjoint while preserving each copy's
  * internal planted-dup structure verbatim), so the TRUE pair count
  * grows exactly ×copies — pair-count-honest scaling — and wall ratios
  * at ×10 measure the algorithms.
  *
  * Corpora are scratch-materialized to parquet before timing (the
  * registry rows read parquet too; the generator must not ride the
  * timer). For `components_incremental` the prior labeling is likewise
  * built OUTSIDE the timer — it is yesterday's persisted state in
  * production — and only the batch-touching work is timed.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.tools.DedupTenX [copiesCsv]"   (default 1,10)
  */
object DedupTenX {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val ladder = args.headOption.getOrElse("1,10")
      .split(",").map(_.trim.toInt).toSeq
    val spark = graft.GraftSession.tune(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    docs0.count() // warmup

    def timed(name: String, copies: Int)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"""{"probe":"$name","copies":$copies,"rows":$n,"sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    for (c <- ladder) {
      val d = graft.pipeline.PipelineStage.scratch(
        ScaleProbe.scaledDocs(docs0, c), s"tenx-docs-$c")

      timed("dedup_substring_spans", c) {
        Dedup.duplicateSpans(d, "doc_id", "text", w = 40).count()
      }

      timed("dedup_components", c) {
        Components.alternatingStar(
          d.select("doc_id"),
          Dedup.jaccardPairs(d, "doc_id", "text", k = 3, threshold = 0.5),
          "doc_id", "id_a", "id_b").count()
      }

      // keep_best = components + the text_quality tree + per-cluster
      // ranking (the registry construction, end to end)
      timed("dedup_keep_best", c) {
        val pairs = Dedup.jaccardPairs(d, "doc_id", "text", k = 3, threshold = 0.5)
        val comp = Components.alternatingStar(
          d.select("doc_id"), pairs, "doc_id", "id_a", "id_b")
        val stop = Seq("the", "and", "of", "to", "is", "a")
        val qual = d
          .select(
            col("doc_id"),
            length(col("text")).cast(LongType).as("n_chars_calc"),
            graft.functions.TextFunctions.tokenCount(col("text"))
              .cast(LongType).as("n_tokens"),
            (length(col("text"))
              - length(regexp_replace(col("text"), "[^\\w\\s]", "")))
              .cast(LongType).as("n_punct"),
            graft.functions.TextFunctions.wordHits(col("text"), stop)
              .cast(LongType).as("n_stop"))
          .select(
            col("doc_id"),
            (lit(0.4) * (col("n_stop").cast("double") / col("n_tokens"))
              + lit(0.3) * (lit(1.0) - col("n_punct").cast("double") / col("n_chars_calc"))
              + lit(0.3) * least(col("n_tokens") / lit(100.0), lit(1.0)))
              .as("quality"))
        Dedup.resolveKeep(comp.join(qual, "doc_id"), "doc_id", "component",
          col("quality")).count()
      }

      // incremental: prior labeling of the 90% corpus is pre-built state
      // (outside the timer); timed work = batch pair derivation + merge
      val corpus = d.filter(col("doc_id") % 10 =!= 0)
      val batch = d.filter(col("doc_id") % 10 === 0)
      val prior = graft.pipeline.PipelineStage.scratch(
        Components.alternatingStar(
          corpus.select("doc_id"),
          Dedup.jaccardPairs(corpus, "doc_id", "text", k = 3, threshold = 0.5),
          "doc_id", "id_a", "id_b"),
        s"tenx-prior-$c")
      timed("dedup_components_incremental", c) {
        val newPairs = Dedup.jaccardPairsAgainst(
          batch, d, "doc_id", "text", k = 3, threshold = 0.5)
        Components.incrementalUpdate(
          prior, "doc_id", "component",
          batch.select("doc_id"), newPairs, "id_a", "id_b").count()
      }
    }
    spark.stop()
  }
}
