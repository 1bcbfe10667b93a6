package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Train-offline / monitor-online DISTRIBUTION drift for a streaming
  * ingest — the serving shape of [[graft.functions.Stats.chi2Homogeneity]]
  * / [[graft.functions.Stats.psi]]: a categorical reference mix is
  * computed once in batch (yesterday's corpus, the contract mix, the
  * last good crawl), broadcast as plain literals, and every event-time
  * window of the stream is scored against it — χ² goodness-of-fit and
  * PSI per window, plus the count of categories the reference has never
  * seen (its own alarm axis: a new event type IS a drift).
  *
  * Streaming shape: the reference categories are KNOWN at plan time, so
  * the per-window category counts are conditional sums inside ONE
  * watermarked windowed aggregate — a single stateful operator, state
  * bounded by open windows × nothing (the categories are columns, not
  * rows), released as the watermark passes. The χ²/PSI folds are scalar
  * expression trees over that one row — fixed evaluation order, so
  * emitted windows are bit-stable across retries and partitionings (the
  * same reason the batch kernels hash-match DuckDB).
  */
object DriftStream {

  /** The batch trainer: exact category shares of a reference corpus.
    * One hash aggregate; the collect is ≤ #categories rows. Null
    * categories are a real category in [[graft.functions.Stats
    * .chi2Homogeneity]], but a REFERENCE mix is a contract — null here
    * means the reference itself is malformed, so it throws rather than
    * silently becoming a share.
    */
  def referenceShares(df: DataFrame, category: String): Map[String, Double] = {
    val rows = df.groupBy(col(category)).agg(count(lit(1)).as("__c")).collect()
    require(
      rows.forall(!_.isNullAt(0)),
      s"reference corpus has null $category values — fix the reference, " +
        "a contract mix cannot contain a nameless category")
    val total = rows.map(_.getLong(1)).sum.toDouble
    rows.map(r => r.getString(0) -> r.getLong(1) / total).toMap
  }

  /** Per event-time window: `(window_start, n_events, n_unseen, chi2,
    * psi)` against the reference shares. χ² is goodness-of-fit over the
    * reference categories (dof = #cats − 1, constant — the caller owns
    * the quantile); PSI uses the conventional `eps` floor on observed
    * shares. Categories absent from the reference are NOT folded into
    * either statistic (their expected share is a contract question, not
    * ε) — they are surfaced as `n_unseen`.
    */
  def monitor(
      ref: Map[String, Double],
      events: DataFrame, // streaming: category, ts (timestamp)
      category: String = "event_type",
      ts: String = "ts",
      watermark: String = "10 minutes",
      windowLen: String = "5 minutes",
      eps: Double = 1e-6): DataFrame = {
    require(ref.nonEmpty, "empty reference mix")
    val cats = ref.keys.toSeq.sorted
    val catAggs = cats.map(c =>
      sum(when(col(category) === c, 1L).otherwise(0L)).as(s"__c_$c"))
    val aggs = catAggs ++ Seq(
      count(lit(1)).as("__n"),
      sum(when(col(category).isin(cats: _*), 0L).otherwise(1L)).as("__unseen"))
    val counted = events
      .withWatermark(ts, watermark)
      .groupBy(window(col(ts), windowLen))
      .agg(aggs.head, aggs.tail: _*)
    val chi2 = cats.map { c =>
      val o = col(s"__c_$c")
      val e = col("__n") * lit(ref(c))
      (o - e) * (o - e) / e
    }.reduce(_ + _)
    val psi = cats.map { c =>
      val o = greatest(col(s"__c_$c").cast("double") / col("__n"), lit(eps))
      val p = lit(ref(c))
      (o - p) * log(o / p)
    }.reduce(_ + _)
    counted.select(
      col("window.start").as("window_start"),
      col("__n").as("n_events"),
      col("__unseen").as("n_unseen"),
      round(chi2, 6).as("chi2"),
      round(psi, 6).as("psi"))
  }

  /** Synchronous local drive into a memory sink (spec/smoke path). */
  def runOnce(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType,
      ref: Map[String, Double],
      sinkTable: String): Unit = {
    val events = spark.readStream.schema(schema).parquet(path)
    val q = monitor(ref, events)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(sinkTable)
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
