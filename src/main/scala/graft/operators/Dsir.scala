package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
  * score every raw document by how target-like its unigram mix is —
  * weight(doc) = Σ_tok log p̂_target(tok) / p̂_raw(tok) with add-1
  * smoothing — then keep the top-weighted slice. The standard way to
  * steer a 100 TB crawl toward a small high-quality target domain
  * without training a classifier.
  *
  * Plan shape (the part that matters at scale): ONE token explode feeds
  * BOTH the model estimate and the scoring pass. The model relation is
  * vocabulary-bounded (a hash aggregate with map-side partials — corpus
  * volume is absorbed before any shuffle), totals re-aggregate from the
  * model relation itself (never a second scan), and scoring is a
  * broadcast join of per-token log-ratios onto the token stream followed
  * by a per-doc hash aggregate. No window touches corpus-scale data; the
  * only top-k is a bounded TakeOrdered. For OPEN vocabularies (where
  * "vocabulary-bounded" stops being a bound) [[bucketed]] folds tokens
  * into 2^bucketBits hashed feature buckets first — the paper's hashed
  * n-gram variant — making the model relation's size a configuration
  * constant independent of the corpus.
  *
  * Determinism: per-token log-ratios are rounded to 6 decimals (the
  * LM-score family's ln-parity contract) and summed through the DetAgg
  * decimal route, so doc weights are bit-identical under any
  * partitioning and any engine evaluating the same formula text.
  */
object Dsir {

  /** Per-token smoothed log-ratio model from an exploded token stream
    * `(…, __t, __tgt)`: count tables, totals from the model relation,
    * round-6 log-ratio.
    */
  private def model(toks: DataFrame): DataFrame = {
    val m = toks.groupBy("__t").agg(
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("__ct"),
      count(lit(1)).as("__cr"))
    val tot = m.agg(
      sum("__ct").as("__nt"), sum("__cr").as("__nr"),
      count(lit(1)).as("__v"))
    m.crossJoin(broadcast(tot))
      .withColumn(
        "__llr",
        round(log(
          ((col("__ct") + lit(1.0)) * (col("__nr") + col("__v"))) /
            ((col("__cr") + lit(1.0)) * (col("__nt") + col("__v")))), 6))
      .select("__t", "__llr")
  }

  /** Importance weight per document over whitespace-token unigrams.
    * `inTarget` marks the target slice (it contributes to the target
    * counts AND gets scored like everything else, exactly as in the
    * paper's estimate). Output: all of `df`'s columns plus `weight`.
    */
  def importanceWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      inTarget: Column): DataFrame = {
    val toks = df.select(
      col(idCol), inTarget.as("__tgt"),
      explode(TextFunctions.tokens(col(textCol))).as("__t"))
    val w = toks.join(broadcast(model(toks)), "__t")
      .groupBy(idCol)
      .agg(graft.functions.DetAgg.dsum(col("__llr")).as("weight"))
    df.join(w, idCol)
  }

  /** The open-vocabulary tier: identical math over hashed feature
    * buckets (`xxhash64(token) & (2^bucketBits − 1)`), which caps the
    * model relation at 2^bucketBits rows no matter the corpus. With
    * enough bits and a closed vocabulary it is row-identical to
    * [[importanceWeights]] (collision-free buckets are a relabeling of
    * the token alphabet — DsirSpec pins this); at web scale the
    * collisions are the accepted approximation from the paper.
    */
  def importanceWeightsBucketed(
      df: DataFrame,
      idCol: String,
      textCol: String,
      inTarget: Column,
      bucketBits: Int = 20): DataFrame = {
    require(bucketBits >= 4 && bucketBits <= 30, s"bucketBits $bucketBits out of range")
    val toks = df.select(
      col(idCol), inTarget.as("__tgt"),
      explode(TextFunctions.tokens(col(textCol))).as("__tok"))
      .select(
        col(idCol), col("__tgt"),
        xxhash64(col("__tok")).bitwiseAND(lit((1L << bucketBits) - 1)).as("__t"))
    val w = toks.join(broadcast(model(toks)), "__t")
      .groupBy(idCol)
      .agg(graft.functions.DetAgg.dsum(col("__llr")).as("weight"))
    df.join(w, idCol)
  }

  /** Top-k selection by (weight desc, id) — the resampling step in its
    * deterministic top-k form (a bounded TakeOrdered, not a corpus
    * window).
    */
  def selectTop(weighted: DataFrame, idCol: String, k: Int): DataFrame =
    weighted.orderBy(col("weight").desc, col(idCol)).limit(k)
}
