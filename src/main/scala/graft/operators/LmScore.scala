package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character n-gram language-model scoring — the perplexity-proxy
  * quality filter of CCNet-style pipelines (public literature): train
  * character-trigram statistics on a reference corpus, score each
  * document by its average negative log-likelihood under the add-one-
  * smoothed conditional P(c₃ | c₁c₂). Outlier docs (binary junk,
  * wrong-language, generator loops) score high; fluent text scores low.
  *
  * Scale shape: the model is a MIN-COUNT-CAPPED distinct-trigram table.
  * Real text is alphabet-bounded (≲ 10⁵ distinct trigrams regardless of
  * corpus size), but junk/binary/unicode-noise corpora — exactly the
  * documents a perplexity filter is deployed against — inflate distinct
  * trigrams without bound, and an uncapped model would grow with corpus
  * entropy and OOM the driver collect. The `minCount` cap keeps only
  * trigrams seen at least that often: noise trigrams are overwhelmingly
  * singletons, so they drop out (and score as unseen — which is the
  * model's verdict on them anyway), while every statistically meaningful
  * trigram survives. Both count tables then broadcast and the scoring
  * pass is one explode + broadcast joins + one per-doc aggregate;
  * nothing shuffles but the (doc, partial-sum) rows. Per-term
  * log-likelihoods are rounded to 6 dp and summed through DetAgg
  * decimals, the house recipe that makes ln(·) oracle-portable.
  */
object LmScore {

  /** (id, tri) — lowercased character trigrams, one row per position.
    * Docs shorter than 3 chars produce no rows (nothing to score).
    */
  def charTrigrams(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id), lower(trim(col(text))).as("__t"))
      .select(
        col(id),
        explode(
          when(length(col("__t")) >= 3,
            expr("transform(sequence(1, length(__t) - 2), i -> substring(__t, i, 3))"))
            .otherwise(array())).as("tri"))

  /** The trained (and capped) model: (trigram, count) for every corpus
    * trigram with count ≥ `minCount`. Factored out so the driver-collect
    * bound is independently testable against adversarial corpora.
    */
  def trigramModel(
      corpus: DataFrame,
      id: String,
      text: String,
      minCount: Long): Array[(String, Long)] =
    charTrigrams(corpus, id, text)
      .groupBy("tri").agg(count(lit(1)).as("c_tri"))
      .filter(col("c_tri") >= minCount)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))

  /** Per-document average negative log-likelihood under the corpus's own
    * add-one-smoothed char-trigram model: (id, n_tri, avg_nll). `alpha`
    * is the smoothing vocabulary size (a fixed constant, not data-
    * derived, so scores are comparable across corpora); `minCount` is the
    * model cap — trigrams rarer than it are treated as unseen, both at
    * train time (dropped from the model AND from the prefix mass) and
    * therefore identically at score time.
    */
  def score(
      corpus: DataFrame,
      docs: DataFrame,
      id: String,
      text: String,
      alpha: Int = 256,
      minCount: Long = 2L): DataFrame = {
    import graft.functions.DetAgg
    val spark = corpus.sparkSession
    import spark.implicits._
    // TRAIN: one aggregate over the exploded corpus, then the CAPPED
    // model comes to the driver like any trained model (the Ivf-centroid
    // discipline) — bounded by repeated-content volume, never by corpus
    // entropy (see object doc). Deriving the prefix table driver-side
    // from the capped rows keeps the plan at exactly two corpus passes
    // and keeps the prefix mass consistent with the capped model; leaving
    // both tables lazy re-derived the full explode+aggregate subtree per
    // reference whenever exchange reuse missed.
    val triRows = trigramModel(corpus, id, text, minCount)
    val preRows = triRows
      .groupBy(_._1.substring(0, 2))
      .map { case (pre, rows) => pre -> rows.map(_._2).sum }
      .toSeq
    val triC = triRows.toSeq.toDF("tri", "c_tri")
    val preC = preRows.toDF("pre", "c_pre")
    val nll: Column = -round(
      log((col("c_tri").cast("double") + lit(1.0))
        / (col("c_pre").cast("double") + lit(alpha.toDouble))), 6)
    // SCORE: the second corpus pass — explode, two broadcast joins
    // against the local model tables, one per-doc aggregate
    charTrigrams(docs, id, text)
      .join(broadcast(triC), Seq("tri"), "left")
      .na.fill(0L, Seq("c_tri"))
      .withColumn("pre", substring(col("tri"), 1, 2))
      .join(broadcast(preC), Seq("pre"), "left")
      .na.fill(0L, Seq("c_pre"))
      .groupBy(col(id))
      .agg(
        count(lit(1)).as("n_tri"),
        round(DetAgg.dsum(nll) / count(lit(1)), 6).as("avg_nll"))
  }
}
