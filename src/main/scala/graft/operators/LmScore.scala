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
  * Scale shape: the model is a DISTINCT-TRIGRAM table — bounded by the
  * alphabet (≲ 10⁵ rows for real text, regardless of corpus size) — so
  * both count tables broadcast and the scoring pass is one explode +
  * broadcast joins + one per-doc aggregate; nothing shuffles but the
  * (doc, partial-sum) rows. Per-term log-likelihoods are rounded to 6 dp
  * and summed through DetAgg decimals, the house recipe that makes
  * ln(·) oracle-portable.
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

  /** Per-document average negative log-likelihood under the corpus's own
    * add-one-smoothed char-trigram model: (id, n_tri, avg_nll). `alpha`
    * is the smoothing vocabulary size (a fixed constant, not data-
    * derived, so scores are comparable across corpora).
    */
  def score(
      corpus: DataFrame,
      docs: DataFrame,
      id: String,
      text: String,
      alpha: Int = 256): DataFrame = {
    import graft.functions.DetAgg
    val spark = corpus.sparkSession
    import spark.implicits._
    // TRAIN: one aggregate over the exploded corpus, then the model — an
    // alphabet-bounded distinct-trigram table, ≲10⁵ rows for real text
    // regardless of corpus size — comes to the driver like any trained
    // model (the Ivf-centroid discipline). Deriving the prefix table
    // driver-side keeps the plan at exactly two corpus passes; leaving
    // both tables lazy re-derived the full explode+aggregate subtree per
    // reference whenever exchange reuse missed.
    val triRows = charTrigrams(corpus, id, text)
      .groupBy("tri").agg(count(lit(1)).as("c_tri"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
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
