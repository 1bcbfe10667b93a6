package graft.operators

/** Process-wide train-once / serve-many model memo shared by the
  * trainable operators ([[LmScore]], [[Ivf]], [[Pq]]). One helper so the
  * key discipline lives in ONE place: the key is the operator kind plus
  * the FULL training-parameter list — including the input COLUMN names,
  * whose omission from a hand-rolled per-operator key would silently
  * return a model trained on a different column of the same corpus.
  *
  * The caller owns corpus-key hygiene: a reused `corpusKey` over changed
  * data returns the stale model (training is deterministic in
  * (corpus, params), so keys over stable corpora are sound).
  *
  * Bounded: past [[MaxEntries]] distinct models the cache clears
  * wholesale before inserting. The expected population is a handful of
  * corpora × parameter sets; the worst case after a clear is one
  * retrain per live model, and a long-lived driver iterating over many
  * corpora never accumulates unreleasable heap (an IVF model is k × dim
  * doubles — ~32 MB at k=4096, dim=1024).
  */
private[operators] object TrainCache {
  val MaxEntries = 64

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, Seq[Any]), AnyRef]

  def memo[T <: AnyRef](kind: String, key: Seq[Any])(train: => T): T = {
    if (cache.size > MaxEntries) cache.clear()
    cache.computeIfAbsent((kind, key), _ => train).asInstanceOf[T]
  }
}
