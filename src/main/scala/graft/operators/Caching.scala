package graft.operators

import org.apache.spark.sql.DataFrame

/** Scoped caching: persist inputs for the duration of an EAGER computation
  * and guarantee unpersist on exit — so operators own no persisted state
  * after they return (a leaked cache on a 100 TB corpus is an executor-
  * memory time bomb the caller never sees).
  *
  * The bracket is only sound when `f` fully CONSUMES the cached frames
  * (collects, writes, or aggregates to the driver) — a lazy DataFrame
  * returned out of `f` would silently recompute after the unpersist.
  * Operators that return lazy plans should instead restage so the reused
  * intermediate is cheap to recompute (ids-only projections, semi-join
  * pruned subsets) rather than caching the corpus — see
  * [[Similarity.lshNearDupPairs]] and [[Dedup.minHashPairs]].
  */
object Caching {

  /** Persist `dfs`, run `f` (which must be eager), always unpersist. */
  def withCached[A](dfs: DataFrame*)(f: => A): A =
    withCachedLevel(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK, dfs: _*)(f)

  /** [[withCached]] with an explicit storage level. */
  def withCachedLevel[A](
      level: org.apache.spark.storage.StorageLevel,
      dfs: DataFrame*)(f: => A): A = {
    dfs.foreach(_.persist(level))
    try f
    finally dfs.foreach(_.unpersist(blocking = false))
  }
}
