package graft

import org.apache.spark.sql.SparkSession

/** Engine-wide session tuning, shared by every main and the test session
  * so a new entry point cannot silently drop it.
  */
object GraftSession {

  /** Rank-guard conjuncts (`rn <= budget`) must map-side-prune at real
    * budget sizes — Spark's `InferWindowGroupLimit` only fires below
    * `windowGroupLimitThreshold`, which defaults to 1000 rows, far under
    * the engine's sampling/mixing budgets. Set to Int.MaxValue: the
    * group limit is a sort-order scan filter (no per-group buffering),
    * so there is no memory reason to cap it, and any budget it cannot
    * cover has already outgrown `row_number` itself — that regime is
    * [[graft.operators.Sampling.tokenBudgetCapFullSharded]]'s, not a
    * window's.
    */
  def tune(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.optimizer.windowGroupLimitThreshold", Int.MaxValue.toString)
      // Cached plans are otherwise exempt from AQE partition coalescing
      // (Spark keeps their output partitioning stable by default), so an
      // iterative operator that persists a tiny intermediate (e.g.
      // alternating-star's large-star output) would materialize it with
      // the full shuffle-partition count — hundreds of empty tasks per
      // round. The engine has no consumer that relies on a cached plan's
      // physical partitioning, so let AQE right-size them.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
}
