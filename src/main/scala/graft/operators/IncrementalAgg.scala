package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.DetAgg

/** Incremental aggregate maintenance (IVM) — keep a per-group aggregate
  * view current under appends AND deletes without ever recomputing
  * history: the missing member of the maintenance family beside
  * [[Snapshot]]'s diff/upsert/SCD2 (which maintain ROWS; this maintains
  * an AGGREGATE).
  *
  * The state is the classic partial-aggregate form (group keys, count,
  * exact-decimal sum): counts and decimal sums form a commutative group
  * under addition, so
  *
  *  - an INSERT batch folds in as its own partials,
  *  - a DELETE batch folds in as NEGATED partials (retraction),
  *  - merge order never matters (associative + commutative — AQE can
  *    re-plan, batches can arrive out of order, shards can merge in a
  *    tree), and
  *  - a group whose count returns to zero leaves the state entirely.
  *
  * COUNT / SUM / AVG (= sum / non-null count at read time — SQL AVG
  * semantics, with the non-null count carried in the state) are exactly
  * maintainable this way; MIN / MAX are NOT retractable (deleting the
  * current min needs the runner-up, which the state no longer has) —
  * callers needing them under deletes must recompute or keep a heavy
  * per-group sketch, and that boundary is part of this operator's
  * contract, not a bug.
  *
  * At 100 TB: each delta batch costs one aggregate over the DELTA, and
  * the merge costs one hash aggregate over (state ∪ delta partials) —
  * bounded by the GROUP cardinality, never by history size. Decimal
  * sums keep the state bit-exact through any number of maintenance
  * steps, so the maintained view hash-matches a from-scratch rebuild
  * (`maint_agg_incremental`'s oracle is exactly that rebuild).
  */
object IncrementalAgg {

  /** Partial-aggregate state of one batch: `(keys*, cnt, cntv, s)` with
    * `s` the exact scale-6 decimal sum of `valueCol` and `cntv` the
    * NON-NULL count of `valueCol` — tracked separately from the row
    * count so the view's mean is SQL AVG (sum over non-null ÷ count of
    * non-null), not sum ÷ row-count, on nullable measure columns (the
    * r12 ADVICE divergence). `sign = -1` yields the retraction partials
    * of a delete batch; both counts negate with it, so cntv is as
    * group-additive as cnt.
    */
  def partials(df: DataFrame, keys: Seq[String], valueCol: String,
      sign: Int = 1): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        (count(lit(1)) * sign).as("cnt"),
        (count(col(valueCol)) * sign).as("cntv"),
        (sum(DetAgg.dec(col(valueCol))) * sign).as("s"))

  /** Fold any number of states / insert partials / retraction partials
    * into one state: one hash aggregate over the union. Associative and
    * commutative in its inputs — which REQUIRES keeping negative-count
    * intermediate rows (a delete batch folded ahead of its inserts
    * leaves a negative stub that the later insert fold cancels;
    * dropping it would silently lose the retraction — the r12 review's
    * finding, now spec-pinned). Only the exact-identity (0, 0) rows
    * drop (adding zeros is the group identity); the positive-count
    * gate belongs to [[view]], the read side.
    */
  def merge(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "merge of no states")
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(sum("cnt").as("cnt"), sum("cntv").as("cntv"), sum("s").as("s"))
      .filter(col("cnt") =!= 0 || col("cntv") =!= 0 || col("s") =!= lit(0))
  }

  /** The readable view of a state: count, sum and mean as doubles
    * (exact decimal → correctly-rounded double, one IEEE division).
    * `mean` is SQL AVG — sum ÷ NON-NULL value count, NULL when the
    * group has no non-null values at all (an all-NULL-measure group
    * still shows its row count). Negative-count stubs (retractions
    * still awaiting their inserts) are in-flight state, not data — the
    * view shows cnt > 0 only.
    */
  def view(state: DataFrame, keys: Seq[String]): DataFrame =
    state.filter(col("cnt") > 0).select(
      keys.map(col) ++ Seq(
        col("cnt").cast("long").as("n"),
        col("s").cast("double").as("total"),
        when(col("cntv") > 0, col("s").cast("double") / col("cntv"))
          .as("mean")): _*)

  // ---- COUNT DISTINCT maintenance --------------------------------------
  //
  // The third aggregate class: COUNT/SUM/AVG fold through (count, sum)
  // partials above, MIN/MAX through MinMaxAgg's bounded heaps, and exact
  // COUNT(DISTINCT) through a PER-VALUE count state — a value stays
  // distinct while its instance count is positive, so deleting one copy
  // of a twice-seen value must NOT drop it (the bug a naive
  // set-difference maintenance ships). The state is bounded by the
  // group×distinct-value cardinality — inherent to EXACT distinct
  // counting (callers who can tolerate error should maintain an HLL
  // sketch instead, which is merge-only and cannot retract). Same
  // commutative-group discipline as partials/merge: negative stubs
  // (deletes folded before their inserts) survive until cancelled.

  /** Per-(group, value) instance counts of one batch; `sign = -1` for a
    * delete batch. NULL-valued rows keep their own (group, NULL)
    * counter: SQL COUNT(DISTINCT) ignores them in the COUNT, but a
    * group whose surviving rows are all NULL still EXISTS in the
    * rebuild (with n_distinct = 0) — dropping NULLs here made the view
    * lose such groups entirely (r13 review).
    */
  def distinctPartials(df: DataFrame, keys: Seq[String], valueCol: String,
      sign: Int = 1): DataFrame =
    df.groupBy(keys.map(col) :+ col(valueCol).as("__v"): _*)
      .agg((count(lit(1)) * sign).as("vcnt"))

  /** Fold distinct-states: one hash aggregate over the union, exact-zero
    * rows leave. Associative + commutative in its inputs.
    */
  def distinctMerge(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "distinctMerge of no states")
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col) :+ col("__v"): _*)
      .agg(sum("vcnt").as("vcnt"))
      .filter(col("vcnt") =!= 0)
  }

  /** `(keys*, n_distinct)` — NON-NULL values with a positive surviving
    * count; a group alive only through NULL-valued rows shows
    * n_distinct = 0, matching the from-scratch COUNT(DISTINCT) rebuild.
    * Negative stubs are in-flight retractions, not data.
    */
  def distinctView(state: DataFrame, keys: Seq[String]): DataFrame =
    state.filter(col("vcnt") > 0)
      .groupBy(keys.map(col): _*)
      .agg(count(col("__v")).as("n_distinct"))
}
