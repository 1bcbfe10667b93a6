package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental MIN/MAX maintenance under appends AND deletes — the
  * aggregate class [[IncrementalAgg]] refuses by contract (deleting the
  * current extreme needs the runner-up, which a plain (count, sum)
  * state no longer has). The standard fix, made relational: the state
  * carries a BOUNDED top-k heap per group and per direction — `lo`, the
  * k smallest values ascending, and `hi`, the k largest descending —
  * so up to k−1 deleted extremes per direction are absorbed without
  * ever rescanning history.
  *
  * THE COVERAGE INVARIANT (what makes a heap answer provably right):
  * each state carries, per direction, the CAP up to which its heap is
  * COMPLETE — every surviving instance strictly below `lcap` (above
  * `hcap`) is in the heap. A fresh batch's cap is its k-th ranked value
  * (+∞/−∞ when the whole group fits); deletion PRESERVES the cap
  * (instances below it are all tracked, so value-matched removal keeps
  * completeness); merging takes the MINIMUM of the inputs' caps,
  * further clamped to the merged heap's k-th element when truncation
  * occurred. The viewed extreme is then trustworthy exactly when the
  * heap head sits INSIDE its cap — any smaller survivor would be below
  * the cap and therefore in the heap. A head outside its cap (or an
  * empty heap with survivors) means deletes consumed the covered
  * window: the group is UNDERFLOWED, [[view]] raises loudly, and
  * [[repair]] rebuilds it (and only it) from the base relation. This is
  * what keeps arbitrary interleavings of mergeInserts/applyDeletes
  * sound — the r13 review showed that WITHOUT the cap, an insert fold
  * after a delete could graft a far value onto a pruned heap and a
  * later delete would then surface it as a silently wrong extreme.
  *
  * Tie-run note: deletion can under-count the heap's copies of a value
  * only when the heap was truncated inside that value's tie-run — but
  * then every slot up to the cap IS that value, so exhausting it
  * empties the covered window and the underflow path catches it.
  *
  * At 100 TB: partials cost one delta-bounded window sort per
  * direction (the exchange is shared); every later step is
  * group-bounded (states hold ONE row per group, heaps ≤ k values);
  * repair rescans base only for the underflowed group set. Deletes
  * must be real rows of the maintained multiset (the IncrementalAgg
  * contract); NULL measures ride only in `cnt` (COUNT(*)) — the heaps
  * and `cntv` track the non-null multiset SQL MIN/MAX actually see, so
  * an all-NULL group is a live row with NULL extremes, never an
  * unrepairable underflow; the value column must be DOUBLE (the
  * empty-heap literal and the ±∞ caps are double-typed).
  */
object MinMaxAgg {

  val DefaultK = 8

  private val PInf = lit(Double.PositiveInfinity)
  private val NInf = lit(Double.NegativeInfinity)

  /** Heap-state of one batch:
    * `(keys*, cnt, cntv, lo ≤ k ascending, hi ≤ k descending, lcap,
    * hcap)`. `cnt` is COUNT(*) (all rows, NULL measures included);
    * `cntv` is COUNT(valueCol) — the heaps and caps cover only the
    * non-null multiset, which is what SQL MIN/MAX see (r13 advice: a
    * single pre-filtered count silently diverged from COUNT(*) on
    * nullable measures). Two window ranks (nulls ranked LAST so the
    * top-k window is purely non-null) share one exchange; collect_list
    * sees ≤ k rows per group by the rank filter. Caps are the k-th
    * ranked values — the completeness horizon — or ±∞ when the whole
    * non-null group fits.
    */
  def partials(df: DataFrame, keys: Seq[String], valueCol: String,
      k: Int = DefaultK): DataFrame = {
    val wa = Window.partitionBy(keys.map(col): _*).orderBy(col("__v").asc_nulls_last)
    val wd = Window.partitionBy(keys.map(col): _*).orderBy(col("__v").desc_nulls_last)
    df.select(keys.map(col) :+ col(valueCol).as("__v"): _*)
      .withColumn("__ra", row_number().over(wa))
      .withColumn("__rd", row_number().over(wd))
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("cnt"),
        count(col("__v")).as("cntv"),
        sort_array(collect_list(
          when(col("__ra") <= k && col("__v").isNotNull, col("__v")))).as("lo"),
        sort_array(collect_list(
          when(col("__rd") <= k && col("__v").isNotNull, col("__v"))), asc = false)
          .as("hi"))
      .withColumn("lcap",
        when(size(col("lo")) < k, PInf).otherwise(element_at(col("lo"), k)))
      .withColumn("hcap",
        when(size(col("hi")) < k, NInf).otherwise(element_at(col("hi"), k)))
  }

  /** Fold states / insert partials into one state: heap union re-sorted
    * and re-truncated at k, counts summed, caps tightened to the
    * minimum input cap and (when the merged heap is full) to its k-th
    * element — conservative when no truncation occurred, never wrong.
    * Group-bounded: flatten sees ≤ #states·k values per group. Folding
    * a post-delete state is SAFE: its (possibly pruned) heap rides in
    * under its original cap, and any later extreme the pruned window
    * can no longer certify is caught by the cap check at read time.
    */
  def mergeInserts(states: Seq[DataFrame], keys: Seq[String],
      k: Int = DefaultK): DataFrame = {
    require(states.nonEmpty, "mergeInserts of no states")
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(
        sum("cnt").as("cnt"),
        sum("cntv").as("cntv"),
        slice(sort_array(flatten(collect_list(col("lo")))), 1, k).as("lo"),
        slice(sort_array(flatten(collect_list(col("hi"))), asc = false), 1, k)
          .as("hi"),
        min(col("lcap")).as("__lc"),
        max(col("hcap")).as("__hc"))
      .withColumn("lcap",
        least(col("__lc"),
          when(size(col("lo")) === k, element_at(col("lo"), k)).otherwise(PInf)))
      .withColumn("hcap",
        greatest(col("__hc"),
          when(size(col("hi")) === k, element_at(col("hi"), k)).otherwise(NInf)))
      .drop("__lc", "__hc")
  }

  /** Retract a delete batch: instance-counted value-matched removal
    * from both heaps, cnt decremented, caps UNCHANGED (completeness
    * below/above the cap survives deletion — see the coverage
    * invariant). The state explodes to ≤ 2k rows per group (never
    * history-sized); `greatest(m − d, 0)` keeps a delete run longer
    * than the heap's tie coverage from going negative — that group
    * simply empties its covered window and takes the underflow path.
    * NULL-measure deletes decrement `cnt` only — they never entered
    * the heaps or `cntv` (SQL MIN/MAX ignore them).
    */
  def applyDeletes(state: DataFrame, deletes: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame = {
    val kc = keys.map(col)
    val del = deletes.filter(col(valueCol).isNotNull)
    val delByValue = del.groupBy(kc :+ col(valueCol).as("__v"): _*)
      .agg(count(lit(1)).as("__d"))
    val delTotal = deletes.groupBy(kc: _*).agg(
      count(lit(1)).as("__dtot"), count(col(valueCol)).as("__dtotv"))
    def strip(heap: String, asc: Boolean): DataFrame =
      state.select(kc :+ explode(col(heap)).as("__v"): _*)
        .groupBy(kc :+ col("__v"): _*)
        .agg(count(lit(1)).as("__m"))
        .join(delByValue, keys :+ "__v", "left")
        .withColumn("__keep", greatest(col("__m") - coalesce(col("__d"), lit(0L)), lit(0L)))
        .filter(col("__keep") > 0)
        .withColumn("__i", explode(sequence(lit(1L), col("__keep"))))
        .groupBy(kc: _*)
        .agg(sort_array(collect_list(col("__v")), asc = asc).as(heap))
    state.select(kc ++ Seq(col("cnt"), col("cntv"), col("lcap"), col("hcap")): _*)
      .join(delTotal, keys, "left")
      .withColumn("cnt", col("cnt") - coalesce(col("__dtot"), lit(0L)))
      .withColumn("cntv", col("cntv") - coalesce(col("__dtotv"), lit(0L)))
      .drop("__dtot", "__dtotv")
      .join(strip("lo", asc = true), keys, "left")
      .join(strip("hi", asc = false), keys, "left")
      .withColumn("lo", coalesce(col("lo"), expr("CAST(ARRAY() AS ARRAY<DOUBLE>)")))
      .withColumn("hi", coalesce(col("hi"), expr("CAST(ARRAY() AS ARRAY<DOUBLE>)")))
      .filter(col("cnt") > 0)
  }

  /** A group is underflowed when non-null survivors exist (`cntv > 0` —
    * an all-NULL-measure group has NULL extremes and nothing to
    * certify) but the heap can no longer certify the extreme: empty, or
    * its head sits OUTSIDE the completeness cap (a smaller/larger
    * survivor could hide between the cap and the head). Head access is
    * EXPLICITLY size-guarded (`when(size > 0, element_at)`), so the
    * expression is ANSI-safe under any predicate split/reorder the
    * optimizer applies — it never relies on boolean short-circuit order
    * to dodge an INVALID_ARRAY_INDEX (r13 advice); the empty-heap case
    * surfaces as a NULL comparison that `coalesce(…, true)` folds to
    * underflowed.
    */
  private def headOf(heap: String) =
    when(size(col(heap)) > 0, element_at(col(heap), 1))

  private def underflowCond =
    col("cntv") > 0 && (
      coalesce(headOf("lo") > col("lcap"), lit(true)) ||
      coalesce(headOf("hi") < col("hcap"), lit(true)))

  /** Groups whose covered window was exhausted by deletes — their
    * extremes are no longer derivable from the state and must be
    * rebuilt.
    */
  def underflowed(state: DataFrame, keys: Seq[String]): DataFrame =
    state.filter(underflowCond).select(keys.map(col): _*)

  /** Rebuild ONLY the underflowed groups from the current base relation
    * (the surviving multiset): a semi join prunes the rescan to those
    * groups, everything else passes through untouched. EAGER: the
    * (group-bounded) state is scratch-materialized once, so the
    * underflow probe and every downstream consumer read the small
    * parquet instead of re-executing the partials/delete chain — the
    * r13 review measured the lazy form paying the corpus-wide window
    * sorts twice.
    */
  def repair(state: DataFrame, base: DataFrame, keys: Seq[String],
      valueCol: String, k: Int = DefaultK): DataFrame = {
    val st = graft.pipeline.PipelineStage.scratch(state, "minmax-state")
    val bad = underflowed(st, keys)
    if (bad.isEmpty) st
    else
      st.filter(!underflowCond)
        .unionByName(partials(base.join(broadcast(bad), keys, "leftsemi"),
          keys, valueCol, k))
  }

  /** `(keys*, n, min, max)` — `n` is COUNT(*) (NULL measures included,
    * matching the rebuild oracle's COUNT(*)); min/max are NULL for an
    * all-NULL-measure group, exactly as SQL MIN/MAX would report.
    * Raises in-plan on an unrepaired underflow (a silent wrong extreme
    * is worse than a loud rebuild demand).
    */
  def view(state: DataFrame, keys: Seq[String]): DataFrame =
    state
      .filter(assert_true(
        !underflowCond,
        lit("MinMaxAgg: heap underflow — deletes exhausted a group's " +
          "covered window; call repair(state, base, ...) before view")).isNull)
      .select(
        keys.map(col) ++ Seq(
          col("cnt").cast("long").as("n"),
          headOf("lo").as("min"),
          headOf("hi").as("max")): _*)
}
