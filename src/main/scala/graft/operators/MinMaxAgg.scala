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
  * Soundness of heap deletion (why value-matched removal keeps the
  * extremes exact): `lo` holds the k smallest instances, so any group
  * value strictly below the heap horizon (`lo`'s last element) is IN
  * the heap. Removing d instances of value v from the heap can only
  * under-count survivors of v when the heap was truncated inside v's
  * tie-run — but then every heap slot ≤ v IS v, so zeroing v empties
  * the heap entirely and the underflow path catches it. A non-empty
  * post-delete heap therefore still contains the true minimum.
  * (Mirrored for `hi`.)
  *
  * UNDERFLOW: a heap emptied by deletes while the group still has rows
  * (cnt > 0) has lost its horizon — the true extreme may lie beyond
  * what the state ever tracked. [[underflowed]] surfaces those groups
  * and [[repair]] rebuilds THEM (and only them — a semi-join-pruned
  * rescan) from the current base relation; [[view]] raises loudly on
  * an unrepaired underflow instead of returning a wrong extreme.
  *
  * At 100 TB: partials cost one delta-bounded window sort per
  * direction (the exchange is shared); every later step is
  * group-bounded (states hold ONE row per group, heaps ≤ k values);
  * repair rescans base only for the underflowed group set. Deletes
  * must be real rows of the maintained multiset (the IncrementalAgg
  * contract), and the value column must be DOUBLE (the empty-heap
  * literal is typed array&lt;double&gt;).
  */
object MinMaxAgg {

  val DefaultK = 8

  /** Heap-state of one batch: `(keys*, cnt, lo: array ascending ≤ k,
    * hi: array descending ≤ k)`. Two window ranks share one exchange;
    * collect_list sees ≤ k rows per group by the rank filter.
    */
  def partials(df: DataFrame, keys: Seq[String], valueCol: String,
      k: Int = DefaultK): DataFrame = {
    val wa = Window.partitionBy(keys.map(col): _*).orderBy(col("__v").asc)
    val wd = Window.partitionBy(keys.map(col): _*).orderBy(col("__v").desc)
    // NULL measures are excluded from the state entirely (SQL MIN/MAX
    // ignore them): cnt counts the NON-NULL multiset, so an
    // all-NULL-measure group simply has no state row — without this, a
    // null-heavy group could present an empty heap with cnt > 0, an
    // underflow no repair can ever satisfy (r13 self-review). Deleting
    // a NULL-measure row is correspondingly a no-op.
    df.select(keys.map(col) :+ col(valueCol).as("__v"): _*)
      .filter(col("__v").isNotNull)
      .withColumn("__ra", row_number().over(wa))
      .withColumn("__rd", row_number().over(wd))
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("cnt"),
        sort_array(collect_list(when(col("__ra") <= k, col("__v")))).as("lo"),
        sort_array(collect_list(when(col("__rd") <= k, col("__v"))), asc = false)
          .as("hi"))
  }

  /** Fold states / insert partials into one state: heap union re-sorted
    * and re-truncated at k (any value outside a batch's own top-k is
    * dominated by k closer values from that batch, so truncation loses
    * nothing), counts summed. Group-bounded: flatten sees ≤ #states·k
    * values per group.
    */
  def mergeInserts(states: Seq[DataFrame], keys: Seq[String],
      k: Int = DefaultK): DataFrame = {
    require(states.nonEmpty, "mergeInserts of no states")
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(
        sum("cnt").as("cnt"),
        slice(sort_array(flatten(collect_list(col("lo")))), 1, k).as("lo"),
        slice(sort_array(flatten(collect_list(col("hi"))), asc = false), 1, k)
          .as("hi"))
  }

  /** Retract a delete batch: instance-counted value-matched removal
    * from both heaps, cnt decremented. The state explodes to ≤ 2k rows
    * per group (never history-sized); `greatest(m − d, 0)` keeps a
    * delete run longer than the heap's tie coverage from going
    * negative — that group simply empties and takes the underflow
    * path.
    */
  def applyDeletes(state: DataFrame, deletes: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame = {
    val kc = keys.map(col)
    // NULL-measure deletes are no-ops (the state never counted them)
    val del = deletes.filter(col(valueCol).isNotNull)
    val delByValue = del.groupBy(kc :+ col(valueCol).as("__v"): _*)
      .agg(count(lit(1)).as("__d"))
    val delTotal = del.groupBy(kc: _*).agg(count(lit(1)).as("__dtot"))
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
    state.select(kc :+ col("cnt"): _*)
      .join(delTotal, keys, "left")
      .withColumn("cnt", col("cnt") - coalesce(col("__dtot"), lit(0L)))
      .drop("__dtot")
      .join(strip("lo", asc = true), keys, "left")
      .join(strip("hi", asc = false), keys, "left")
      .withColumn("lo", coalesce(col("lo"), expr("CAST(ARRAY() AS ARRAY<DOUBLE>)")))
      .withColumn("hi", coalesce(col("hi"), expr("CAST(ARRAY() AS ARRAY<DOUBLE>)")))
      .filter(col("cnt") > 0)
  }

  private def underflowCond =
    (size(col("lo")) === 0 || size(col("hi")) === 0) && col("cnt") > 0

  /** Groups whose heap was exhausted by deletes — their extremes are no
    * longer derivable from the state and must be rebuilt.
    */
  def underflowed(state: DataFrame, keys: Seq[String]): DataFrame =
    state.filter(underflowCond).select(keys.map(col): _*)

  /** Rebuild ONLY the underflowed groups from the current base relation
    * (the surviving multiset): a semi join prunes the rescan to those
    * groups, everything else passes through untouched.
    */
  def repair(state: DataFrame, base: DataFrame, keys: Seq[String],
      valueCol: String, k: Int = DefaultK): DataFrame = {
    val bad = underflowed(state, keys)
    // common case: nothing underflowed — return the state as-is and
    // never touch base. The probe executes the (group-bounded) state
    // chain once, which is far cheaper than dragging a base scan +
    // window sort into every maintenance step's plan just to feed an
    // empty semi join.
    if (bad.isEmpty) state
    else
      state.filter(!underflowCond)
        .unionByName(partials(base.join(broadcast(bad), keys, "leftsemi"),
          keys, valueCol, k))
  }

  /** `(keys*, n, min, max)` — raises in-plan on an unrepaired
    * underflow (a silent wrong extreme is worse than a loud rebuild
    * demand).
    */
  def view(state: DataFrame, keys: Seq[String]): DataFrame =
    state
      .filter(assert_true(
        !underflowCond,
        lit("MinMaxAgg: heap underflow — deletes exhausted a group's " +
          "top-k; call repair(state, base, ...) before view")).isNull)
      .select(
        keys.map(col) ++ Seq(
          col("cnt").cast("long").as("n"),
          element_at(col("lo"), 1).as("min"),
          element_at(col("hi"), 1).as("max")): _*)
}
