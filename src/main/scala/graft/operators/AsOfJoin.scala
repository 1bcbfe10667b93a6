package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the most recent right row whose
  * time is ≤ the left row's time, per partition key.
  *
  * Spark-first preference order (SparkEntry brief): this is tier (a) —
  * COMPOSED from built-ins, because the semantics decompose exactly into
  * union + ordered window carry-forward:
  *
  *   union(left tagged 0, right tagged 1)
  *     → window per key ordered by (time, side DESC)
  *     → last(right value, ignoreNulls) over rows unbounded-preceding
  *     → keep left rows
  *
  * ONE shuffle on the partition key, no range-join row explosion, no
  * custom SparkPlan needed — at any scale this is the plan a custom
  * operator would aspire to. (Side DESC makes a right row at the exact
  * same timestamp visible to the left row — `≤` semantics, matching
  * DuckDB's ASOF JOIN oracle.)
  */
object AsOfJoin {

  /** @param left        probe side
    * @param right       reference side
    * @param keys        equi-partition columns present on both sides
    * @param leftTime    ordering column on `left`
    * @param rightTime   ordering column on `right`
    * @param valueCols   right columns carried to the output as `asof_<c>`
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String]): DataFrame = {
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(0))
    val r = right.select(
      (keys.map(col) :+ col(rightTime).as("__t") :+ lit(1).as("__side")) ++
        valueCols.map(c => col(c).as(s"__v_$c")): _*)
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = valueCols.map(c =>
      last(col(s"__v_$c"), ignoreNulls = true).over(w).as(s"asof_$c"))
    u.select((u.columns.map(col) ++ carried): _*)
      .filter(col("__side") === 0)
      .drop(("__t" +: "__side" +: valueCols.map(c => s"__v_$c")): _*)
  }

  /** Nearest-neighbor as-of with tolerance — pandas
    * `merge_asof(direction='nearest', tolerance=...)`: each left row
    * takes the right value whose NUMERIC time is closest in either
    * direction, ties resolved backward (pandas' rule), and nothing
    * beyond `tolerance` matches (null instead). Same single-shuffle
    * union+window composition as [[asOf]], run once per direction over
    * the one exchange (two sorts, zero extra shuffles): a backward
    * carry-forward and a forward carry-backward, then a row-local
    * CASE picks the nearer candidate.
    *
    * `rightValue` must be non-null on the reference side (the carried
    * time and value are tracked by separate IGNORE NULLS windows, which
    * can only desynchronize if a null value row exists); callers filter
    * nulls first.
    */
  def asOfNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightValue: String,
      tolerance: Long): DataFrame = {
    require(tolerance >= 0, "tolerance must be non-negative")
    val l = left
      .withColumn("__t", col(leftTime).cast("long"))
      .withColumn("__side", lit(0))
    val r = right.select(
      (keys.map(col) :+ col(rightTime).cast("long").as("__t") :+
        lit(1).as("__side") :+ col(rightValue).as("__v")): _*)
    val u = l.unionByName(r, allowMissingColumns = true)
    val wb = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wf = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(0, Window.unboundedFollowing)
    val rt = when(col("__side") === 1, col("__t"))
    val rv = when(col("__side") === 1, col("__v"))
    val m = u
      .withColumn("__pt", last(rt, ignoreNulls = true).over(wb))
      .withColumn("__pv", last(rv, ignoreNulls = true).over(wb))
      .withColumn("__nt", first(rt, ignoreNulls = true).over(wf))
      .withColumn("__nv", first(rv, ignoreNulls = true).over(wf))
      .filter(col("__side") === 0)
    val takeBack = col("__pt").isNotNull &&
      (col("__nt").isNull || col("__t") - col("__pt") <= col("__nt") - col("__t"))
    val nearest = when(takeBack,
        when(col("__t") - col("__pt") <= tolerance, col("__pv")))
      .otherwise(when(col("__nt") - col("__t") <= tolerance, col("__nv")))
    m.withColumn(s"asof_$rightValue", nearest)
      .drop("__t", "__side", "__v", "__pt", "__pv", "__nt", "__nv")
  }
}
