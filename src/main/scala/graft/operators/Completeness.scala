package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Group-completeness filter — the reference's
  * `remove_nans_grouping_by_n_trigger` (reference `scripts/utils.py:9-21`):
  * drop every group where ANY member row has ANY null in the watched
  * columns. The reference pivots wide, drops NaN rows, and stacks back;
  * here it is a single aggregate + broadcast-able semi-join, with no pivot
  * and no dependence on the number of distinct sub-keys.
  */
object Completeness {

  def filterComplete(df: DataFrame, groupCols: Seq[String], watched: Seq[String]): DataFrame = {
    // count(col) counts only non-nulls: group is complete iff every watched
    // column counts as many values as there are rows.
    val complete = df
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"), watched.map(c => count(col(c)).as(s"__n_$c")): _*)
      .filter(watched.map(c => col(s"__n_$c") === col("__n")).reduce(_ && _))
      .select(groupCols.map(col): _*)
    // left_semi keeps columns of df only; small complete-key set broadcasts
    df.join(complete, groupCols, "left_semi")
  }
}
