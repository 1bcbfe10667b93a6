package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.DetAgg

/** One-pass column profiling — the "what is actually in this 100 TB
  * table" operator every pipeline debugging session starts with. All
  * statistics for all columns ride ONE aggregation (no per-column jobs,
  * unlike naive describe loops); the wide result is unpivoted to one row
  * per column.
  *
  * Deterministic: counts are exact, means go through [[DetAgg]] decimal
  * sums — the output is oracle-comparable bit-for-bit.
  */
object Profile {

  /** Profile the given NUMERIC columns: (column, n, n_null, n_distinct,
    * min, max, mean). Exact distinct counts — swap in
    * `approx_count_distinct` at scales where exact is too heavy.
    */
  def describeNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"),
        round(DetAgg.davg(col(c)), 6).as(s"__mean_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"__n_$c").as("n"),
        col(s"__nn_$c").as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min"),
        col(s"__max_$c").as("max"),
        col(s"__mean_$c").as("mean"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select("p.*")
  }
}
