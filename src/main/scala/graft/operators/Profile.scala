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
  def describeNumeric(df: DataFrame, cols: Seq[String]): DataFrame =
    // r15: one value-counts aggregate per column instead of one wide
    // aggregate with k count_distincts — the multi-distinct form planned
    // an Expand that replicated every row (k+1)× into mixed distinct
    // buffers; every statistic here is a pure function of (value,
    // multiplicity), so per-column groupBys collapse map-side to the
    // distinct values and the finals run over value-counts relations
    // (davgW is spec-pinned ≡ davg over the exploded rows; n_distinct =
    // non-null group count; n needs the coalesce because SUM over an
    // empty relation is NULL where COUNT(*) was 0).
    cols.map { c =>
      df.groupBy(col(c).as("__v")).agg(count(lit(1)).as("__w"))
        .agg(
          coalesce(sum("__w"), lit(0L)).as("n"),
          sum(when(col("__v").isNull, col("__w")).otherwise(0L)).as("n_null"),
          count(when(col("__v").isNotNull, lit(1))).as("n_distinct"),
          min(col("__v")).cast("double").as("min"),
          max(col("__v")).cast("double").as("max"),
          round(DetAgg.davgW(col("__v"), col("__w")), 6).as("mean"))
        .select(
          lit(c).as("column"), col("n"), col("n_null"), col("n_distinct"),
          col("min"), col("max"), col("mean"))
    }.reduce(_ unionByName _)
}
