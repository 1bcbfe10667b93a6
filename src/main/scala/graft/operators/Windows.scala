package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators (SURVEY §2.6). */
object Windows {

  /** Keep the first floor(n/2) rows of each group in `orderBy` order — the
    * reference's "voltage-ramp-up half" trim (reference
    * `scripts/compare_measurements.py:33-35`). One window pass, no join.
    * `orderBy` must be a total order within the group for determinism.
    */
  def firstHalf(df: DataFrame, groupCols: Seq[String], orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(orderBy: _*)
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(wAll))
      .filter(col("__rn") <= floor(col("__cnt") / lit(2)))
      .drop("__rn", "__cnt")
  }

  /** Deterministic arg-min: the row minimizing `orderBy.head`, ties broken
    * by the remaining orderBy columns (reference `idxmin`,
    * `scripts/time_resolution_beta_scan.py:64-67`). For a handful of groups
    * `min_by(struct)` is equivalent; the window form stays deterministic
    * under ties, which oracle hashing requires.
    */
  def argMinPerGroup(df: DataFrame, groupCols: Seq[String], orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}
