package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Long↔wide reshapes — load-bearing in the reference (SURVEY §2.3):
  * `pivot(index, columns, values)` (reference `scripts/utils.py:14-18`) and
  * `.stack()` back to tidy long form (`scripts/utils.py:19`).
  */
object Reshape {

  /** Long→wide pivot with EXPLICIT pivot values. Passing the values avoids
    * Spark's extra distinct-collect job, and is the only sane form at scale
    * (data-dependent pivot columns are a driver OOM waiting to happen).
    */
  def pivotWide(
      df: DataFrame,
      index: Seq[String],
      pivotCol: String,
      values: Seq[String],
      agg: Column): DataFrame =
    df.groupBy(index.map(col): _*).pivot(pivotCol, values).agg(agg)

  /** Wide→long unpivot (pandas `.stack()`). Uses Spark's native `unpivot`
    * (Spark 3.4+), which plans as a generate — no shuffle.
    */
  def unpivotLong(
      df: DataFrame,
      ids: Seq[String],
      valueCols: Seq[String],
      variableName: String = "variable",
      valueName: String = "value"): DataFrame =
    df.unpivot(ids.map(col).toArray, valueCols.map(col).toArray, variableName, valueName)
}
