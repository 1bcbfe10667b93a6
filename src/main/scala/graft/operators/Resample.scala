package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.DetAgg

/** Time-series resampling with linear gap-fill — the distributed
  * `resample().interpolate()`: fixed-width buckets of per-key mean value,
  * the bucket grid densified to each key's own [first, last] span, holes
  * filled by linear interpolation between the nearest observed neighbors.
  *
  * Scale shape: the aggregate is a hash groupBy (map-side partials), the
  * grid is `sequence()` column arithmetic (no driver loop, no cross
  * join), and all four neighbor lookups are per-KEY windows — a key's
  * activity span bounds its partition, so no corpus-scale sort exists
  * anywhere. Bucket means ride [[DetAgg.davg]]; the fill expression is a
  * fixed IEEE formula over exact longs and those means, so results are
  * bit-portable across engines and partitionings. Endpoint buckets are
  * observed by construction (the grid starts/ends at observed buckets),
  * so the fill never divides by null.
  */
object Resample {

  /** Output: (key, bucket, value, observed) — one row per bucket in each
    * key's observed span; `observed = false` rows carry the interpolated
    * value.
    */
  def linearInterpolate(
      df: DataFrame,
      keyCol: String,
      ts: Column,
      value: Column,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds $bucketSeconds must be positive")
    val obs = df
      .groupBy(
        col(keyCol),
        floor(unix_timestamp(ts) / bucketSeconds).cast(LongType).as("bucket"))
      .agg(DetAgg.davg(value).as("v"))
    val grid = obs.groupBy(keyCol)
      .agg(min("bucket").as("__lo"), max("bucket").as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"))).as("bucket"))
    val full = grid.join(obs, Seq(keyCol, "bucket"), "left")
    val wp = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wf = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(0, Window.unboundedFollowing)
    full
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wp))
      .withColumn("pb",
        last(when(col("v").isNotNull, col("bucket")), ignoreNulls = true).over(wp))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wf))
      .withColumn("nb",
        first(when(col("v").isNotNull, col("bucket")), ignoreNulls = true).over(wf))
      .select(
        col(keyCol), col("bucket"),
        coalesce(
          col("v"),
          col("pv") + (col("nv") - col("pv")) * (col("bucket") - col("pb"))
            / (col("nb") - col("pb"))).as("value"),
        col("v").isNotNull.as("observed"))
  }
}
