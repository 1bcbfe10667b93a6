package graft.pipeline

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialized-stage memoization — the Spark-native replacement for the
  * reference's `.script_successfully_applied` flag files (SURVEY §1.1,
  * §4): a stage's output directory with a `_SUCCESS` marker means "done";
  * `force` recomputes. Parquet writes emit `_SUCCESS` atomically at job
  * commit, so a killed job never looks done — the same guarantee the
  * reference builds by hand, for free from the committer.
  */
object PipelineStage {

  def isMaterialized(spark: SparkSession, outPath: String): Boolean = {
    val p = new Path(outPath, "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Run `compute` and materialize to `outPath` unless already done (or
    * `force`). Returns the materialized DataFrame (always read back from
    * parquet, so downstream stages see one consistent snapshot).
    */
  def materialize(
      spark: SparkSession,
      outPath: String,
      force: Boolean = false)(compute: => DataFrame): DataFrame = {
    if (force || !isMaterialized(spark, outPath)) {
      compute.write.mode("overwrite").parquet(outPath)
    }
    spark.read.parquet(outPath)
  }
}
