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

  /** Materialize an INTERMEDIATE frame to a self-cleaning scratch parquet
    * and return the scan over it — the distributed alternative to
    * `collect()`-and-`createDataFrame` for results that are small relative
    * to the corpus but still unbounded (dup-cluster labels, trained
    * codebooks at extreme k, …). The write runs on the executors, the
    * read-back is a fresh parquet scan, and the driver never holds the
    * rows; the path is registered for recursive deletion at JVM exit.
    *
    * Scratch root: `spark.graft.scratch.dir` if set — on a real cluster
    * point it at shared storage (HDFS/object-store scratch), since a
    * driver-local default cannot be read back by other executors —
    * falling back to `java.io.tmpdir`, which is correct for local[*].
    */
  def scratch(df: DataFrame, tag: String): DataFrame = {
    val spark = df.sparkSession
    val base = spark.conf.getOption("spark.graft.scratch.dir")
      .getOrElse(sys.props("java.io.tmpdir"))
    val path = new Path(base, s"graft-scratch-$tag-${java.util.UUID.randomUUID()}")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    df.write.parquet(path.toString)
    fs.deleteOnExit(path)
    spark.read.parquet(path.toString)
  }
}
