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
    * driver-local default cannot be read back by other executors — falling
    * back to `java.io.tmpdir` ONLY under a local master. On any non-local
    * master with the conf unset we fail fast instead: executors writing
    * parquet to their own local disks and the read-back scan silently
    * missing rows is data loss, not a degraded mode.
    */
  def scratch(df: DataFrame, tag: String): DataFrame = {
    val spark = df.sparkSession
    val base = scratchBase(
      spark.sparkContext.master,
      spark.conf.getOption("spark.graft.scratch.dir"))
    val path = new Path(base, s"graft-scratch-$tag-${java.util.UUID.randomUUID()}")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    df.write.parquet(path.toString)
    fs.deleteOnExit(path)
    // the writer's schema IS the file schema — passing it skips the
    // footer-reading schema-inference job a bare read would run (eager
    // per-call driver latency, noticeable for iterative callers)
    spark.read.schema(df.schema).parquet(path.toString)
  }

  /** [[scratch]] with a HIVE-PARTITIONED layout: one directory per value
    * of `partitionCol` — the reference's directory-per-measurement
    * catalog convention (SURVEY §1.1) as a materialized stage. The
    * read-back scan's partition column IS the catalog key, so
    * name-derived predicates prune to the matching directories exactly
    * the way the reference's directory walk selects measurement folders.
    * Read WITHOUT the writer-schema shortcut: the partition column must
    * come from directory-name inference, not the file footers.
    */
  def scratchPartitioned(df: DataFrame, tag: String, partitionCol: String): DataFrame = {
    val spark = df.sparkSession
    val base = scratchBase(
      spark.sparkContext.master,
      spark.conf.getOption("spark.graft.scratch.dir"))
    val path = new Path(base, s"graft-scratch-$tag-${java.util.UUID.randomUUID()}")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    df.write.partitionBy(partitionCol).parquet(path.toString)
    fs.deleteOnExit(path)
    spark.read.parquet(path.toString)
  }

  /** Resolve the scratch root for a given master URL. Factored out of
    * [[scratch]] so the non-local guard is unit-testable without standing
    * up a cluster: a configured dir always wins; otherwise `java.io.tmpdir`
    * is only acceptable when the master is `local`/`local[...]`, where
    * driver and executors share one filesystem.
    */
  private[graft] def scratchBase(
      master: String, configured: Option[String]): String =
    configured.getOrElse {
      require(
        master.startsWith("local"),
        s"spark.graft.scratch.dir must be set under non-local master " +
          s"'$master': a java.io.tmpdir scratch parquet written by " +
          "executors on their own disks cannot be read back as one dataset")
      sys.props("java.io.tmpdir")
    }
}
