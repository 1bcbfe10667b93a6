package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-dataset maintenance for long-lived corpora — the operational
  * half of a 100 TB pipeline that query operators don't cover:
  *
  *  - [[upsert]]: key-based incremental update (new snapshot of a crawl
  *    slice replaces rows with matching keys, everything else survives).
  *    Plain parquet has no MERGE, so this is the read → anti-join →
  *    union → rewrite cycle, made crash-safe by writing to a temp
  *    directory and swapping via rename (the same _SUCCESS-gated
  *    discipline as [[PipelineStage]]).
  *  - [[compact]]: small-file compaction. Streaming/append sinks leave
  *    file counts that scale with trigger count, not data size; scan
  *    planning cost is per-FILE, so periodic rewrite to
  *    `ceil(rows / rowsPerFile)` files keeps listing/planning bounded.
  */
object Maintenance {

  private def swapInto(spark: SparkSession, tmp: String, path: String): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = new Path(path)
    val bak = new Path(path + "_old")
    if (fs.exists(bak)) fs.delete(bak, true)
    if (fs.exists(dst)) fs.rename(dst, bak)
    fs.rename(new Path(tmp), dst)
    fs.delete(bak, true)
  }

  /** Upsert `newData` into the parquet dataset at `path` on `keys`:
    * existing rows with a matching key are replaced, the rest are kept.
    * Missing dataset → plain write.
    */
  def upsert(spark: SparkSession, path: String, newData: DataFrame, keys: Seq[String]): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(path))) {
      newData.write.parquet(path)
      return
    }
    val existing = spark.read.parquet(path)
    val merged = existing
      .join(newData.select(keys.map(org.apache.spark.sql.functions.col): _*), keys, "left_anti")
      .unionByName(newData)
    val tmp = path + "_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    swapInto(spark, tmp, path)
  }

  /** Rewrite the dataset into `ceil(rows / rowsPerFile)` files. Returns
    * (files before, files after).
    */
  def compact(spark: SparkSession, path: String, rowsPerFile: Long): (Int, Int) = {
    val df = spark.read.parquet(path)
    val before = df.inputFiles.length
    val n = df.count()
    val files = math.max(1, math.ceil(n.toDouble / rowsPerFile).toInt)
    val tmp = path + "_tmp"
    df.repartition(files).write.mode("overwrite").parquet(tmp)
    swapInto(spark, tmp, path)
    val after = spark.read.parquet(path).inputFiles.length
    (before, after)
  }
}
