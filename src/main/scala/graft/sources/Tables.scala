package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Table loaders for the engine.
  *
  * The reference keeps a filesystem-as-catalog of Feather/CSV/SQLite files
  * (reference `scripts/measurements.py:55-87`); here the canonical columnar
  * format is Parquet (SURVEY §2.1 S1), with CSV (S2) and JDBC (S3) readers
  * kept for ingestion parity. At cluster scale every reader benefits from
  * Catalyst filter/column pushdown because loading stays declarative — no
  * eager materialization.
  */
object Tables {

  /** Canonical parquet scan: `dir/name.parquet`. Column pruning and
    * predicate pushdown reach the scan automatically.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table: `ts` normalized to TimestampType whichever
    * generation of the test data is on disk — early generations store
    * raw nanosecond INT64 (illegal for Spark 4's schema inference, so it
    * is forced to long and integer-divided to µs), current ones an
    * annotated µs TIMESTAMP read verbatim. The probe-and-branch lives in
    * [[graft.streaming.EventsStream.readBatch]], shared with the
    * streaming sources so batch and stream can never disagree on units.
    */
  def loadEvents(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.EventsStream.readBatch(spark, s"$dir/events.parquet")

  /** CSV scan with an explicit schema (never infer on big data: schema
    * inference is a full extra pass over the files).
    */
  def loadCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** Header-only CSV scan for small driver-side metadata tables. */
  def loadSmallCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** JDBC scan (reference reads SQLite event stores,
    * `scripts/time_resolution_beta_scan.py:213`). `partitionColumn` bounds
    * let Spark parallelize the read instead of a single-threaded pull.
    */
  def loadJdbc(
      spark: SparkSession,
      url: String,
      table: String,
      partitionColumn: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val base = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    partitionColumn match {
      case Some((col, lo, hi, n)) =>
        base
          .option("partitionColumn", col)
          .option("lowerBound", lo.toString)
          .option("upperBound", hi.toString)
          .option("numPartitions", n.toString)
          .load()
      case None => base.load()
    }
  }
}
