package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [comma-separated query-name filter — dev only,
    // the driver always passes two args and gets every query]
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.tune(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // operators may persist intermediates (Δt table, shingle sets) —
      // don't let them accumulate across ~290 queries. clearCache()
      // only drops SQL-cached relations; the fixed-point kernels' FINAL
      // localCheckpoint blocks (PageRank/HITS/LabelProp/KCore/Markov —
      // pinned by design, released nowhere else once the result is
      // consumed) need the RDD-level sweep. Safe between queries: every
      // cross-query memo is parquet-backed (PipelineStage) or
      // driver-heap (TrainCache), never a persisted RDD.
      // SINGLE-THREADED INVARIANT: this sweep unpersists EVERY RDD in
      // the context, which would release unrecomputable localCheckpoint
      // blocks out from under a CONCURRENT query sharing the session
      // (the per-scope release CheckpointScope exists precisely to
      // avoid). It is correct here only because this loop is the sole
      // user of the context and runs queries strictly sequentially —
      // do not lift it into library code or a parallel runner.
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), oracleJson)
    System.err.println(ledgerLine)
    spark.stop()
  }

  /** Close-out ledger EMITTED BY CODE from the registry itself (the r9
    * lesson: the hand-counted PLANS.md ledger said 279 while the
    * registry said 288 and nobody noticed — counts in prose must come
    * from `Registry.all`, never from a human).
    */
  def ledgerLine: String = {
    val qs = SparkEntry.queries
    val os = SparkEntry.oracleSql
    val noOracle = (qs.keySet -- os.keySet).toSeq.sorted
    s"[ledger] queries=${qs.size} oracles=${os.size} " +
      s"no_oracle(${noOracle.size})=${noOracle.mkString(",")}"
  }

  /** The full oracle registry as the JSON object the driver consumes —
    * shared with OracleTypeParitySpec (the type-parity gate) so the gate
    * checks EXACTLY the bytes the driver will replay.
    *
    * JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness.
    */
  def oracleJson: String = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
  }
}
