package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: run ONE registry query with a full stack trace on
  * failure (Verify swallows exceptions into a one-line ledger note —
  * right for the driver, useless for debugging a new query).
  *
  * Run: sbt "runMain graft.tools.RunOne <name> [sfDir]"
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = graft.GraftSession.tune(SparkSession.builder())
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.show(30, truncate = false)
    println(s"[runone] $name rows=${df.count()}")
    spark.stop()
  }
}
