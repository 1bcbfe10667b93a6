package graft.tools

import org.apache.spark.sql.SparkSession

/** One-query profiler: time a registry query by name, twice (second run
  * shows exchange-reuse / AQE warm behavior), and report plan-shape
  * counters (exchanges, reused exchanges, window passes, codegen spans).
  *
  * Run: sbt "runMain graft.tools.QueryProbe <query> [sfDir]"
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir =
      if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.SparkEntry.queries(name)
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime
      val df = q(spark, sfDir) // eager operators do their work here
      // execute THIS df's plan (count() would build a separate execution
      // and leave df's adaptive plan in its initial state)
      val n = df.collect().length
      println(s"PROBE run$i rows=$n sec=${(System.nanoTime - t0) / 1e9}")
      if (i == 1) {
        val plan = df.queryExecution.executedPlan.toString
        def c(p: String) = p.r.findAllIn(plan).length
        println(s"PROBE plan exchanges=${c("Exchange hash")} reused=${c("Reused")}"
          + s" windows=${c("Window ")} codegen=${c("WholeStageCodegen")}"
          + s" sorts=${c("Sort ")} stages=${c("ShuffleQueryStage")}")
      }
    }
    spark.stop()
  }
}
