package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.Registry

/** Print the post-AQE executed plan of one registry query — the fast way
  * to answer "did AQE actually broadcast / reuse what I think it did" at
  * a given scale factor:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.QueryExplain q3_shipping_priority"
  */
object QueryExplain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: QueryExplain <query>"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = Registry.all.find(_.name == name)
      .getOrElse(sys.error(s"unknown query $name"))
    val df = q.run(spark, sfDir)
    df.queryExecution.toRdd.count() // run it so AQE finalizes the plan
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
