package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: does `repartition(n, col) + sortWithinPartitions + eager
  * localCheckpoint` keep HashPartitioning/ordering through LogicalRDD,
  * so a per-round join on that key shuffles and sorts only the other
  * side? Prints exchange/sort counts with auto-broadcast disabled
  * (mirrors the fixed-point kernels where the mass relation is not
  * broadcastable at scale).
  */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.tune(SparkSession.builder())
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.range(1000000L)
      .select((col("id") % 5000L).as("src"), (col("id") % 7000L).as("dst"))
      .repartition(8, col("src"))
      .sortWithinPartitions("src")
      .localCheckpoint(true)
    println("e partitioning preserved: " +
      e.queryExecution.optimizedPlan.toString.linesIterator.take(3).mkString(" | "))
    val r = spark.range(5000L).select(col("id").as("node"), (col("id") * 2).as("rank"))
      .repartition(8, col("node"))
      .localCheckpoint(true)
    val j = e.join(r, e("src") === r("node"))
      .groupBy("dst").agg(sum("rank").as("s"))
    j.queryExecution.toRdd.count()
    val plan = j.queryExecution.executedPlan.toString
    def c(p: String) = p.r.findAllIn(plan).length
    println(s"PROBE exchanges=${c("Exchange hash")} smj=${c("SortMergeJoin")}" +
      s" sorts=${c("Sort \\[")} shj=${c("ShuffledHashJoin")}")
    println(plan)
    spark.stop()
  }
}
