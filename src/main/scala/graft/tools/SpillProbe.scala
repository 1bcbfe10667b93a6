package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Out-of-core evidence (r14 verdict item 5): every scale number so far
  * was measured in a 128 GiB heap that never spills, so the 100 TB
  * claim's reliance on Tungsten's spill paths was untested. This probe
  * runs the heaviest sf1 registry rows under whatever heap the caller
  * constrains the JVM to (run via `SPARK_DRIVER_MEM=4g tools/run_main.sh
  * graft.tools.SpillProbe /tmp/graft_sf1`) and ledgers, per query,
  * completion + the executor spill counters from a TaskEnd listener —
  * `memoryBytesSpilled` / `diskBytesSpilled` summed over every task of
  * every job the query ran.
  *
  * Pass criteria read from the emitted JSON, not asserted here: each row
  * COMPLETES (rows > 0, no exception) under the constrained heap, and at
  * least the shuffle-heavy rows record nonzero spill — proving the plans
  * degrade to out-of-core execution instead of OOMing when the working
  * set exceeds memory, which is exactly what a 100 TB input does to a
  * fixed-size executor.
  *
  * Defaults to the five heaviest sf1 rows from the r14 drive; override
  * with a comma-separated arg list.
  */
object SpillProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1"))
    val names = args.lift(1).map(_.split(",").toSeq).getOrElse(Seq(
      "flagship_time_resolution_caruana",
      "dedup_substring_removed",
      "dedup_substring_spans",
      "pipeline_tr_sweep",
      "a10_bootstrap_exact"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.tune(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val memSpill = new LongAdder
    val diskSpill = new LongAdder
    val peakMem = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          memSpill.add(m.memoryBytesSpilled)
          diskSpill.add(m.diskBytesSpilled)
          peakMem.add(m.peakExecutionMemory)
        }
      }
    })

    val heapMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    println(s"""{"probe":"spill_env","heap_mb":$heapMb,"sf":"$sfDir","cpus":$cpus}""")

    for (name <- names) {
      val fn = graft.SparkEntry.queries.getOrElse(
        name, sys.error(s"unknown registry query $name"))
      memSpill.reset(); diskSpill.reset(); peakMem.reset()
      val t0 = System.nanoTime()
      val res =
        try Right(fn(spark, sfDir).queryExecution.toRdd.count())
        catch { case e: Throwable => Left(e) }
      val dt = (System.nanoTime() - t0) / 1e9
      // listener events are posted async (the bus drain API is
      // private[spark]); a short settle window is enough for a local
      // bus once the job's last task has returned
      Thread.sleep(1500)
      res match {
        case Right(n) =>
          println(f"""{"probe":"spill","query":"$name","rows":$n,"sec":$dt%.1f,"mem_spill_mb":${memSpill.sum() / (1024 * 1024)},"disk_spill_mb":${diskSpill.sum() / (1024 * 1024)},"peak_exec_mem_mb":${peakMem.sum() / (1024 * 1024)}}""")
        case Left(e) =>
          println(s"""{"probe":"spill","query":"$name","error":"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").replace('"', '\'').take(160)}"}""")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
