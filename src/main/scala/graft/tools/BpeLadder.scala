package graft.tools

import org.apache.spark.sql.SparkSession

/** R-axis cost ladder for the two BPE training loops — the r11 verdict's
  * missing probe: the corpus-axis ladder (flat ×1→×8) could not see the
  * rounds-axis wall of the recount-everything loop. Runs the naive
  * trainer ([[graft.queries.TextQueries.bpeChain]]) and the
  * delta-maintained trainer ([[graft.queries.TextQueries.bpeChainDelta]])
  * at R = 8 / 16 / 32 / 64 on one SF dir and prints seconds per depth,
  * plus the per-round marginal for the deepest run.
  *
  * Run: sbt "runMain graft.tools.BpeLadder [sfDir]"
  */
object BpeLadder {
  def main(args: Array[String]): Unit = {
    val sfDir =
      if (args.length > 0) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.tune(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // warm scan + BOTH loops' codegen at R=2 so the first timed cell
    // isn't charged for compilation (the sf0.01 first run showed the
    // delta R=8 cell absorbing ~4 s of codegen warmup)
    docs.count()
    locally {
      val s1 = new graft.operators.CheckpointScope
      try graft.queries.TextQueries.bpeChainDelta(docs, 2, s1)
      finally s1.closeAll()
      val s2 = new graft.operators.CheckpointScope
      try graft.queries.TextQueries.bpeChain(docs, s2, 2)
      finally s2.closeAll()
    }

    def time(label: String, r: Int)(body: => Unit): Unit = {
      val t0 = System.nanoTime
      try {
        body
        println(f"LADDER $label%-6s R=$r%-3d sec=${(System.nanoTime - t0) / 1e9}%.2f")
      } catch {
        case e: IllegalArgumentException =>
          // the trainer's loud pair-exhaustion guard: the corpus ran out
          // of merges before depth r — an honest ladder ceiling, not an
          // error (the sf0.1 documents vocabulary exhausts at round 90)
          println(f"LADDER $label%-6s R=$r%-3d EXHAUSTED (${e.getMessage})")
      }
    }

    // the delta loop gets the deeper cells — the naive loop's 64-round
    // cost already shows its corpus-linear wall
    for (r <- Seq(8, 16, 32, 64, 128)) {
      time("delta", r) {
        val scope = new graft.operators.CheckpointScope
        try { graft.queries.TextQueries.bpeChainDelta(docs, r, scope); () }
        finally scope.closeAll()
      }
    }
    for (r <- Seq(8, 16, 32, 64)) {
      time("naive", r) {
        val scope = new graft.operators.CheckpointScope
        try { graft.queries.TextQueries.bpeChain(docs, scope, r); () }
        finally scope.closeAll()
      }
    }
    spark.stop()
  }
}
