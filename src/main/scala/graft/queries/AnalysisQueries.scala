package graft.queries

import org.apache.spark.sql.functions._
import graft.analyses.TimeResolution
import graft.sources.Tables

/** Full reference-analysis compositions driven from the synthetic tables —
  * the SURVEY §3 entry points as single lazy Spark plans.
  */
object AnalysisQueries {

  /** §3.1 flagship: the whole time-resolution pipeline (unpivot → device
    * pairing → Δt grid → trigger-level bootstrap → per-replica MAD → argmin
    * → Gaussian fit) over a beta-scan-shaped table derived from lineitem
    * (trigger = orderkey, device = linenumber 1/2, timing = scaled price).
    * Deterministic (seeded) — rows-only for the driver; the physics
    * correctness is pinned by AnalysesSpec's injected-σ recovery test.
    */
  val flagship: Q = Q(
    "flagship_time_resolution",
    None,
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val base = li
        .filter(col("l_linenumber").isin(1, 2))
        .groupBy("l_orderkey", "l_linenumber")
        .agg(min("l_extendedprice").as("p"))
        .select(
          col("l_orderkey").as("n_trigger"),
          concat(lit("dev"), col("l_linenumber")).as("device_name"),
          (col("p") * lit(1e-9)).as("t0"))
      val wide = TimeResolution.KGrid
        .foldLeft(base) { (df, k) => df.withColumn(s"t_$k (s)", col("t0") + lit(k * 1e-10)) }
        .drop("t0")
      TimeResolution.run(
        wide,
        TimeResolution.Config("dev1", "dev2", replicas = 8, seed = 42L,
          iqrSpread = true)) // one-pass spread for the benchmarked path
    })

  def all: Seq[Q] = Seq(flagship)
}
