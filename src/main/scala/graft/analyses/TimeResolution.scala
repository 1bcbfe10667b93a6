package graft.analyses

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.fit.FitAggregators
import graft.functions.Stats

/** The reference's flagship query: β-scan time resolution
  * (`scripts/time_resolution_beta_scan.py`, traced in SURVEY §3.1).
  *
  * Pipeline (ONE lazy Spark plan — the reference's 34-pass driver loop
  * becomes a `replica` data dimension):
  *
  *  1. unpivot the 9 CFD threshold columns `t_10 (s)` … `t_90 (s)` to long
  *     (k, t) form                                  [R2]
  *  2. self-pair device A × device B per trigger → Δt(k1, k2) — the 81-way
  *     grid arrives via the k-unpivot join, not a crossJoin of columns [J4]
  *  3. Poissonized bootstrap over TRIGGER KEYS (pairing is preserved
  *     because the multiplicity rides the trigger, not the row)       [A10]
  *  4. per (replica, k1, k2): MAD_std of Δt                           [A2]
  *  5. per replica: arg-min (k1, k2)                                  [A5]
  *  6. per replica at the best grid point: histogram + Gaussian fit   [N1]
  *
  * Result: one row per replica (k1, k2, kmad, mu, sigma, amplitude);
  * replica 0 is the real pass, σ-spread over replicas 1..N is the
  * bootstrap uncertainty (`scripts/time_resolution_beta_scan.py:338-340`).
  *
  * Scale shape: everything shuffles on (replica, k1, k2) or (trigger) —
  * no driver loops, no collect; fits are per-replica aggregators.
  */
object TimeResolution {

  val KGrid: Seq[Int] = 10 to 90 by 10

  /** `t_10 (s)` … `t_90 (s)` — unit-bearing names kept verbatim
    * (reference `scripts/time_resolution_beta_scan.py:34`).
    */
  def tColumns: Seq[String] = KGrid.map(k => s"t_$k (s)")

  /** Unpivot the CFD threshold columns: (n_trigger, device_name, k, t). */
  def longForm(events: DataFrame): DataFrame =
    events
      .unpivot(
        Array(col("n_trigger"), col("device_name")),
        tColumns.map(c => col(s"`$c`")).toArray,
        "t_col", "t")
      .withColumn("k", regexp_extract(col("t_col"), "t_(\\d+) \\(s\\)", 1).cast("int"))
      .drop("t_col")

  /** Δt table: per trigger and (k1, k2) pair, t_k1(devA) − t_k2(devB)
    * (reference `calculate_Delta_t_df`,
    * `scripts/time_resolution_beta_scan.py:32-55`).
    */
  def deltaT(events: DataFrame, devA: String, devB: String): DataFrame = {
    val long = longForm(events)
    val a = long.filter(col("device_name") === devA)
      .select(col("n_trigger"), col("k").as("k1"), col("t").as("t1"))
    val b = long.filter(col("device_name") === devB)
      .select(col("n_trigger"), col("k").as("k2"), col("t").as("t2"))
    a.join(b, "n_trigger")
      .select(
        col("n_trigger"), col("k1"), col("k2"),
        (col("t1") - col("t2")).as("delta_t"))
  }

  /** Bootstrap multiplicity for (trigger, replica): Poisson(1) via the
    * inverse CDF of a hashed uniform; replica 0 (the real pass) is always
    * multiplicity 1. A PURE function of (trigger, replica, seed) — so it
    * is computed inline on each Δt row with no distinct/join, and every
    * row of the same trigger gets the same multiplicity, which is exactly
    * what preserves the A/B pairing (the reference's pivot-sample-stack,
    * `scripts/time_resolution_beta_scan.py:21-30`).
    */
  def multiplicity(trigger: Column, replica: Column, seed: Long): Column = {
    val u = (xxhash64(trigger, replica, lit(seed)).cast("double")
      / lit(2.0 * Long.MaxValue)) + lit(0.5)
    // Poisson(1) inverse CDF, truncated at 6 (P < 1e-4 tail)
    val cdf = {
      var p = math.exp(-1.0); var acc = p
      (0 to 6).map { k => if (k > 0) { p /= k; acc += p }; acc }
    }
    val m = cdf.zipWithIndex.foldRight(lit(7): Column) { case ((t, k), els) =>
      when(u < t, k).otherwise(els)
    }
    when(replica === 0, 1).otherwise(m)
  }

  /** Per-trigger bootstrap multiplicities as a table (kept for callers
    * that want the resample plan itself; [[run]] inlines
    * [[multiplicity]] instead — no join).
    */
  def triggerReplicas(triggers: DataFrame, replicas: Int, seed: Long): DataFrame =
    triggers
      .withColumn("replica", explode(sequence(lit(0), lit(replicas))))
      .withColumn("m", multiplicity(col("n_trigger"), col("replica"), seed))
      .filter(col("m") > 0)

  final case class Config(
      devA: String,
      devB: String,
      replicas: Int = 33,
      seed: Long = 42L,
      histBins: Int = 50,
      exactMad: Boolean = false, // approx sketches by default — 100 TB tier
      // one-pass IQR spread instead of two-pass MAD for the grid argmin:
      // halves the heaviest stage; σ itself still comes from the fit
      iqrSpread: Boolean = false)

  /** Full flagship pipeline → one row per replica:
    * (replica, k1, k2, kmad, mu, sigma, amplitude).
    */
  def run(events: DataFrame, cfg: Config): DataFrame = {
    // the Δt table feeds four downstream passes (spread agg, best-point
    // samples, ranges, histogram) — persist it so the unpivot + self-join
    // lineage runs once; spills to disk if it outgrows executor memory
    val dt = deltaT(events, cfg.devA, cfg.devB)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // bootstrap fan-out computed INLINE (pure hash of trigger+replica+seed):
    // every Δt row of a trigger appears m times per replica — no join
    val fanned = dt
      .withColumn("replica", explode(sequence(lit(0), lit(cfg.replicas))))
      .withColumn("m", multiplicity(col("n_trigger"), col("replica"), cfg.seed))
      .filter(col("m") > 0)
      .withColumn("__dup", explode(array_repeat(lit(1), col("m"))))
      .drop("m", "__dup")
    // MAD_std of Δt per (replica, k1, k2)  [A2] — two-pass form: the Δt
    // table is huge (triggers × 81 × replicas) but the group count is tiny,
    // so two codegen'd native-median aggregations + a broadcast join beat
    // one buffering-aggregator pass by a wide margin
    val kmad =
      if (cfg.iqrSpread)
        Stats.iqrStdOnePass(fanned, Seq("replica", "k1", "k2"), "delta_t", "kmad")
      else
        Stats.madStdTwoPass(
          fanned, Seq("replica", "k1", "k2"), "delta_t", "kmad", exact = cfg.exactMad)
    // arg-min grid point per replica  [A5]
    val best = graft.operators.Windows.argMinPerGroup(
      kmad, Seq("replica"), Seq(col("kmad"), col("k1"), col("k2")))
    // Δt samples at each replica's best (k1, k2)
    val bestSamples = fanned
      .join(best.select("replica", "k1", "k2"), Seq("replica", "k1", "k2"))
    // per-replica histogram (data-driven range, reference bins='auto' style)
    val ranges = bestSamples.groupBy("replica")
      .agg(min("delta_t").as("lo"), max("delta_t").as("hi"))
    val w = (col("hi") - col("lo")) / lit(cfg.histBins)
    val hist = bestSamples
      .join(ranges, "replica")
      .withColumn(
        "bucket",
        least(
          greatest(floor((col("delta_t") - col("lo")) / w), lit(0L)),
          lit(cfg.histBins - 1L)))
      .groupBy("replica", "bucket")
      .agg(
        count(lit(1)).as("n"),
        first(col("lo")).as("lo"),
        first(col("hi")).as("hi"))
      .withColumn(
        "center",
        col("lo") + (col("bucket") + lit(0.5)) * (col("hi") - col("lo")) / lit(cfg.histBins))
    // Gaussian fit per replica  [N1]
    val fits = hist
      .groupBy("replica")
      .agg(FitAggregators.gaussianFit(col("center"), col("n").cast("double")).as("fit"))
      .select(
        col("replica"),
        col("fit.mu").as("mu"),
        col("fit.sigma").as("sigma"),
        col("fit.amplitude").as("amplitude"))
    best.join(fits, "replica")
      .select("replica", "k1", "k2", "kmad", "mu", "sigma", "amplitude")
  }

  /** Headline summary: σ of the real pass ± std over bootstrap replicas
    * (reference `scripts/time_resolution_beta_scan.py:338-340`).
    */
  def summarize(perReplica: DataFrame): DataFrame = {
    val real = perReplica.filter(col("replica") === 0)
      .select(col("k1"), col("k2"), col("sigma").as("time_resolution_sigma"))
    val boot = perReplica.filter(col("replica") > 0)
      .agg(stddev_samp(col("sigma")).as("sigma_error"))
    real.crossJoin(boot)
  }
}
