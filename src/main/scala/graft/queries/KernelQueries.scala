package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.DetAgg
import graft.operators.Bootstrap
import graft.sources.Tables

/** Bootstrap / numeric-kernel queries (SURVEY §2.5 A10, §2.8). The
  * resample draws are non-SQL-expressible (xxhash64), so these rows are
  * CERTIFICATE-checked (r13 verdict item 4): oracle-replayable contract
  * columns plus in-row verdicts against literal-true oracles;
  * determinism is still guaranteed (seeded hashes), ScalaTest specs pin
  * the semantics, and `a10_bootstrap_hash` keeps the weighted-resample
  * values hash-exact.
  */
object KernelQueries {

  /** Exact per-group multinomial bootstrap, aggregated per (replica, group)
    * — the time-resolution resampling shape (reference
    * `scripts/time_resolution_beta_scan.py:249-258`).
    *
    * CERTIFICATE ROW (r13 verdict item 4): the xxhash64 draws aren't
    * portable SQL, but the multinomial CONTRACT is — each (replica,
    * flag) count equals the original group size BY CONSTRUCTION, and
    * the oracle recomputes that `n` as COUNT(*), hash-compared. The
    * replica mean additionally sits inside a wide CLT band around the
    * group mean (`mean_in_band`, z = 8 — a resample mean 8 standard
    * errors out means the draw arithmetic is broken, not unlucky);
    * `a10_bootstrap_hash` keeps the full weighted-resample VALUES
    * hash-exact via the portable-multiplicity tier.
    */
  val a10Exact: Q = Q(
    "a10_bootstrap_exact",
    Some("""SELECT r.replica, l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
           |  TRUE AS mean_in_band
           |FROM lineitem
           |CROSS JOIN (SELECT UNNEST(generate_series(0, 3)) AS replica) r
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    (s, dir) => {
      val t = Tables.load(s, dir, "lineitem")
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity")
      val stats = t.groupBy("l_returnflag").agg(
        avg(col("l_quantity")).as("gm"),
        stddev_samp(col("l_quantity")).as("gs"),
        count(lit(1)).cast("double").as("gn"))
      Bootstrap
        .exactResample(
          t, Seq("l_returnflag"),
          Seq(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
          replicas = 4, seed = 42L)
        .groupBy("replica", "l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          avg(col("l_quantity")).as("rm"))
        .join(broadcast(stats), "l_returnflag")
        .select(
          col("replica"), col("l_returnflag"), col("n"),
          (abs(col("rm") - col("gm")) <= lit(8.0) * col("gs") / sqrt(col("gn")))
            .as("mean_in_band"))
        .orderBy("replica", "l_returnflag")
    })

  /** Poissonized bootstrap error: std over replicas of the replica-mean —
    * the jitter-uncertainty composition (reference
    * `scripts/time_resolution_beta_scan.py:338-340`). No join, no
    * per-group state: the 100 TB form.
    *
    * CERTIFICATE ROW: the bootstrap standard error must agree with the
    * analytic standard error of the mean (σ/√n) within a generous χ
    * band — 16 replicas put the sd-of-replicas ratio within ~±20% at
    * 1σ, so [0.4, 2.5] only fails on broken resampling arithmetic, not
    * on seed luck. Verdict in-row vs a literal-true oracle.
    */
  val a10PoissonErr: Q = Q(
    "a10_bootstrap_err",
    Some("""SELECT l_returnflag, TRUE AS err_in_band
           |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, dir) => {
      val t = Tables.load(s, dir, "lineitem")
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity")
      val stats = t.groupBy("l_returnflag").agg(
        stddev_samp(col("l_quantity")).as("gs"),
        count(lit(1)).cast("double").as("gn"))
      // multiplicity as a WEIGHT, not a physical row explode: identical
      // replica means (DetAgg.davgW is bit-identical to davg over the
      // exploded frame), no duplication pass, ~2/3 of the rows (m = 0
      // drops out instead of being generated and re-dropped)
      val replicaMeans = Bootstrap
        .poissonWeights(
          t,
          Seq(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
          replicas = 16, seed = 7L)
        .groupBy("replica", "l_returnflag")
        .agg(DetAgg.davgW(col("l_quantity"), col("__m")).as("replica_mean"))
      replicaMeans
        .groupBy("l_returnflag")
        .agg(DetAgg.dstd(col("replica_mean")).as("boot_err"))
        .join(broadcast(stats), "l_returnflag")
        .select(
          col("l_returnflag"),
          (col("boot_err") >= lit(0.4) * col("gs") / sqrt(col("gn"))
            && col("boot_err") <= lit(2.5) * col("gs") / sqrt(col("gn")))
            .as("err_in_band"))
        .orderBy("l_returnflag")
    })

  /** Portable-hash Poisson bootstrap, ORACLE-CHECKED: multiplicity is a
    * Knuth multiplicative hash (Bootstrap.portableMultiplicity) whose
    * arithmetic runs identically in DuckDB, and the resample is consumed
    * as a WEIGHT (n = Σm, sum = Σ qty·m) — the same weighted form the
    * flagship uses, so the whole A10 semantics gets a hash-exact row.
    */
  val a10Hash: Q = {
    val keySql = "l_orderkey * 31 + l_linenumber * 7919 + replica * 104729"
    Q(
      "a10_bootstrap_hash",
      Some(s"""SELECT replica, l_returnflag,
              |  CAST(SUM(m) AS BIGINT) AS n,
              |  CAST(SUM(CAST(l_quantity * m AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
              |FROM (
              |  SELECT l_returnflag, l_quantity, r.replica,
              |    ${Bootstrap.Sql.portableMultiplicity(keySql)} AS m
              |  FROM lineitem
              |  CROSS JOIN (SELECT UNNEST(range(0, 4)) AS replica) r)
              |GROUP BY replica, l_returnflag""".stripMargin),
      (s, dir) => {
        val key = col("l_orderkey") * lit(31L) + col("l_linenumber") * lit(7919L) +
          col("replica") * lit(104729L)
        Tables.load(s, dir, "lineitem")
          .select("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity")
          .withColumn("replica", explode(sequence(lit(0L), lit(3L))))
          .withColumn("m", Bootstrap.portableMultiplicity(key))
          .groupBy("replica", "l_returnflag")
          .agg(
            sum(col("m")).as("n"),
            DetAgg.dsum(col("l_quantity") * col("m")).as("sum_qty"))
      })
  }

  def all: Seq[Q] = Seq(a10Exact, a10PoissonErr, a10Hash)
}
