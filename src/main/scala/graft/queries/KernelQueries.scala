package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.DetAgg
import graft.operators.Bootstrap
import graft.sources.Tables

/** Bootstrap / numeric-kernel queries (SURVEY §2.5 A10, §2.8). These are
  * the non-SQL-expressible operators — registered without an oracle, so
  * the driver records the weaker rows-only check; determinism is still
  * guaranteed (seeded hashes), and ScalaTest specs pin the semantics.
  */
object KernelQueries {

  /** Exact per-group multinomial bootstrap, aggregated per (replica, group)
    * — the time-resolution resampling shape (reference
    * `scripts/time_resolution_beta_scan.py:249-258`). Each (replica, flag)
    * count equals the original group size by construction.
    */
  val a10Exact: Q = Q(
    "a10_bootstrap_exact",
    None,
    (s, dir) => {
      val t = Tables.load(s, dir, "lineitem")
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity")
      Bootstrap
        .exactResample(
          t, Seq("l_returnflag"),
          Seq(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
          replicas = 4, seed = 42L)
        .groupBy("replica", "l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          DetAgg.dsum(col("l_quantity")).as("sum_qty"))
    })

  /** Poissonized bootstrap error: std over replicas of the replica-mean —
    * the jitter-uncertainty composition (reference
    * `scripts/time_resolution_beta_scan.py:338-340`). No join, no
    * per-group state: the 100 TB form.
    */
  val a10PoissonErr: Q = Q(
    "a10_bootstrap_err",
    None,
    (s, dir) => {
      val t = Tables.load(s, dir, "lineitem")
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity")
      val replicaMeans = Bootstrap
        .poissonResample(
          t,
          Seq(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
          replicas = 16, seed = 7L)
        .groupBy("replica", "l_returnflag")
        .agg(DetAgg.davg(col("l_quantity")).as("replica_mean"))
      replicaMeans
        .groupBy("l_returnflag")
        .agg(round(DetAgg.dstd(col("replica_mean")) * lit(1e6), 3).as("boot_err_ppm"))
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
