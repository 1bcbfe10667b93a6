package graft.queries

import org.apache.spark.sql.functions._
import graft.analyses.TimeResolution
import graft.sources.Tables
import graft.operators.Bootstrap

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

  /** HASH-EXACT closed-form twin of the WHOLE flagship chain: Δt grid →
    * portable Poisson bootstrap (replica 0 = real pass) → exact MAD_std
    * per (replica, k1, k2) → per-replica argmin → histogram at the best
    * grid point → Caruana closed-form Gaussian fit. Same stages, each in
    * its bit-portable tier:
    *
    *  - the median inside MAD is ONE window sort + rank-selected
    *    (a+b)/2 — sorting the same double multiset and averaging two
    *    values is bit-identical in any IEEE engine, so kmad needs no
    *    tolerance at all;
    *  - multiplicities are the Knuth-hash Poisson tier (the A10 recipe);
    *  - histogram bucketing shares one expression text (lo/hi are MIN/MAX
    *    — exact — so bucket indices match bit-for-bit);
    *  - the fit is the n1_gaussian_caruana recipe: integer power sums,
    *    DetAgg'd log-counts (absorbs LN last-ulp), shared Cramer text.
    *
    * The iterative Nelder–Mead flagship keeps its spec-checked σ-recovery
    * evidence; this twin gives the headline pipeline a full DuckDB
    * oracle. Δt is carried in PICOSECONDS so round-6 output columns sit
    * far from the double noise floor.
    */
  val flagshipCaruana: Q = {
    val R = 4 // bootstrap replicas 1..R + the real pass (replica 0)
    val bins = 50
    import graft.fit.ClosedForm
    import graft.functions.DetAgg.{Sql => D}
    val (det, na, nb, nc) = ClosedForm.cramerTexts
    val wdT = "((hi - lo) / 5.0e1)"
    val (muT, sgT, amT) = ClosedForm.paramTextsCols(s"lo + 2.55e1 * $wdT", wdT)
    val multKey = "n_trigger * 131 + r.replica * 104729"
    val bucketT =
      "CAST(LEAST(GREATEST(FLOOR((dps - lo) / ((hi - lo) / 5.0e1)), 0), 49) AS BIGINT)"
    def medianSel(v: String) =
      s"CASE WHEN rn = CAST(FLOOR((n + 1) / 2.0e0) AS BIGINT) " +
        s"OR rn = CAST(FLOOR((n + 2) / 2.0e0) AS BIGINT) THEN $v END"
    Q(
      "flagship_time_resolution_caruana",
      Some(s"""WITH base AS (
              |  SELECT l_orderkey AS n_trigger, l_linenumber AS dev,
              |    MIN(l_extendedprice) * 1.0e-9 AS t0
              |  FROM lineitem WHERE l_linenumber IN (1, 2) GROUP BY 1, 2),
              |pa AS (SELECT n_trigger, t0 AS t0a FROM base WHERE dev = 1),
              |pb AS (SELECT n_trigger, t0 AS t0b FROM base WHERE dev = 2),
              |dt AS (
              |  SELECT n_trigger, k1, k2,
              |    ((t0a + k1 * 1.0e-10) - (t0b + k2 * 1.0e-10)) * 1.0e12 AS dps
              |  FROM pa JOIN pb USING (n_trigger)
              |  CROSS JOIN (SELECT UNNEST(generate_series(1, 9)) * 10 AS k1) g1
              |  CROSS JOIN (SELECT UNNEST(generate_series(1, 9)) * 10 AS k2) g2),
              |fan AS (
              |  SELECT dt.*, r.replica,
              |    CASE WHEN r.replica = 0 THEN 1
              |         ELSE ${Bootstrap.Sql.portableMultiplicity(multKey)} END AS m
              |  FROM dt CROSS JOIN (SELECT UNNEST(generate_series(0, $R)) AS replica) r),
              |fanp AS (SELECT * FROM fan WHERE m > 0),
              |fanx AS (SELECT f.* FROM fanp f, LATERAL unnest(generate_series(1, m)) AS dup(i)),
              |r1 AS (SELECT replica, k1, k2, dps,
              |    ROW_NUMBER() OVER (PARTITION BY replica, k1, k2 ORDER BY dps) AS rn,
              |    COUNT(*) OVER (PARTITION BY replica, k1, k2) AS n
              |  FROM fanx),
              |med AS (SELECT replica, k1, k2,
              |    SUM(${medianSel("dps")}) / COUNT(${medianSel("dps")}) AS md
              |  FROM r1 GROUP BY 1, 2, 3),
              |r2 AS (SELECT f.replica, f.k1, f.k2, f.dps, ABS(f.dps - m.md) AS adev
              |  FROM fanx f JOIN med m USING (replica, k1, k2)),
              |r3 AS (SELECT replica, k1, k2, dps, adev,
              |    ROW_NUMBER() OVER (PARTITION BY replica, k1, k2 ORDER BY adev) AS rn,
              |    COUNT(*) OVER (PARTITION BY replica, k1, k2) AS n
              |  FROM r2),
              |sp AS (SELECT replica, k1, k2,
              |    ROUND(SUM(${medianSel("adev")}) / COUNT(${medianSel("adev")}) * 1.4826e0, 6)
              |      AS kmad,
              |    MIN(dps) AS lo, MAX(dps) AS hi
              |  FROM r3 GROUP BY 1, 2, 3),
              |best AS (SELECT replica, k1, k2, kmad, lo, hi FROM (
              |    SELECT sp.*, ROW_NUMBER() OVER (PARTITION BY replica
              |      ORDER BY kmad, k1, k2) AS brn FROM sp) WHERE brn = 1),
              |hs AS (SELECT f.replica, b.lo, b.hi, f.m, $bucketT AS bucket
              |  FROM fanp f JOIN best b USING (replica, k1, k2)),
              |hist AS (SELECT replica, bucket, SUM(m) AS cnt,
              |    MIN(lo) AS lo, MIN(hi) AS hi
              |  FROM hs GROUP BY 1, 2),
              |uy AS (SELECT replica, bucket - 25 AS u, LN(CAST(cnt AS DOUBLE)) AS y, lo, hi
              |  FROM hist),
              |mm AS (SELECT replica,
              |    CAST(COUNT(*) AS DOUBLE) AS s0,
              |    CAST(SUM(u) AS DOUBLE) AS su,
              |    CAST(SUM(u*u) AS DOUBLE) AS su2,
              |    CAST(SUM(u*u*u) AS DOUBLE) AS su3,
              |    CAST(SUM(u*u*u*u) AS DOUBLE) AS su4,
              |    ${D.dsum("y")} AS sy,
              |    ${D.dsum("u * y")} AS suy,
              |    ${D.dsum("u * u * y")} AS su2y,
              |    MIN(lo) AS lo, MIN(hi) AS hi
              |  FROM uy GROUP BY 1),
              |abc AS (SELECT replica, lo, hi,
              |    ($na)/($det) AS a, ($nb)/($det) AS b, ($nc)/($det) AS c FROM mm),
              |fits AS (SELECT replica, $muT AS mu, $sgT AS sigma, $amT AS amplitude FROM abc)
              |SELECT b.replica, CAST(b.k1 AS BIGINT) AS k1, CAST(b.k2 AS BIGINT) AS k2,
              |  b.kmad, ROUND(f.mu, 6) AS mu, ROUND(f.sigma, 6) AS sigma,
              |  ROUND(f.amplitude, 6) AS amplitude
              |FROM best b JOIN fits f USING (replica)""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        import graft.functions.DetAgg
        val li = Tables.load(s, dir, "lineitem")
        val base = li.filter(col("l_linenumber").isin(1, 2))
          .groupBy("l_orderkey", "l_linenumber")
          .agg(min("l_extendedprice").as("p"))
          .select(
            col("l_orderkey").as("n_trigger"), col("l_linenumber").as("dev"),
            (col("p") * lit(1.0e-9)).as("t0"))
        val pa = base.filter(col("dev") === 1).select(col("n_trigger"), col("t0").as("t0a"))
        val pb = base.filter(col("dev") === 2).select(col("n_trigger"), col("t0").as("t0b"))
        val dt = pa.join(pb, "n_trigger")
          .withColumn("k1", explode(sequence(lit(10), lit(90), lit(10))))
          .withColumn("k2", explode(sequence(lit(10), lit(90), lit(10))))
          .select(
            col("n_trigger"), col("k1"), col("k2"),
            (((col("t0a") + col("k1") * lit(1.0e-10))
              - (col("t0b") + col("k2") * lit(1.0e-10))) * lit(1.0e12)).as("dps"))
        val fanp = dt
          .withColumn("replica", explode(sequence(lit(0), lit(R))))
          .withColumn(
            "m",
            when(col("replica") === 0, 1).otherwise(
              Bootstrap.portableMultiplicity(
                col("n_trigger") * lit(131L) + col("replica") * lit(104729L))))
          .filter(col("m") > 0)
        val keys = Seq("replica", "k1", "k2")
        val pw = Window.partitionBy(keys.map(col): _*)
        // WEIGHTED exact median: a row of weight m covers positions
        // (cum−m, cum] of the would-be exploded sequence, so the value at
        // target position p is the row with cum−m < p ≤ cum. The two
        // middle positions are selected by running-weight arithmetic —
        // bit-identical to exploding m copies and rank-selecting (same
        // multiset, same positional values, (a+b)/2 over ≤2 terms), but
        // the explode never materializes. Tie order inside equal dps runs
        // doesn't matter: every covering row holds the same value.
        val hitsExpr =
          "(CASE WHEN cum - m < CAST(FLOOR((n + 1) / 2.0e0) AS BIGINT) " +
            "AND CAST(FLOOR((n + 1) / 2.0e0) AS BIGINT) <= cum THEN 1 ELSE 0 END) + " +
            "(CASE WHEN cum - m < CAST(FLOOR((n + 2) / 2.0e0) AS BIGINT) " +
            "AND CAST(FLOOR((n + 2) / 2.0e0) AS BIGINT) <= cum THEN 1 ELSE 0 END)"
        def weightedMedian(df: org.apache.spark.sql.DataFrame, v: String)
            : org.apache.spark.sql.DataFrame = {
          val ranked = df
            .withColumn("cum", sum(col("m")).over(
              pw.orderBy(col(v)).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .withColumn("n", sum(col("m")).over(pw))
            .withColumn("hits", expr(hitsExpr))
          ranked.groupBy(keys.map(col): _*).agg(
            (sum(col(v) * col("hits")) / sum(col("hits"))).as(s"__med_$v"),
            min(col("dps")).as(s"__lo_$v"), max(col("dps")).as(s"__hi_$v"))
        }
        // deliberately LAZY: the Δt fan is recomputed per pass — it is a
        // cheap scan+join+explode, and materializing 60M rows to a cache
        // (measured) costs nearly 2× what the recomputes do
        val result = {
          val med = weightedMedian(fanp, "dps")
            .select((keys.map(col) :+ col("__med_dps").as("md")): _*)
          val sp = weightedMedian(
            fanp.join(med, keys).withColumn("adev", abs(col("dps") - col("md"))), "adev")
            .select(
              (keys.map(col) :+
                round(col("__med_adev") * lit(1.4826e0), 6).as("kmad") :+
                col("__lo_adev").as("lo") :+ col("__hi_adev").as("hi")): _*)
          val best = sp
            .withColumn("brn", row_number().over(
              Window.partitionBy("replica").orderBy(col("kmad"), col("k1"), col("k2"))))
            .filter(col("brn") === 1)
            .select("replica", "k1", "k2", "kmad", "lo", "hi")
          val hist = fanp.join(best.select("replica", "k1", "k2", "lo", "hi"), keys)
            .withColumn("bucket", expr(bucketT))
            .groupBy("replica", "bucket")
            .agg(sum(col("m")).as("cnt"), min("lo").as("lo"), min("hi").as("hi"))
          val uy = hist.select(
            col("replica"), (col("bucket") - lit(25L)).as("u"),
            expr("LN(CAST(cnt AS DOUBLE))").as("y"), col("lo"), col("hi"))
          val mm = uy.groupBy("replica").agg(
            count(lit(1)).cast("double").as("s0"),
            sum(col("u")).cast("double").as("su"),
            sum(col("u") * col("u")).cast("double").as("su2"),
            sum(col("u") * col("u") * col("u")).cast("double").as("su3"),
            sum(col("u") * col("u") * col("u") * col("u")).cast("double").as("su4"),
            DetAgg.dsum(col("y")).as("sy"),
            DetAgg.dsum(col("u") * col("y")).as("suy"),
            DetAgg.dsum(col("u") * col("u") * col("y")).as("su2y"),
            min("lo").as("lo"), min("hi").as("hi"))
          val fits = mm
            .select(
              col("replica"), col("lo"), col("hi"),
              expr(s"($na)/($det)").as("a"),
              expr(s"($nb)/($det)").as("b"),
              expr(s"($nc)/($det)").as("c"))
            .select(
              col("replica"),
              expr(muT).as("mu"), expr(sgT).as("sigma"), expr(amT).as("amplitude"))
          best.join(fits, "replica")
            .select(
              col("replica").cast("long").as("replica"),
              col("k1").cast("long").as("k1"), col("k2").cast("long").as("k2"),
              col("kmad"),
              round(col("mu"), 6).as("mu"),
              round(col("sigma"), 6).as("sigma"),
              round(col("amplitude"), 6).as("amplitude"))
        }
        result
      })
  }

  def all: Seq[Q] = Seq(flagship, flagshipCaruana)
}
