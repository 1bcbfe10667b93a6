package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.DetAgg
import graft.functions.DetAgg.{Sql => D}
import graft.functions.TextFunctions
import graft.operators.Profile
import graft.sources.Tables

/** Data-profiling and text-cleaning queries (pipeline-debugging surface).
  */
object ProfileQueries {

  private val ProfileCols = Seq("l_quantity", "l_extendedprice", "l_discount")

  /** One-pass numeric profile of lineitem — every statistic for every
    * column in a single aggregation; oracle generated from the same
    * column list.
    */
  val profileLineitem: Q = Q(
    "profile_lineitem",
    Some(ProfileCols.map { c =>
      s"""SELECT '$c' AS "column", COUNT(*) AS n,
         |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(MIN($c) AS DOUBLE) AS min, CAST(MAX($c) AS DOUBLE) AS max,
         |  ROUND(${D.davg(c)}, 6) AS mean
         |FROM lineitem""".stripMargin
    }.mkString("\nUNION ALL ")),
    (s, dir) =>
      Profile.describeNumeric(Tables.load(s, dir, "lineitem"), ProfileCols))

  /** PII redaction over documents with deterministic synthetic PII
    * appended (the corpus has none) — proves the email/phone patterns
    * behave identically under Java regex and RE2.
    */
  val textRedact: Q = Q(
    "text_redact",
    Some(s"""SELECT doc_id,
            |  regexp_replace(regexp_replace(
            |    text || ' contact: user' || CAST(doc_id AS VARCHAR)
            |         || '@example.com or +1 555 0100 ' || CAST(doc_id AS VARCHAR),
            |    '${TextFunctions.EmailRe}', '<EMAIL>', 'g'),
            |    '${TextFunctions.PhoneRe}', '<PHONE>', 'g') AS clean
            |FROM documents""".stripMargin),
    (s, dir) =>
      Tables.load(s, dir, "documents").select(
        col("doc_id"),
        TextFunctions.redactPii(
          concat(
            col("text"), lit(" contact: user"), col("doc_id").cast("string"),
            lit("@example.com or +1 555 0100 "), col("doc_id").cast("string")))
          .as("clean")))

  /** Two-sample KS between the l_quantity distributions of return flags
    * A and R — distribution-drift detection (did this crawl slice change
    * the data?); tie-correct exact form, oracle-mirrored cumulative
    * window.
    */
  val ksQuantity: Q = Q(
    "stat_ks_2samp",
    Some("""WITH g AS (
           |  SELECT l_quantity AS v,
           |    SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS c1,
           |    SUM(CASE WHEN l_returnflag = 'A' THEN 0 ELSE 1 END) AS c2
           |  FROM lineitem WHERE l_returnflag IN ('A', 'R')
           |  GROUP BY l_quantity),
           |c AS (
           |  SELECT
           |    SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS r1,
           |    SUM(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS r2,
           |    SUM(c1) OVER () AS n1, SUM(c2) OVER () AS n2
           |  FROM g)
           |SELECT MAX(ABS(CAST(r1 AS DOUBLE) / n1 - CAST(r2 AS DOUBLE) / n2)) AS ks
           |FROM c""".stripMargin),
    (s, dir) =>
      graft.functions.Stats.ks2Samp(
        Tables.load(s, dir, "lineitem").filter(col("l_returnflag").isin("A", "R")),
        "l_quantity",
        col("l_returnflag") === "A"))

  /** Spearman rank correlation between quantity and extended price
    * ([[graft.functions.Stats.spearman]]): Pearson over tie-averaged
    * DOUBLED ranks — first moments exact BIGINT sums, second moments
    * exact DECIMAL(38,0) (engine) / HUGEINT (DuckDB's silent SUM
    * promotion) — Θ(n³), past ~2.1M rows a long sum overflows (the r15
    * sf1 drive measured it) — ρ one fixed IEEE tail, NO rounding. The engine ranks both columns on the sharded
    * kernel (price is near-continuous — exactly the case the sharding
    * exists for); the oracle uses plain cumulative windows, so the hash
    * match re-proves the sharding on a two-column rank statistic.
    */
  val spearmanQP: Q = Q(
    "stat_spearman",
    Some("""WITH src AS (
           |  SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem
           |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
           |gx AS (SELECT x, COUNT(*) AS c FROM src GROUP BY x),
           |cx AS (SELECT x,
           |    2 * SUM(c) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) - c + 1 AS ax
           |  FROM gx),
           |gy AS (SELECT y, COUNT(*) AS c FROM src GROUP BY y),
           |cy AS (SELECT y,
           |    2 * SUM(c) OVER (ORDER BY y ROWS UNBOUNDED PRECEDING) - c + 1 AS ay
           |  FROM gy),
           |j AS (SELECT ax, ay FROM src JOIN cx USING (x) JOIN cy USING (y)),
           |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |    SUM(ax) AS sx, SUM(ay) AS sy,
           |    SUM(ax * ax) AS sxx,
           |    SUM(ay * ay) AS syy,
           |    SUM(ax * ay) AS sxy
           |  FROM j)
           |SELECT n,
           |  (CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
           |    - CAST(sx AS DOUBLE) * sy)
           |  / SQRT((CAST(n AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
           |        - CAST(sx AS DOUBLE) * sx)
           |       * (CAST(n AS DOUBLE) * CAST(CAST(syy AS VARCHAR) AS DOUBLE)
           |        - CAST(sy AS DOUBLE) * sy)) AS rho
           |FROM t""".stripMargin),
    (s, dir) =>
      graft.functions.Stats.spearman(
        Tables.load(s, dir, "lineitem"), "l_quantity", "l_extendedprice"))

  /** Systematic PPS sampling of documents by token weight
    * ([[graft.operators.Sampling.ppsSystematic]]): the exact-k weighted
    * draw with NO floating point and NO RNG — hit counts are integer
    * floor arithmetic on the sharded weight prefix, Σ hits = k exactly.
    * The oracle replays the single-window cumsum form, so the hash
    * match proves the sharded prefix bit-equal through the whole draw.
    */
  val ppsSample: Q = Q(
    "sample_pps_systematic",
    Some("""WITH w AS (
           |  SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS wt
           |  FROM documents),
           |c AS (SELECT doc_id, wt,
           |    SUM(wt) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum,
           |    SUM(wt) OVER () AS W FROM w)
           |SELECT doc_id, CAST(wt AS BIGINT) AS weight,
           |  CAST((cum * 100) // W - ((cum - wt) * 100) // W AS BIGINT) AS n_hits
           |FROM c
           |WHERE (cum * 100) // W - ((cum - wt) * 100) // W >= 1""".stripMargin),
    (s, dir) =>
      graft.operators.Sampling.ppsSystematic(
        Tables.load(s, dir, "documents"),
        "doc_id",
        TextFunctions.tokenCount(col("text")),
        k = 100))

  /** Jensen–Shannon divergence between the same two slices as
    * [[ksQuantity]] ([[graft.functions.Stats.jsd]]) — the symmetric,
    * always-finite member of the drift family (bounded by ln 2, no eps
    * floor: 0-share buckets vanish exactly through the mixture
    * denominator). Windowless PSI shape; round-6 ln tail.
    */
  val jsdQuantity: Q = {
    import graft.functions.DetAgg.{Sql => D}
    val pa = "(CAST(ca AS DOUBLE) / na)"
    val pb = "(CAST(cb AS DOUBLE) / nb)"
    val term =
      s"""CASE WHEN ca > 0 THEN $pa * LN(2.0 * $pa / ($pa + $pb)) ELSE 0.0 END
         | + CASE WHEN cb > 0 THEN $pb * LN(2.0 * $pb / ($pa + $pb)) ELSE 0.0 END"""
        .stripMargin.replaceAll("\n", "")
    Q(
      "stat_jsd",
      Some(s"""WITH src AS (
              |  SELECT CAST(l_quantity AS DOUBLE) AS v,
              |    l_returnflag = 'A' AS a
              |  FROM lineitem
              |  WHERE l_returnflag IN ('A', 'R') AND l_quantity IS NOT NULL),
              |r AS (
              |  SELECT MIN(v) AS lo, MAX(v) AS hi,
              |    SUM(CASE WHEN a THEN 1 ELSE 0 END) AS na,
              |    SUM(CASE WHEN a THEN 0 ELSE 1 END) AS nb
              |  FROM src),
              |g AS (
              |  SELECT LEAST(GREATEST(FLOOR((v - lo) /
              |      (CASE WHEN hi > lo THEN (hi - lo) / 20.0 ELSE 1.0 END)), 0), 19) AS b,
              |    na, nb,
              |    SUM(CASE WHEN a THEN 1 ELSE 0 END) AS ca,
              |    SUM(CASE WHEN a THEN 0 ELSE 1 END) AS cb
              |  FROM src CROSS JOIN r GROUP BY 1, 2, 3)
              |SELECT ROUND(0.5 * ${D.dsum(term)}, 6) AS jsd FROM g""".stripMargin),
      (s, dir) =>
        graft.functions.Stats.jsd(
          Tables.load(s, dir, "lineitem").filter(col("l_returnflag").isin("A", "R")),
          "l_quantity",
          col("l_returnflag") === "A"))
  }

  /** Mann–Whitney U between the same two slices as [[ksQuantity]] —
    * the nonparametric location test beside KS (shape) and PSI (bins):
    * [[graft.functions.Stats.mannWhitneyU]]. Integer-exact doubled rank
    * sums + tie term, then ONE fixed IEEE sequence for U and the
    * tie-corrected z — no rounding anywhere (the dstd contract), so the
    * hash match proves rank handling, tie correction, AND the float
    * tail are engine-portable. The oracle replays ranks with a plain
    * cumulative window; the engine runs the sharded-rank kernel — the
    * comparison doubles as a sharding-correctness proof on real ties
    * (l_quantity has ~50 distinct values over ~2/3 of the table).
    */
  /** Oracle CTEs `g, c, t(n1, n2, r2x, tt)` for the two-slice rank
    * moments — ONE text shared by `stat_mannwhitney` and
    * `stat_cliffs_delta` (the autocorrSqlCtes discipline), so the rank
    * machinery can never drift between the test and its effect size.
    */
  private val mwSqlCtes: String =
    """WITH g AS (
      |  SELECT l_quantity AS v,
      |    SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS c1,
      |    SUM(CASE WHEN l_returnflag = 'A' THEN 0 ELSE 1 END) AS c2
      |  FROM lineitem
      |  WHERE l_returnflag IN ('A', 'R') AND l_quantity IS NOT NULL
      |  GROUP BY l_quantity),
      |c AS (
      |  SELECT c1, c2,
      |    SUM(c1 + c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS r
      |  FROM g),
      |t AS (
      |  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
      |    CAST(SUM(c1 * (2 * r - (c1 + c2) + 1)) AS BIGINT) AS r2x,
      |    CAST(SUM((c1 + c2) * (c1 + c2) * (c1 + c2) - (c1 + c2)) AS BIGINT) AS tt
      |  FROM c)""".stripMargin

  val mannWhitney: Q = Q(
    "stat_mannwhitney",
    Some(s"""$mwSqlCtes
           |SELECT n1, n2,
           |  CAST(r2x - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u,
           |  (CAST(r2x - n1 * (n1 + 1) AS DOUBLE) / 2.0
           |    - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
           |  / SQRT(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
           |    * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1.0)
           |      - CAST(tt AS DOUBLE)
           |        / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
           |          * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0)))) AS z
           |FROM t""".stripMargin),
    (s, dir) =>
      graft.functions.Stats.mannWhitneyU(
        Tables.load(s, dir, "lineitem").filter(col("l_returnflag").isin("A", "R")),
        "l_quantity",
        col("l_returnflag") === "A"))

  /** Cliff's delta — the EFFECT SIZE companion to [[mannWhitney]]'s
    * significance z (a 100 TB table makes any z huge; δ says whether
    * the difference MATTERS): δ = P(x₁ > x₂) − P(x₁ < x₂). Exactly
    * derivable from the same rank kernel even under ties — with
    * W/L/T the greater/less/tied pair counts, U = W + T/2, so
    * 2U − n₁n₂ = W − L and δ = (2U − n₁n₂)/(n₁n₂): one extra fixed
    * IEEE expression over the SAME integer moments (shared CTE text,
    * shared Spark kernel) — no new pass over the data at all.
    */
  val cliffsDelta: Q = Q(
    "stat_cliffs_delta",
    Some(s"""$mwSqlCtes
           |SELECT n1, n2,
           |  (2.0 * (CAST(r2x - n1 * (n1 + 1) AS DOUBLE) / 2.0)
           |    - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
           |  / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS delta
           |FROM t""".stripMargin),
    (s, dir) =>
      graft.functions.Stats.mannWhitneyU(
        Tables.load(s, dir, "lineitem").filter(col("l_returnflag").isin("A", "R")),
        "l_quantity",
        col("l_returnflag") === "A")
        .select(
          col("n1"), col("n2"),
          ((lit(2.0) * col("u") - col("n1").cast("double") * col("n2").cast("double"))
            / (col("n1").cast("double") * col("n2").cast("double"))).as("delta")))

  // the parametric effect-size companion already exists: `stat_cohens_d`
  // ([[cohensD]] below) — δ is its rank-based, tie-robust sibling

  /** Population stability index between the same two slices as
    * [[ksQuantity]] — the bucketed companion drift metric (PSI is what
    * production monitors alarm on; KS is the exact-distribution check).
    * Whole plan is windowless: broadcast 1-row range/totals, one bucket
    * hash-aggregate (≤ 20 rows), decimal-routed final sum.
    */
  val psiQuantity: Q = {
    import graft.functions.DetAgg.{Sql => D}
    val paS = "GREATEST(CAST(ca AS DOUBLE) / na, 1e-6)"
    val pbS = "GREATEST(CAST(cb AS DOUBLE) / nb, 1e-6)"
    Q(
      "stat_psi",
      Some(s"""WITH src AS (
              |  SELECT CAST(l_quantity AS DOUBLE) AS v,
              |    l_returnflag = 'A' AS a
              |  FROM lineitem
              |  WHERE l_returnflag IN ('A', 'R') AND l_quantity IS NOT NULL),
              |r AS (
              |  SELECT MIN(v) AS lo, MAX(v) AS hi,
              |    SUM(CASE WHEN a THEN 1 ELSE 0 END) AS na,
              |    SUM(CASE WHEN a THEN 0 ELSE 1 END) AS nb
              |  FROM src),
              |g AS (
              |  SELECT LEAST(GREATEST(FLOOR((v - lo) /
              |      (CASE WHEN hi > lo THEN (hi - lo) / 20.0 ELSE 1.0 END)), 0), 19) AS b,
              |    na, nb,
              |    SUM(CASE WHEN a THEN 1 ELSE 0 END) AS ca,
              |    SUM(CASE WHEN a THEN 0 ELSE 1 END) AS cb
              |  FROM src CROSS JOIN r GROUP BY 1, 2, 3)
              |SELECT ROUND(${D.dsum(s"($paS - $pbS) * LN($paS / $pbS)")}, 6) AS psi
              |FROM g""".stripMargin),
      (s, dir) =>
        graft.functions.Stats.psi(
          Tables.load(s, dir, "lineitem").filter(col("l_returnflag").isin("A", "R")),
          "l_quantity",
          col("l_returnflag") === "A",
          bins = 20))
  }

  /** EXACT discrete quantiles of l_extendedprice at a 6-level grid in one
    * pass ([[graft.functions.Stats.exactQuantiles]]) — the zero-error
    * companion to `agg_tdigest`'s sketch tier. The cumulative ranks ride
    * the `ks2Samp` sharded kernel (distinct-value hash aggregate,
    * sortable-bits range shards, per-shard windows only — no global sort,
    * no one-task cliff), so the exact answer stays distributed at 100 TB.
    * Integer ranks + the same IEEE ⌈q·n⌉ in both engines → hash-exact,
    * no tolerance. The oracle replays the direct single-window cumulative.
    */
  val quantilesExact: Q = Q(
    "stat_quantiles_exact",
    Some("""WITH g AS (
           |  SELECT CAST(l_extendedprice AS DOUBLE) AS v, COUNT(*) AS c
           |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1),
           |c AS (
           |  SELECT v,
           |    SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS r,
           |    SUM(c) OVER () AS n
           |  FROM g),
           |qs AS (SELECT CAST(unnest([0.01, 0.25, 0.5, 0.75, 0.9, 0.99]) AS DOUBLE) AS q)
           |SELECT q, MIN(v) AS qv
           |FROM c CROSS JOIN qs
           |WHERE r >= CAST(CEIL(q * n) AS BIGINT)
           |GROUP BY q ORDER BY q""".stripMargin),
    (s, dir) =>
      graft.functions.Stats.exactQuantiles(
        Tables.load(s, dir, "lineitem"),
        "l_extendedprice",
        Seq(0.01, 0.25, 0.5, 0.75, 0.9, 0.99)))

  /** Chi-squared homogeneity of the l_returnflag CATEGORY mix between
    * the two l_linestatus slices — the categorical leg of the drift
    * family (`stat_ks_2samp` continuous, `stat_psi` binned, this one for
    * label/source/language mixes). One hash aggregate keyed by category,
    * totals re-aggregated from the ≤ #cats relation, decimal-routed χ²
    * sum — windowless end to end.
    */
  val chi2ReturnFlag: Q = {
    val eaS = "CAST(ca + cb AS DOUBLE) * na / (na + nb)"
    val ebS = "CAST(ca + cb AS DOUBLE) * nb / (na + nb)"
    Q(
      "stat_chi2",
      Some(s"""WITH g AS (
              |  SELECT l_returnflag AS c,
              |    SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS ca,
              |    SUM(CASE WHEN l_linestatus = 'O' THEN 0 ELSE 1 END) AS cb
              |  FROM lineitem GROUP BY l_returnflag),
              |t AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM g)
              |SELECT ROUND(${D.dsum(
                s"(ca - $eaS) * (ca - $eaS) / ($eaS) + (cb - $ebS) * (cb - $ebS) / ($ebS)")}, 6)
              |    AS chi2,
              |  COUNT(*) - 1 AS dof
              |FROM g CROSS JOIN t""".stripMargin),
      (s, dir) =>
        graft.functions.Stats.chi2Homogeneity(
          Tables.load(s, dir, "lineitem"),
          "l_returnflag",
          col("l_linestatus") === "O"))
  }

  /** One-way ANOVA F-statistic: does mean l_quantity differ across the
    * return-flag groups? The variance-decomposition leg of the drift
    * family (`stat_chi2` categorical mixes, `stat_ks_2samp` full
    * distributions, this one for MEANS across k slices). l_quantity is
    * integer-valued, so every moment (n, Σx, Σx²) is an exact BIGINT sum
    * in ONE conditional hash aggregate — no shuffle beyond the single
    * partial+final agg, constant output, linear in data at any scale.
    * The F tree (SSB/SSW over the fixed flag domain A,N,R) is one
    * literal left-associated IEEE expression evaluated from exact
    * integers, shared TEXT-identical with the oracle, so the statistic
    * is bit-exact unrounded.
    */
  val anovaQuantity: Q = {
    val flags = Seq("A", "N", "R")
    val moments = flags.flatMap { f =>
      Seq(
        s"CAST(SUM(CASE WHEN l_returnflag = '$f' THEN 1 ELSE 0 END) AS DOUBLE) AS n_$f",
        s"CAST(SUM(CASE WHEN l_returnflag = '$f' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS DOUBLE) AS s_$f",
        s"CAST(SUM(CASE WHEN l_returnflag = '$f' THEN CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) ELSE 0 END) AS DOUBLE) AS q_$f")
    }
    val t = flags.map(f => s"s_$f * s_$f / n_$f").mkString(" + ")
    val sTot = flags.map(f => s"s_$f").mkString(" + ")
    val nTot = flags.map(f => s"n_$f").mkString(" + ")
    val qTot = flags.map(f => s"q_$f").mkString(" + ")
    val ssb = s"($t) - ($sTot) * ($sTot) / ($nTot)"
    val ssw = s"($qTot) - ($t)"
    val df1 = (flags.size - 1).toDouble
    val fStat = s"(($ssb) / $df1) / (($ssw) / (($nTot) - ${flags.size}.0))"
    Q(
      "stat_anova",
      Some(s"""WITH m AS (SELECT
              |  ${moments.mkString(",\n  ")}
              |FROM lineitem)
              |SELECT $ssb AS ss_between, $ssw AS ss_within,
              |  CAST($df1 AS BIGINT) AS df_between,
              |  CAST(($nTot) - ${flags.size}.0 AS BIGINT) AS df_within,
              |  $fStat AS f_stat
              |FROM m""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .agg(expr(moments.head), moments.tail.map(expr): _*)
          .select(
            expr(ssb).as("ss_between"),
            expr(ssw).as("ss_within"),
            expr(s"CAST($df1 AS BIGINT)").as("df_between"),
            expr(s"CAST(($nTot) - ${flags.size}.0 AS BIGINT)").as("df_within"),
            expr(fStat).as("f_stat")))
  }

  /** Per-group Gini coefficient of price mass
    * ([[graft.functions.Stats.gini]]) — the concentration audit (a mix
    * pipeline's "is 1% of sources carrying 90% of tokens?" check, here
    * over l_extendedprice per return flag). Exact rank-formula Gini in
    * integer cent units on the STRATIFIED SHARDED cumulative kernel (no
    * group-wide window; broadcast shard offsets; decimal(38,0) rank-sum
    * moments). The oracle replays the single-window cumulative form with
    * HUGEINT moments — the hash match proves the sharded kernel
    * bit-equal on yet another statistic family.
    */
  val giniPrice: Q = Q(
    "stat_gini",
    Some("""WITH g AS (SELECT l_returnflag AS gf,
           |    CAST(FLOOR(CAST(l_extendedprice AS DOUBLE) * 100 + 0.5) AS BIGINT) AS c,
           |    COUNT(*) AS w
           |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1, 2),
           |c2 AS (SELECT gf, c, w,
           |    SUM(w) OVER (PARTITION BY gf ORDER BY c
           |      ROWS UNBOUNDED PRECEDING) AS cum FROM g),
           |m AS (SELECT gf, CAST(SUM(w) AS DOUBLE) AS n,
           |    CAST(CAST(SUM(CAST(c AS HUGEINT) * CAST(w AS HUGEINT)) AS VARCHAR) AS DOUBLE) AS s,
           |    CAST(CAST(SUM(CAST(c AS HUGEINT) *
           |      (2 * CAST(cum - w AS HUGEINT) * CAST(w AS HUGEINT)
           |       + CAST(w AS HUGEINT) * (CAST(w AS HUGEINT) + 1))) AS VARCHAR) AS DOUBLE) AS a2
           |  FROM c2 GROUP BY gf)
           |SELECT gf AS l_returnflag, CAST(n AS BIGINT) AS n,
           |  a2 / (n * s) - (n + 1.0) / n AS gini
           |FROM m""".stripMargin),
    (s, dir) =>
      graft.functions.Stats.gini(
        Tables.load(s, dir, "lineitem"), "l_returnflag", "l_extendedprice"))

  /** Grubbs' outlier statistic per return flag — "how extreme is the
    * most extreme price?" (the single-point-anomaly screen next to the
    * distribution-level KS/PSI family). Two passes, both windowless: the
    * exact-moment aggregate (mean/std from VARCHAR-routed decimal sums,
    * one fixed IEEE tree) and a broadcast-join MAX of |x − mean| — a max
    * is order-free by construction, so no decimal routing is needed
    * anywhere in pass 2.
    */
  val grubbsPrice: Q = {
    val mean = "sx / n"
    val std = s"SQRT((sxx - sx * sx / n) / (n - 1))"
    Q(
      "stat_grubbs",
      Some(s"""WITH m AS (SELECT l_returnflag, CAST(COUNT(*) AS DOUBLE) AS n,
              |    ${D.dsumExact("l_extendedprice")} AS sx,
              |    ${D.dsumExact("l_extendedprice * l_extendedprice")} AS sxx
              |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1),
              |s AS (SELECT l_returnflag, n, $mean AS mean, $std AS std FROM m),
              |d AS (SELECT l.l_returnflag,
              |    MAX(ABS(l.l_extendedprice - s.mean)) AS max_dev
              |  FROM lineitem l JOIN s ON l.l_returnflag = s.l_returnflag
              |  WHERE l.l_extendedprice IS NOT NULL
              |  GROUP BY 1)
              |SELECT s.l_returnflag, CAST(s.n AS BIGINT) AS n, s.mean AS mean,
              |  s.std AS std, d.max_dev AS max_dev, d.max_dev / s.std AS grubbs_g
              |FROM s JOIN d ON s.l_returnflag = d.l_returnflag""".stripMargin),
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
          .filter(col("l_extendedprice").isNotNull)
        val m = li.groupBy("l_returnflag").agg(
          count(lit(1)).cast("double").as("n"),
          graft.functions.DetAgg.dsum(col("l_extendedprice")).as("sx"),
          graft.functions.DetAgg.dsum(col("l_extendedprice") * col("l_extendedprice")).as("sxx"))
        val stats = m.select(
          col("l_returnflag"), col("n"),
          expr(mean).as("mean"), expr(std).as("std"))
        val dev = li
          .join(broadcast(stats.select(col("l_returnflag").as("__f"), col("mean"))),
            col("l_returnflag") === col("__f"))
          .groupBy("l_returnflag")
          .agg(max(abs(col("l_extendedprice") - col("mean"))).as("max_dev"))
        stats.join(dev, "l_returnflag")
          .select(
            col("l_returnflag"), col("n").cast("long").as("n"),
            col("mean"), col("std"), col("max_dev"),
            (col("max_dev") / col("std")).as("grubbs_g"))
      })
  }

  /** Benford first-digit profile of the price column — the forensic
    * data-quality screen (synthetic or truncated numeric feeds bend the
    * leading-digit curve long before summary stats move). The digit is
    * taken from the DECIMAL STRING of the exact integer cents — no
    * log10/pow round-trip, so there is no libm hazard anywhere — and the
    * Benford expectations are shared literal constants. One hash
    * aggregate to ≤ 9 rows.
    */
  val benfordPrice: Q = {
    val ps = (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d))
    Q(
      "stat_benford",
      Some(s"""WITH c AS (SELECT
              |    CAST(FLOOR(CAST(l_extendedprice AS DOUBLE) * 100 + 0.5) AS BIGINT) AS c
              |  FROM lineitem
              |  WHERE l_extendedprice IS NOT NULL AND l_extendedprice > 0),
              |d AS (SELECT CAST(SUBSTRING(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit,
              |    COUNT(*) AS n_obs
              |  FROM c GROUP BY 1),
              |t AS (SELECT SUM(n_obs) AS total FROM d),
              |p AS (SELECT * FROM (VALUES
              |    ${ps.map { case (d, p) => s"(CAST($d AS BIGINT), CAST('$p' AS DOUBLE))" }
                     .mkString(",\n    ")}) AS p(digit, benford_p))
              |SELECT d.digit, d.n_obs,
              |  CAST(d.n_obs AS DOUBLE) / t.total AS share, p.benford_p
              |FROM d CROSS JOIN t JOIN p ON p.digit = d.digit""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val c = Tables.load(s, dir, "lineitem")
          .filter(col("l_extendedprice").isNotNull && col("l_extendedprice") > 0)
          .select(floor(col("l_extendedprice").cast("double") * 100 + 0.5)
            .cast("long").as("c"))
        val d = c
          .select(substring(col("c").cast("string"), 1, 1).cast("long").as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("n_obs"))
        val t = d.agg(sum("n_obs").as("total"))
        val p = ps.toDF("digit", "benford_p")
          .select(col("digit").cast("long").as("digit"), col("benford_p"))
        d.crossJoin(broadcast(t))
          .join(broadcast(p), "digit")
          .select(col("digit"), col("n_obs"),
            (col("n_obs").cast("double") / col("total")).as("share"),
            col("benford_p"))
      })
  }

  /** ROC AUC of document length as a predictor of `lang = 'en'`
    * ([[graft.functions.Stats.auc]]) — the classifier acceptance gate a
    * curation pipeline runs before trusting a quality model's threshold
    * (does the score actually rank positives above negatives?). AUC is
    * computed as the midrank Mann–Whitney statistic `U₁/(n₁·n₂)` on the
    * SHARDED rank kernel — integer-exact doubled rank sums, ties at ½
    * credit, then a two-op IEEE tail — so the oracle's single-window
    * cumulative replay hash-matches with NO rounding, extending the
    * sharding-correctness proof to a third statistic family (U, ρ, AUC).
    */
  val aucLangLen: Q = Q(
    "stat_auc",
    Some("""WITH g AS (
           |  SELECT n_chars AS v,
           |    SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c1,
           |    SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS c2
           |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
           |c AS (
           |  SELECT c1, c2,
           |    SUM(c1 + c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS r
           |  FROM g),
           |t AS (
           |  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
           |    CAST(SUM(c1 * (2 * r - (c1 + c2) + 1)) AS BIGINT) AS r2x
           |  FROM c)
           |SELECT n1 AS n_pos, n2 AS n_neg,
           |  (CAST(r2x - n1 * (n1 + 1) AS DOUBLE) / 2.0)
           |    / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS auc
           |FROM t""".stripMargin),
    (s, dir) =>
      graft.functions.Stats.auc(
        Tables.load(s, dir, "documents"), "n_chars", col("lang") === "en"))

  /** Theil–Sen robust slope of l_discount against l_quantity — the
    * outlier-proof regression the a12 OLS family needs beside it (one
    * corrupted feed can't move a median of slopes). Pairwise slopes are
    * taken over the JOINT distinct relation (the [[kendallTau]]
    * bounded-cardinality contract — never row pairs), each slope
    * weighted by its pair mass `n_a·n_b`, and the weighted MEDIAN of
    * slopes rides the already-verified STRATIFIED sharded cumulative
    * ([[graft.functions.Stats.weightedMedian]]) — two proven kernels
    * composed, integer weights throughout, the slope itself one IEEE
    * division per bounded cell pair. Oracle = pair algebra + the
    * single-window weighted-median replay.
    */
  val theilSen: Q = Q(
    "stat_theil_sen",
    Some("""WITH j AS (
           |  SELECT CAST(l_quantity AS DOUBLE) AS x,
           |    CAST(l_discount AS DOUBLE) AS y, COUNT(*) AS c
           |  FROM lineitem
           |  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
           |  GROUP BY 1, 2),
           |p AS (
           |  SELECT (b.y - a.y) / (b.x - a.x) AS slope,
           |    CAST(a.c * b.c AS BIGINT) AS w
           |  FROM j a JOIN j b ON a.x < b.x),
           |g AS (SELECT slope AS v, CAST(SUM(w) AS BIGINT) AS w
           |  FROM p GROUP BY 1),
           |c AS (SELECT v,
           |    SUM(w) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
           |    SUM(w) OVER () AS tw FROM g),
           |t AS (SELECT CAST(SUM(w) AS BIGINT) AS n_pairs FROM p)
           |SELECT t.n_pairs, m.v AS theil_slope
           |FROM t CROSS JOIN
           |  (SELECT MIN(v) AS v FROM c WHERE 2 * cum >= tw) m""".stripMargin),
    (s, dir) =>
      graft.functions.Stats.theilSen(
        Tables.load(s, dir, "lineitem"), "l_quantity", "l_discount"))

  /** Mutual information (nats) between l_quantity and l_discount over
    * the bounded joint distinct relation — the feature-dependence score
    * a curation pipeline ranks columns by before training a filter
    * model (Pearson sees only linear structure; MI sees any). Same
    * kernel family as [[kendallTau]]: joint cells + broadcast margins,
    * every count exact, `Σ (c/n)·ln(c·n/(c_x·c_y))` on the DetAgg
    * decimal route with the round-6 divergence-family tail.
    */
  val mutualInfo: Q = {
    val term = "(CAST(c AS DOUBLE) / n) * LN(CAST(c AS DOUBLE) * n" +
      " / (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE)))"
    Q(
      "stat_mutual_info",
      Some(s"""WITH j AS (
              |  SELECT CAST(l_quantity AS DOUBLE) AS x,
              |    CAST(l_discount AS DOUBLE) AS y, COUNT(*) AS c
              |  FROM lineitem
              |  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
              |  GROUP BY 1, 2),
              |mx AS (SELECT x, CAST(SUM(c) AS BIGINT) AS cx FROM j GROUP BY x),
              |my AS (SELECT y, CAST(SUM(c) AS BIGINT) AS cy FROM j GROUP BY y),
              |t AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM j)
              |SELECT MIN(t.n) AS n, ROUND(${D.dsum(term)}, 6) AS mi_nats
              |FROM j JOIN mx USING (x) JOIN my USING (y) CROSS JOIN t""".stripMargin),
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
          .filter(col("l_quantity").isNotNull && col("l_discount").isNotNull)
        val j = li
          .groupBy(
            col("l_quantity").cast("double").as("x"),
            col("l_discount").cast("double").as("y"))
          .agg(count(lit(1)).as("c"))
        val mx = j.groupBy("x").agg(sum("c").as("cx"))
        val my = j.groupBy("y").agg(sum("c").as("cy"))
        val t = j.agg(sum("c").as("n"))
        j.join(broadcast(mx), "x").join(broadcast(my), "y")
          .crossJoin(broadcast(t))
          .agg(
            min("n").as("n"),
            round(graft.functions.DetAgg.dsum(
              (col("c").cast("double") / col("n")) *
                log(col("c").cast("double") * col("n")
                  / (col("cx").cast("double") * col("cy").cast("double")))), 6)
              .as("mi_nats"))
      })
  }

  /** Cohen's d (and small-sample Hedges' g) between the A and R return
    * flags on l_quantity — the EFFECT SIZE companion to
    * [[mannWhitney]]/[[anovaQuantity]] (a p-value says "different", d
    * says "by how much, in σ units" — what a drift runbook actually
    * thresholds on). Integer-valued column ⇒ all five moments are exact
    * BIGINTs from one conditional aggregate; d and g are a single
    * literal IEEE tree TEXT-shared with the oracle — hash-exact
    * unrounded.
    */
  val cohensD: Q = {
    val m1 = "(s1 / n1)"; val m2 = "(s2 / n2)"
    val sp = s"SQRT(((n1 - 1.0) * ((q1 - s1 * s1 / n1) / (n1 - 1.0))" +
      s" + (n2 - 1.0) * ((q2 - s2 * s2 / n2) / (n2 - 1.0))) / (n1 + n2 - 2.0))"
    val d = s"(($m1 - $m2) / $sp)"
    val g = s"($d * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)))"
    val moments =
      Seq("A" -> "1", "R" -> "2").flatMap { case (f, i) =>
        Seq(
          s"CAST(SUM(CASE WHEN l_returnflag = '$f' THEN 1 ELSE 0 END) AS DOUBLE) AS n$i",
          s"CAST(SUM(CASE WHEN l_returnflag = '$f' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS DOUBLE) AS s$i",
          s"CAST(SUM(CASE WHEN l_returnflag = '$f' THEN CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) ELSE 0 END) AS DOUBLE) AS q$i")
      }
    Q(
      "stat_cohens_d",
      Some(s"""WITH m AS (SELECT
              |  ${moments.mkString(",\n  ")}
              |FROM lineitem WHERE l_returnflag IN ('A', 'R'))
              |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
              |  $m1 AS mean1, $m2 AS mean2,
              |  $d AS cohens_d, $g AS hedges_g
              |FROM m""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .filter(col("l_returnflag").isin("A", "R"))
          .agg(expr(moments.head), moments.tail.map(expr): _*)
          .select(
            expr("CAST(n1 AS BIGINT)").as("n1"),
            expr("CAST(n2 AS BIGINT)").as("n2"),
            expr(m1).as("mean1"), expr(m2).as("mean2"),
            expr(d).as("cohens_d"), expr(g).as("hedges_g")))
  }

  /** Hill tail-index estimator over the top-1000 order statistics of
    * l_extendedprice — the heavy-tail profile (is the price/token/size
    * distribution power-law, and how fat?) that decides whether
    * mean-based budgets are even meaningful. The top-k cut is
    * TakeOrdered (distributed, no global sort — the w2 discipline; a
    * tie class at the boundary contributes the same VALUE multiset in
    * both engines, so the cut is hash-safe), x_min is the k-th order
    * statistic, and `α̂ = k / Σ ln(x_i/x_min)` rides the DetAgg route
    * with the round-6 ln tail.
    */
  val hillTail: Q = {
    val k = 1000
    Q(
      "stat_hill_tail",
      Some(s"""WITH t AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v
              |  FROM lineitem WHERE l_extendedprice IS NOT NULL
              |  ORDER BY v DESC LIMIT $k),
              |x AS (SELECT MIN(v) AS xmin FROM t),
              |s AS (SELECT ROUND(${D.dsum("LN(v / xmin)")}, 6) AS sl
              |  FROM t CROSS JOIN x)
              |SELECT CAST($k AS BIGINT) AS k, x.xmin,
              |  $k.0 / s.sl AS hill_alpha
              |FROM s CROSS JOIN x""".stripMargin),
      (s, dir) => {
        val t = Tables.load(s, dir, "lineitem")
          .filter(col("l_extendedprice").isNotNull)
          .select(col("l_extendedprice").cast("double").as("v"))
          .orderBy(col("v").desc).limit(k)
        val x = t.agg(min("v").as("xmin"))
        val sl = t.crossJoin(broadcast(x))
          .agg(round(graft.functions.DetAgg.dsum(log(col("v") / col("xmin"))), 6)
            .as("sl"))
        sl.crossJoin(broadcast(x))
          .select(
            lit(k.toLong).as("k"), col("xmin"),
            (lit(k.toDouble) / col("sl")).as("hill_alpha"))
      })
  }

  /** Normal QQ table of l_extendedprice at the j/20 grid — the PLOT
    * TABLE behind every QQ panel (the reference ships plot tables as
    * first-class sinks; this is the distribution-diagnostic one that
    * shows WHERE [[ks1Price]]'s D comes from). Observed quantiles ride
    * the exact sharded-quantile kernel, theoretical ones are
    * `μ̂ + σ̂·probit(q)` with the Acklam text and the Grubbs moment
    * formula — every machine already verified, composed into one
    * 19-row relation.
    */
  val qqNormal: Q = {
    val probs = (1 to 19).map(j => j / 20.0)
    Q(
      "stat_qq_normal",
      Some(s"""WITH s AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v
              |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
              |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              |    ${D.dsumExact("v")} AS sx, ${D.dsumExact("v * v")} AS sxx
              |  FROM s),
              |st AS (SELECT sx / n AS mean,
              |    SQRT((sxx - sx * sx / n) / (n - 1)) AS std FROM m),
              |g AS (SELECT v, COUNT(*) AS c FROM s GROUP BY v),
              |c AS (SELECT v,
              |    SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS r,
              |    SUM(c) OVER () AS n
              |  FROM g),
              |qs AS (SELECT CAST(unnest([${probs.mkString(", ")}]) AS DOUBLE) AS q)
              |SELECT q, MIN(v) AS observed,
              |  MIN(st.mean + st.std * ${graft.fit.ClosedForm.probitText("q")})
              |    AS theoretical
              |FROM c CROSS JOIN qs CROSS JOIN st
              |WHERE r >= CAST(CEIL(q * c.n) AS BIGINT)
              |GROUP BY q ORDER BY q""".stripMargin),
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
          .filter(col("l_extendedprice").isNotNull)
        val obs = graft.functions.Stats
          .exactQuantiles(li, "l_extendedprice", probs)
          .select(col("q"), col("qv").as("observed"))
        val src = li.select(col("l_extendedprice").cast("double").as("v"))
        val m = src.agg(
          count(lit(1)).as("n"),
          graft.functions.DetAgg.dsum(col("v")).as("sx"),
          graft.functions.DetAgg.dsum(col("v") * col("v")).as("sxx"))
        val st = m.select(
          (col("sx") / col("n")).as("mean"),
          sqrt((col("sxx") - col("sx") * col("sx") / col("n"))
            / (col("n") - lit(1))).as("std"))
        obs.crossJoin(broadcast(st))
          .select(
            col("q"), col("observed"),
            (col("mean") + col("std")
              * expr(graft.fit.ClosedForm.probitText("q"))).as("theoretical"))
          .orderBy("q")
      })
  }

  /** Kruskal–Wallis H across the three return flags on l_quantity — the
    * rank-based (distribution-free) ANOVA beside [[anovaQuantity]] (the
    * moment form assumes normal-ish groups; a mix monitor needs the
    * version one corrupted heavy tail can't fool). Per-(group, value)
    * rank cells come off the SHARDED cumulative kernel
    * ([[graft.functions.Stats.rankedCells]] — the [[aucLangLen]] /
    * [[mannWhitney]] machinery generalized to k samples), doubled
    * midrank sums and the tie term are exact BIGINTs, and H plus its
    * tie-corrected form are ONE literal IEEE tree with the group terms
    * in fixed textual order (A, N, R) — hash-exact unrounded. The
    * oracle replays the single-window cumulative, extending the
    * sharding-correctness proof to a fourth statistic family.
    */
  val kruskalWallis: Q = {
    val flags = Seq("A" -> "a", "N" -> "n", "R" -> "r")
    val ns = flags.map { case (f, s) =>
      s"CAST(SUM(CASE WHEN f = '$f' THEN c ELSE 0 END) AS BIGINT) AS n_$s"
    }
    val r2s = flags.map { case (f, s) =>
      s"CAST(SUM(CASE WHEN f = '$f' THEN c * (2 * r - ct + 1) ELSE 0 END) AS BIGINT) AS r2_$s"
    }
    val sumTerm = flags.map(_._2).map(s =>
      s"(CAST(r2_$s AS DOUBLE) * CAST(r2_$s AS DOUBLE) / 4.0) / CAST(n_$s AS DOUBLE)")
      .mkString("(", " + ", ")")
    val nd = "CAST(n AS DOUBLE)"
    val h = s"(12.0 / ($nd * ($nd + 1.0)) * $sumTerm - 3.0 * ($nd + 1.0))"
    val hAdj = s"($h / (1.0 - CAST(tt AS DOUBLE) / ($nd * $nd * $nd - $nd)))"
    Q(
      "stat_kruskal_wallis",
      Some(s"""WITH g AS (SELECT CAST(l_quantity AS DOUBLE) AS v,
              |    l_returnflag AS f, COUNT(*) AS c
              |  FROM lineitem
              |  WHERE l_quantity IS NOT NULL AND l_returnflag IS NOT NULL
              |  GROUP BY 1, 2),
              |bv AS (SELECT v, SUM(c) AS ct FROM g GROUP BY v),
              |cum AS (SELECT v, ct,
              |    SUM(ct) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS r
              |  FROM bv),
              |cells AS (SELECT f, c, ct, r FROM g JOIN cum USING (v)),
              |m AS (SELECT ${(ns ++ r2s).mkString(",\n  ")} FROM cells),
              |tv AS (SELECT CAST(SUM(ct * ct * ct - ct) AS BIGINT) AS tt,
              |    CAST(SUM(ct) AS BIGINT) AS n FROM bv)
              |SELECT n, CAST(2 AS BIGINT) AS df, $h AS h_stat,
              |  $hAdj AS h_tie_adj
              |FROM m CROSS JOIN tv""".stripMargin),
      (s, dir) => {
        val cells = graft.functions.Stats.rankedCells(
          Tables.load(s, dir, "lineitem"), "l_returnflag", "l_quantity")
          .select(
            col("__g").as("f"), col("__v").as("v"), col("__c").as("c"),
            col("__ct").as("ct"), col("__r").as("r"))
        val mRow = cells.agg(
          expr((ns ++ r2s).head), (ns ++ r2s).tail.map(expr): _*)
        val tv = cells.select("v", "ct").distinct().agg(
          expr("CAST(SUM(ct * ct * ct - ct) AS BIGINT)").as("tt"),
          expr("CAST(SUM(ct) AS BIGINT)").as("n"))
        mRow.crossJoin(broadcast(tv))
          .select(
            col("n"), lit(2L).as("df"),
            expr(h).as("h_stat"), expr(hAdj).as("h_tie_adj"))
      })
  }

  /** Dunn's post-hoc test — the pairwise layer OVER
    * [[kruskalWallis]] (an omnibus H only says SOME group differs;
    * Dunn's rank-sum z per pair, on the SAME global mid-ranks and tie
    * correction, says which): z_ij = (R̄_i − R̄_j) / √(V·(1/n_i + 1/n_j))
    * with V = N(N+1)/12 − Σ(t³−t)/(12(N−1)). Reuses the sharded
    * ranked-cells kernel verbatim; 2·ranksum per group is an exact
    * BIGINT (the 2r−ct+1 doubled mid-rank identity), so each pair's z
    * is one literal IEEE tree TEXT-shared with the oracle — hash-exact
    * unrounded, ≤ C(groups,2) output rows.
    */
  val dunnPosthoc: Q = {
    val flags = Seq("A" -> "a", "N" -> "n", "R" -> "r")
    val ns = flags.map { case (f, s) =>
      s"CAST(SUM(CASE WHEN f = '$f' THEN c ELSE 0 END) AS BIGINT) AS n_$s"
    }
    val r2s = flags.map { case (f, s) =>
      s"CAST(SUM(CASE WHEN f = '$f' THEN c * (2 * r - ct + 1) ELSE 0 END) AS BIGINT) AS r2_$s"
    }
    val nd = "CAST(n AS DOUBLE)"
    val varV =
      s"($nd * ($nd + 1.0) / 12.0 - CAST(tt AS DOUBLE) / (12.0 * ($nd - 1.0)))"
    def rbar(s: String) = s"CAST(r2_$s AS DOUBLE) / (2 * n_$s)"
    def zPair(i: String, j: String) =
      s"(${rbar(i)} - ${rbar(j)}) / SQRT($varV * " +
        s"(1.0 / CAST(n_$i AS DOUBLE) + 1.0 / CAST(n_$j AS DOUBLE)))"
    val pairRows = Seq(("A", "a", "N", "n"), ("A", "a", "R", "r"), ("N", "n", "R", "r"))
      .map { case (f1, s1, f2, s2) =>
        s"""SELECT '$f1' AS g1, '$f2' AS g2, n_$s1 AS n1, n_$s2 AS n2,
           |  ${zPair(s1, s2)} AS z FROM m CROSS JOIN tv""".stripMargin
      }.mkString("\nUNION ALL ")
    Q(
      "stat_dunn_posthoc",
      Some(s"""WITH g AS (SELECT CAST(l_quantity AS DOUBLE) AS v,
              |    l_returnflag AS f, COUNT(*) AS c
              |  FROM lineitem
              |  WHERE l_quantity IS NOT NULL AND l_returnflag IS NOT NULL
              |  GROUP BY 1, 2),
              |bv AS (SELECT v, SUM(c) AS ct FROM g GROUP BY v),
              |cum AS (SELECT v, ct,
              |    SUM(ct) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS r
              |  FROM bv),
              |cells AS (SELECT f, c, ct, r FROM g JOIN cum USING (v)),
              |m AS (SELECT ${(ns ++ r2s).mkString(",\n  ")} FROM cells),
              |tv AS (SELECT CAST(SUM(ct * ct * ct - ct) AS BIGINT) AS tt,
              |    CAST(SUM(ct) AS BIGINT) AS n FROM bv)
              |$pairRows
              |ORDER BY g1, g2""".stripMargin),
      (s, dir) => {
        val cells = graft.functions.Stats.rankedCells(
          Tables.load(s, dir, "lineitem"), "l_returnflag", "l_quantity")
          .select(
            col("__g").as("f"), col("__v").as("v"), col("__c").as("c"),
            col("__ct").as("ct"), col("__r").as("r"))
        val mRow = cells.agg(
          expr((ns ++ r2s).head), (ns ++ r2s).tail.map(expr): _*)
        val tv = cells.select("v", "ct").distinct().agg(
          expr("CAST(SUM(ct * ct * ct - ct) AS BIGINT)").as("tt"),
          expr("CAST(SUM(ct) AS BIGINT)").as("n"))
        val base = mRow.crossJoin(broadcast(tv))
        val rows = Seq(("A", "a", "N", "n"), ("A", "a", "R", "r"), ("N", "n", "R", "r"))
          .map { case (f1, s1, f2, s2) =>
            base.select(
              lit(f1).as("g1"), lit(f2).as("g2"),
              col(s"n_$s1").as("n1"), col(s"n_$s2").as("n2"),
              expr(zPair(s1, s2)).as("z"))
          }
        rows.reduce(_ unionByName _).orderBy("g1", "g2")
      })
  }

  /** Jarque–Bera normality statistic on l_quantity — the cheap
    * moment-based normality screen beside the exact-distribution
    * [[ks1Price]] (JB needs ONE aggregate pass; KS needs the full ECDF):
    * `JB = n/6·(g₁² + g₂²/4)` from sample skewness and excess kurtosis.
    * The column is integer-valued, so all four raw power sums are exact
    * BIGINTs from a single aggregate, and the central-moment /
    * skew/kurtosis algebra is one literal IEEE tree TEXT-shared with the
    * oracle — hash-exact unrounded.
    */
  val jarqueBera: Q = {
    val moments = Seq(
      "CAST(COUNT(*) AS DOUBLE) AS n",
      "CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s1",
      "CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s2",
      "CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s3",
      "CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s4")
    val m1 = "(s1 / n)"
    val m2 = s"(s2 / n - $m1 * $m1)"
    val m3 = s"(s3 / n - 3.0 * $m1 * (s2 / n) + 2.0 * $m1 * $m1 * $m1)"
    val m4 = s"(s4 / n - 4.0 * $m1 * (s3 / n)" +
      s" + 6.0 * $m1 * $m1 * (s2 / n) - 3.0 * $m1 * $m1 * $m1 * $m1)"
    val g1 = s"($m3 / ($m2 * SQRT($m2)))"
    val g2 = s"($m4 / ($m2 * $m2) - 3.0)"
    val jb = s"(n / 6.0 * ($g1 * $g1 + $g2 * $g2 / 4.0))"
    Q(
      "stat_jarque_bera",
      Some(s"""WITH m AS (SELECT ${moments.mkString(",\n  ")}
              |  FROM lineitem WHERE l_quantity IS NOT NULL)
              |SELECT CAST(n AS BIGINT) AS n, $g1 AS skewness,
              |  $g2 AS excess_kurtosis, $jb AS jb_stat
              |FROM m""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .filter(col("l_quantity").isNotNull)
          .agg(expr(moments.head), moments.tail.map(expr): _*)
          .select(
            expr("CAST(n AS BIGINT)").as("n"),
            expr(g1).as("skewness"),
            expr(g2).as("excess_kurtosis"),
            expr(jb).as("jb_stat")))
  }

  /** Cohen's κ between two binary raters — chance-corrected agreement,
    * the standard acceptance check before trusting redundant quality
    * gates (two filters that agree 90% of the time are WORSE than
    * useless if chance alone predicts 89%). Raters here: the discount
    * gate `l_discount ≥ 0.05` and the tax gate `l_tax ≥ 0.04` — two
    * independent per-row predicates whose 2×2 contingency comes from ONE
    * conditional aggregate of exact BIGINTs; κ = (p_o − p_e)/(1 − p_e)
    * is a literal IEEE tree TEXT-shared with the oracle — hash-exact
    * unrounded.
    */
  val cohenKappa: Q = {
    val r1 = "(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END)"
    val r2 = "(CASE WHEN l_tax >= 0.04 THEN 1 ELSE 0 END)"
    val cs = Seq(
      s"CAST(SUM($r1 * $r2) AS DOUBLE) AS c11",
      s"CAST(SUM($r1 * (1 - $r2)) AS DOUBLE) AS c10",
      s"CAST(SUM((1 - $r1) * $r2) AS DOUBLE) AS c01",
      s"CAST(SUM((1 - $r1) * (1 - $r2)) AS DOUBLE) AS c00")
    val n = "(c11 + c10 + c01 + c00)"
    val po = s"((c11 + c00) / $n)"
    val pe = s"(((c11 + c10) / $n) * ((c11 + c01) / $n)" +
      s" + ((c01 + c00) / $n) * ((c10 + c00) / $n))"
    val kappa = s"(($po - $pe) / (1.0 - $pe))"
    Q(
      "stat_cohen_kappa",
      Some(s"""WITH m AS (SELECT ${cs.mkString(",\n  ")}
              |  FROM lineitem
              |  WHERE l_discount IS NOT NULL AND l_tax IS NOT NULL)
              |SELECT CAST($n AS BIGINT) AS n, $po AS p_observed,
              |  $pe AS p_chance, $kappa AS kappa
              |FROM m""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .filter(col("l_discount").isNotNull && col("l_tax").isNotNull)
          .agg(expr(cs.head), cs.tail.map(expr): _*)
          .select(
            expr(s"CAST($n AS BIGINT)").as("n"),
            expr(po).as("p_observed"),
            expr(pe).as("p_chance"),
            expr(kappa).as("kappa")))
  }

  /** First-order partial correlation r(quantity, price | discount) — is
    * the quantity↔price association real, or routed through the
    * discount both respond to? The control-variable question
    * [[graft.queries.GroupingQueries]]'s raw correlation matrix
    * (`a13_corr_matrix`) cannot answer. All ten moments ride the exact
    * decimal route in ONE aggregate; the three pairwise r's and the
    * partial are one literal IEEE tree — hash-exact unrounded.
    */
  val partialCorr: Q = {
    val cols = Seq("x" -> "l_quantity", "y" -> "l_extendedprice", "z" -> "l_discount")
    val moments =
      Seq("CAST(COUNT(*) AS DOUBLE) AS n") ++
        cols.map { case (a, c) => s"${D.dsumExact(c)} AS s$a" } ++
        cols.map { case (a, c) => s"${D.dsumExact(s"$c * $c")} AS s$a$a" } ++
        Seq(
          s"${D.dsumExact("l_quantity * l_extendedprice")} AS sxy",
          s"${D.dsumExact("l_quantity * l_discount")} AS sxz",
          s"${D.dsumExact("l_extendedprice * l_discount")} AS syz")
    def r(p: String) = {
      val (a, b) = (p(0).toString, p(1).toString)
      s"((n * s$p - s$a * s$b) / (SQRT(n * s$a$a - s$a * s$a) * SQRT(n * s$b$b - s$b * s$b)))"
    }
    val partial = s"((${r("xy")} - ${r("xz")} * ${r("yz")})" +
      s" / SQRT((1.0 - ${r("xz")} * ${r("xz")}) * (1.0 - ${r("yz")} * ${r("yz")})))"
    Q(
      "stat_partial_corr",
      Some(s"""WITH m AS (SELECT ${moments.mkString(",\n  ")}
              |  FROM lineitem
              |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
              |    AND l_discount IS NOT NULL)
              |SELECT CAST(n AS BIGINT) AS n, ${r("xy")} AS r_xy,
              |  ${r("xz")} AS r_xz, ${r("yz")} AS r_yz,
              |  $partial AS partial_r
              |FROM m""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .filter(col("l_quantity").isNotNull && col("l_extendedprice").isNotNull
            && col("l_discount").isNotNull)
          .agg(expr(sqlToSpark(moments.head)),
            moments.tail.map(m => expr(sqlToSpark(m))): _*)
          .select(
            expr("CAST(n AS BIGINT)").as("n"),
            expr(r("xy")).as("r_xy"),
            expr(r("xz")).as("r_xz"),
            expr(r("yz")).as("r_yz"),
            expr(partial).as("partial_r")))
  }

  /** DuckDB's VARCHAR-routed decimal cast is an oracle-side-only crutch —
    * the Spark side uses the plain decimal cast (Decimal.toDouble is
    * already correctly rounded). This rewrites the oracle moment text to
    * the Spark form so both sides stay ONE generated list.
    */
  private def sqlToSpark(m: String): String =
    m.replace("CAST(CAST(SUM(", "CAST(SUM(")
      .replace(") AS VARCHAR) AS DOUBLE)", ") AS DOUBLE)")

  /** Gumbel fit of the daily block maxima of l_extendedprice (method of
    * moments) — extreme-value analysis: "how big a price spike should a
    * capacity plan expect?" pairs with [[hillTail]]'s tail index (Hill
    * asks how heavy the tail is; Gumbel calibrates the block-maximum
    * law). Blocks = ship-days (calendar-bounded); maxima are one hash
    * aggregate; β = s·√6/π and μ = m − γβ use the Euler–Mascheroni and
    * √6/π constants as LITERALS (the Acklam discipline — nothing
    * transcendental is ever EVALUATED), so the whole estimate is a fixed
    * IEEE tree over exact-decimal moments — hash-exact unrounded.
    */
  val gumbelMaxima: Q = {
    val sqrt6OverPi = "0.7796968012336609"
    val gamma = "0.5772156649015329"
    val beta = s"(SQRT((sxx - sx * sx / n) / (n - 1.0)) * $sqrt6OverPi)"
    val mu = s"(sx / n - $gamma * $beta)"
    Q(
      "stat_gumbel_maxima",
      Some(s"""WITH b AS (SELECT CAST(epoch(l_shipdate) AS BIGINT) // 86400 AS day,
              |    MAX(CAST(l_extendedprice AS DOUBLE)) AS mx
              |  FROM lineitem
              |  WHERE l_extendedprice IS NOT NULL AND l_shipdate IS NOT NULL
              |  GROUP BY 1),
              |m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
              |    ${D.dsumExact("mx")} AS sx, ${D.dsumExact("mx * mx")} AS sxx
              |  FROM b)
              |SELECT CAST(n AS BIGINT) AS n_blocks, $beta AS gumbel_beta,
              |  $mu AS gumbel_mu
              |FROM m""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .filter(col("l_extendedprice").isNotNull && col("l_shipdate").isNotNull)
          .groupBy(expr("CAST(unix_timestamp(l_shipdate) AS BIGINT) div 86400")
            .as("day"))
          .agg(max(col("l_extendedprice").cast("double")).as("mx"))
          .agg(
            count(lit(1)).cast("double").as("n"),
            DetAgg.dsum(col("mx")).as("sx"),
            DetAgg.dsum(col("mx") * col("mx")).as("sxx"))
          .select(
            expr("CAST(n AS BIGINT)").as("n_blocks"),
            expr(beta).as("gumbel_beta"),
            expr(mu).as("gumbel_mu")))
  }

  /** Sample-ratio-mismatch check of the deterministic 50/50 A/B
    * assignment — the pre-flight every experimentation platform runs
    * before trusting a metric delta (an SRM means the BUCKETING is
    * broken, and every downstream inference with it). Assignment is the
    * Knuth-priority portable hash (the [[graft.operators.Splits]]
    * family) mod 2 on l_orderkey, so the whole check is one conditional
    * aggregate; χ² against the 50/50 null is (n₀−n₁)²/(n₀+n₁), flagged
    * at the 1-df 95 % critical value — hash-exact.
    */
  val srmCheck: Q = {
    val bucket = "((l_orderkey + 7) % 100000 * 2654435761 % 4294967296 % 2)"
    val chi2 = "((CAST(n0 AS DOUBLE) - n1) * (CAST(n0 AS DOUBLE) - n1)" +
      " / (CAST(n0 AS DOUBLE) + n1))"
    Q(
      "stat_srm_check",
      Some(s"""WITH m AS (SELECT
              |    CAST(SUM(CASE WHEN $bucket = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
              |    CAST(SUM(CASE WHEN $bucket = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
              |  FROM lineitem WHERE l_orderkey IS NOT NULL)
              |SELECT n0, n1, $chi2 AS chi2,
              |  $chi2 > 3.841458820694124 AS srm_detected
              |FROM m""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .filter(col("l_orderkey").isNotNull)
          .agg(
            expr(s"CAST(SUM(CASE WHEN $bucket = 0 THEN 1 ELSE 0 END) AS BIGINT)")
              .as("n0"),
            expr(s"CAST(SUM(CASE WHEN $bucket = 1 THEN 1 ELSE 0 END) AS BIGINT)")
              .as("n1"))
          .select(
            col("n0"), col("n1"), expr(chi2).as("chi2"),
            (expr(chi2) > lit(3.841458820694124)).as("srm_detected")))
  }

  /** Tukey-fence outlier census per return flag: exact per-group type-1
    * quartiles from the STRATIFIED sharded kernel
    * ([[graft.functions.Stats.weightedQuartiles]], weight 1), fences
    * q1 ∓ 1.5·IQR as one fixed IEEE tree, and the census one conditional
    * aggregate against the broadcast ≤groups-row fence relation — the
    * box-plot outlier rule as a scalable report. Hash-exact unrounded.
    */
  val tukeyFences: Q = Q(
    "stat_tukey_fences",
    Some("""WITH g AS (SELECT l_returnflag AS gf, CAST(l_extendedprice AS DOUBLE) AS v,
           |    COUNT(*) AS w
           |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1, 2),
           |c AS (SELECT gf, v,
           |    SUM(w) OVER (PARTITION BY gf ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
           |    SUM(w) OVER (PARTITION BY gf) AS tw FROM g),
           |qs AS (SELECT gf,
           |    MIN(CASE WHEN 4 * cum >= tw THEN v END) AS q1,
           |    MIN(CASE WHEN 4 * cum >= 3 * tw THEN v END) AS q3
           |  FROM c GROUP BY gf),
           |f AS (SELECT gf, q1, q3,
           |    q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi FROM qs)
           |SELECT f.gf AS l_returnflag, q1, q3,
           |  CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(SUM(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_low,
           |  CAST(SUM(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_high
           |FROM lineitem JOIN f ON l_returnflag = f.gf
           |WHERE l_extendedprice IS NOT NULL
           |GROUP BY 1, 2, 3""".stripMargin),
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_extendedprice").isNotNull)
      val qs = graft.functions.Stats.weightedQuartiles(
        li, "l_returnflag", "l_extendedprice", lit(1L))
        .groupBy(col("l_returnflag").as("gf"))
        .agg(
          min(when(col("q") === 0.25, col("wq_l_extendedprice"))).as("q1"),
          min(when(col("q") === 0.75, col("wq_l_extendedprice"))).as("q3"))
      val f = qs.select(
        col("gf"), col("q1"), col("q3"),
        (col("q1") - lit(1.5) * (col("q3") - col("q1"))).as("lo"),
        (col("q3") + lit(1.5) * (col("q3") - col("q1"))).as("hi"))
      li.join(broadcast(f), col("l_returnflag") === col("gf"))
        .groupBy(col("l_returnflag"), col("q1"), col("q3"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("l_extendedprice") < col("lo"), 1L).otherwise(0L))
            .as("n_low"),
          sum(when(col("l_extendedprice") > col("hi"), 1L).otherwise(0L))
            .as("n_high"))
    })

  /** Cochran's Q across THREE binary gates (discount ≥ 0.05, tax ≥ 0.04,
    * quantity > 25) — the k-treatment generalization of [[mcnemar]]:
    * do the gates fire at the same marginal rate on the same rows?
    * Q = k(k−1)·Σⱼ(Cⱼ − T/k)² / (k·T − Σᵢ Rᵢ²) where Cⱼ are gate totals,
    * Rᵢ the per-row gate counts, T = ΣRᵢ. Per-row R ∈ {0..3} makes ΣRᵢ²
    * a conditional sum of squares — everything is ONE aggregate of exact
    * BIGINTs and one literal IEEE tree. Hash-exact unrounded.
    */
  val cochranQ: Q = {
    val gs = Seq(
      "(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END)",
      "(CASE WHEN l_tax >= 0.04 THEN 1 ELSE 0 END)",
      "(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END)")
    val k = gs.size
    val r = gs.mkString("(", " + ", ")")
    val cSums = gs.zipWithIndex.map { case (g, j) =>
      s"CAST(SUM($g) AS BIGINT) AS c$j"
    }
    val moments = cSums ++ Seq(
      s"CAST(SUM($r) AS BIGINT) AS t",
      s"CAST(SUM($r * $r) AS BIGINT) AS r2",
      "CAST(COUNT(*) AS BIGINT) AS n")
    val num = (0 until k)
      .map(j => s"(c$j - CAST(t AS DOUBLE) / $k) * (c$j - CAST(t AS DOUBLE) / $k)")
      .mkString("(", " + ", ")")
    // the denominator k·T − ΣR² is zero exactly when every row fires all
    // gates or none (no discordance) — Q is undefined there; both
    // engines emit NULL rather than ANSI-throwing / NaN-diverging
    val q = s"(CASE WHEN $k.0 * t - r2 = 0.0 THEN NULL" +
      s" ELSE $k.0 * ${k - 1}.0 * $num / ($k.0 * t - r2) END)"
    Q(
      "stat_cochran_q",
      Some(s"""WITH m AS (SELECT ${moments.mkString(",\n  ")}
              |  FROM lineitem
              |  WHERE l_discount IS NOT NULL AND l_tax IS NOT NULL
              |    AND l_quantity IS NOT NULL)
              |SELECT n, CAST(${k - 1} AS BIGINT) AS df, $q AS cochran_q
              |FROM m""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .filter(col("l_discount").isNotNull && col("l_tax").isNotNull
            && col("l_quantity").isNotNull)
          .agg(expr(moments.head), moments.tail.map(expr): _*)
          .select(col("n"), lit((k - 1).toLong).as("df"), expr(q).as("cochran_q")))
  }

  /** Decile concentration report of l_extendedprice
    * ([[graft.functions.Stats.decileReport]]) — the Lorenz table beside
    * the scalar [[giniPrice]]/[[theilIndex]]: per rank-decile row counts
    * and value shares, straddling distinct values split exactly (the
    * trimmed-mean algebra at all ten slices). Hash-exact unrounded.
    */
  val decileReport: Q = Q(
    "stat_decile_report",
    Some("""WITH g AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v, COUNT(*) AS c
           |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1),
           |cum AS (SELECT v, c,
           |    SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS r,
           |    SUM(c) OVER () AS n
           |  FROM g),
           |t AS (SELECT CAST(CAST(SUM(CAST(v AS DECIMAL(30,6)) * c) AS VARCHAR)
           |    AS DOUBLE) AS tot FROM g),
           |d AS (SELECT decile, v,
           |    GREATEST(LEAST(r, decile * n // 10)
           |      - GREATEST(r - c, (decile - 1) * n // 10), 0) AS kept
           |  FROM cum CROSS JOIN (SELECT unnest(generate_series(1, 10)) AS decile)),
           |s AS (SELECT CAST(decile AS BIGINT) AS decile,
           |    CAST(SUM(kept) AS BIGINT) AS n_rows,
           |    CAST(CAST(SUM(CAST(v AS DECIMAL(30,6)) * kept) AS VARCHAR)
           |      AS DOUBLE) AS sum_value
           |  FROM d GROUP BY 1)
           |SELECT decile, n_rows, sum_value, sum_value / tot AS share
           |FROM s CROSS JOIN t""".stripMargin),
    (s, dir) =>
      graft.functions.Stats.decileReport(
        Tables.load(s, dir, "lineitem"), "l_extendedprice"))

  /** Theil T inequality index of l_extendedprice — the
    * information-theoretic companion to [[giniPrice]] (Gini weights the
    * middle of the distribution; Theil the top, and Theil DECOMPOSES
    * additively across subgroups, which Gini cannot). T = (1/n)·Σ
    * (x/μ)·ln(x/μ): the mean rides the exact-decimal route and
    * broadcasts; each row's transcendental term carries round-6 (the
    * LM-score discipline — per-row magnitude is O(x/μ·ln), bounded well
    * inside the decimal grid's exact-cast range) and sums through the
    * exact decimal — hash-exact.
    */
  val theilIndex: Q = Q(
    "stat_theil_index",
    Some(s"""WITH s AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x
            |  FROM lineitem
            |  WHERE l_extendedprice IS NOT NULL AND l_extendedprice > 0),
            |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
            |    ${D.dsumExact("x")} / COUNT(*) AS mu FROM s),
            |t AS (SELECT n, mu,
            |    ${D.dsum("ROUND(x / mu * LN(x / mu), 6)")} AS ts
            |  FROM s CROSS JOIN m GROUP BY n, mu)
            |SELECT n, mu AS mean, ts / n AS theil_t FROM t""".stripMargin),
    (s, dir) => {
      val src = Tables.load(s, dir, "lineitem")
        .filter(col("l_extendedprice").isNotNull && col("l_extendedprice") > 0)
        .select(col("l_extendedprice").cast("double").as("x"))
      val m = src.agg(
        count(lit(1)).as("n"),
        (DetAgg.dsum(col("x")) / count(lit(1))).as("mu"))
      src.crossJoin(broadcast(m))
        .groupBy(col("n"), col("mu"))
        .agg(DetAgg.dsum(
          round(col("x") / col("mu") * log(col("x") / col("mu")), 6)).as("ts"))
        .select(col("n"), col("mu").as("mean"), (col("ts") / col("n")).as("theil_t"))
    })

  /** 10 %-trimmed mean of l_extendedprice
    * ([[graft.functions.Stats.trimmedMean]]) — the robust location
    * estimate between mean and median, on the sharded cumulative kernel:
    * exactly ⌊0.1·n⌋ observations drop from each end BY RANK, a
    * straddling distinct value keeps its exact surviving multiplicity
    * (pure integer algebra on cumulative counts — no global sort), and
    * the trimmed sum is an exact decimal product sum. One IEEE division
    * — hash-exact unrounded.
    */
  val trimmedMean: Q = Q(
    "stat_trimmed_mean",
    Some("""WITH g AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v, COUNT(*) AS c
           |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1),
           |cum AS (SELECT v, c,
           |    SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS r,
           |    SUM(c) OVER () AS n
           |  FROM g),
           |kk AS (SELECT v, c, r, n, CAST(FLOOR(0.1 * n) AS BIGINT) AS k FROM cum),
           |kept AS (SELECT v, n, k,
           |    GREATEST(LEAST(r, n - k) - GREATEST(r - c, k), 0) AS kc
           |  FROM kk)
           |SELECT CAST(n AS BIGINT) AS n, k AS k_trimmed,
           |  CAST(CAST(SUM(CAST(v AS DECIMAL(30,6)) * kc) AS VARCHAR) AS DOUBLE)
           |    / SUM(kc) AS trimmed_mean
           |FROM kept GROUP BY n, k""".stripMargin),
    (s, dir) =>
      graft.functions.Stats.trimmedMean(
        Tables.load(s, dir, "lineitem"), "l_extendedprice", alpha = 0.1))

  /** Bartlett's test of equal variances across the return flags — the
    * parametric leg beside the robust [[brownForsythe]] (B-F survives
    * non-normality; Bartlett is the more powerful classic when the
    * normality gate — [[ks1Price]]/[[jarqueBera]] — passes). Group
    * variances come from exact BIGINT power sums of the integer-valued
    * quantity; the k = 3 group terms fold through FIXED conditional
    * chains (the stat_anova discipline — no order-dependent sum), lns
    * carry round-6 (the Acklam transcendental rule), and the correction
    * factor C is one literal IEEE tree — hash-exact.
    */
  val bartlett: Q = {
    val flags = Seq("A", "N", "R")
    def moms(f: String) = Seq(
      s"CAST(SUM(CASE WHEN l_returnflag = '$f' THEN 1 ELSE 0 END) AS DOUBLE) AS n_$f",
      s"CAST(SUM(CASE WHEN l_returnflag = '$f' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS DOUBLE) AS s1_$f",
      s"CAST(SUM(CASE WHEN l_returnflag = '$f' THEN CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) ELSE 0 END) AS DOUBLE) AS s2_$f")
    val ms = flags.flatMap(moms)
    def varOf(f: String) = s"((s2_$f - s1_$f * s1_$f / n_$f) / (n_$f - 1.0))"
    val nTot = flags.map(f => s"n_$f").mkString("(", " + ", ")")
    val k = flags.size
    val pooledNum = flags.map(f => s"(n_$f - 1.0) * ${varOf(f)}")
      .mkString("(", " + ", ")")
    val sp2 = s"($pooledNum / ($nTot - $k.0))"
    val sumLn = flags.map(f => s"(n_$f - 1.0) * ROUND(LN(${varOf(f)}), 6)")
      .mkString("(", " + ", ")")
    val tNum = s"(($nTot - $k.0) * ROUND(LN($sp2), 6) - $sumLn)"
    val invSum = flags.map(f => s"1.0 / (n_$f - 1.0)").mkString("(", " + ", ")")
    val cFac = s"(1.0 + ($invSum - 1.0 / ($nTot - $k.0)) / ${3 * (k - 1)}.0)"
    Q(
      "stat_bartlett",
      Some(s"""WITH m AS (SELECT ${ms.mkString(",\n  ")}
              |  FROM lineitem
              |  WHERE l_quantity IS NOT NULL AND l_returnflag IS NOT NULL)
              |SELECT CAST($nTot AS BIGINT) AS n, CAST(${k - 1} AS BIGINT) AS df,
              |  $tNum / $cFac AS bartlett_t
              |FROM m""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .filter(col("l_quantity").isNotNull && col("l_returnflag").isNotNull)
          .agg(expr(ms.head), ms.tail.map(expr): _*)
          .select(
            expr(s"CAST($nTot AS BIGINT)").as("n"),
            lit((k - 1).toLong).as("df"),
            expr(s"$tNum / $cFac").as("bartlett_t")))
  }

  /** McNemar's test on the paired binary gates (discount ≥ 0.05 vs tax
    * ≥ 0.04 — the [[cohenKappa]] raters asked a DIFFERENT question: κ
    * measures agreement, McNemar marginal homogeneity — "does one gate
    * fire systematically more than the other on the same rows?", which
    * agreement alone cannot see). Only the discordant cells enter:
    * χ² = (b − c)²/(b + c), plus the Edwards continuity-corrected form.
    * Exact integer cells from ONE conditional aggregate, two literal
    * IEEE trees — hash-exact unrounded.
    */
  val mcnemar: Q = {
    val r1 = "(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END)"
    val r2 = "(CASE WHEN l_tax >= 0.04 THEN 1 ELSE 0 END)"
    val chi2 = "((CAST(b AS DOUBLE) - c) * (CAST(b AS DOUBLE) - c)" +
      " / (CAST(b AS DOUBLE) + c))"
    val chi2cc = "((ABS(CAST(b AS DOUBLE) - c) - 1.0) * (ABS(CAST(b AS DOUBLE) - c) - 1.0)" +
      " / (CAST(b AS DOUBLE) + c))"
    Q(
      "stat_mcnemar",
      Some(s"""WITH m AS (SELECT
              |    CAST(COUNT(*) AS BIGINT) AS n,
              |    CAST(SUM($r1 * (1 - $r2)) AS BIGINT) AS b,
              |    CAST(SUM((1 - $r1) * $r2) AS BIGINT) AS c
              |  FROM lineitem
              |  WHERE l_discount IS NOT NULL AND l_tax IS NOT NULL)
              |SELECT n, b, c, $chi2 AS chi2, $chi2cc AS chi2_cc
              |FROM m""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .filter(col("l_discount").isNotNull && col("l_tax").isNotNull)
          .agg(
            count(lit(1)).as("n"),
            expr(s"CAST(SUM($r1 * (1 - $r2)) AS BIGINT)").as("b"),
            expr(s"CAST(SUM((1 - $r1) * $r2) AS BIGINT)").as("c"))
          .select(
            col("n"), col("b"), col("c"),
            expr(chi2).as("chi2"), expr(chi2cc).as("chi2_cc")))
  }

  /** Odds ratio with the Woolf 95 % CI for the same 2×2 (the effect-SIZE
    * companion to [[mcnemar]]/[[cohenKappa]]'s tests — "how much more
    * likely is the tax gate to fire when the discount gate does").
    * Cell products ride decimal(38,0) (HUGEINT-VARCHAR on the oracle —
    * the assortativity route: at corpus scale c11·c00 passes 2⁶³), the
    * ratio is one IEEE division of correctly-rounded exact products;
    * ln/exp tails carry round-6 (the Acklam discipline).
    */
  val oddsRatio: Q = {
    val r1 = "(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END)"
    val r2 = "(CASE WHEN l_tax >= 0.04 THEN 1 ELSE 0 END)"
    val se = "SQRT(1.0 / c11 + 1.0 / c10 + 1.0 / c01 + 1.0 / c00)"
    Q(
      "stat_odds_ratio",
      Some(s"""WITH m AS (SELECT
              |    CAST(SUM($r1 * $r2) AS BIGINT) AS c11,
              |    CAST(SUM($r1 * (1 - $r2)) AS BIGINT) AS c10,
              |    CAST(SUM((1 - $r1) * $r2) AS BIGINT) AS c01,
              |    CAST(SUM((1 - $r1) * (1 - $r2)) AS BIGINT) AS c00
              |  FROM lineitem
              |  WHERE l_discount IS NOT NULL AND l_tax IS NOT NULL),
              |d AS (SELECT c11, c10, c01, c00,
              |    CAST(CAST(CAST(c11 AS HUGEINT) * CAST(c00 AS HUGEINT) AS VARCHAR) AS DOUBLE)
              |      / CAST(CAST(CAST(c10 AS HUGEINT) * CAST(c01 AS HUGEINT) AS VARCHAR) AS DOUBLE)
              |      AS odds_ratio
              |  FROM m),
              |l AS (SELECT c11, c10, c01, c00, odds_ratio,
              |    ROUND(LN(odds_ratio), 6) AS log_or FROM d)
              |SELECT c11, c10, c01, c00, odds_ratio, log_or,
              |  ROUND(EXP(log_or - 1.96 * $se), 6) AS ci_lo,
              |  ROUND(EXP(log_or + 1.96 * $se), 6) AS ci_hi
              |FROM l""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.types.DecimalType
        val d38 = DecimalType(38, 0)
        Tables.load(s, dir, "lineitem")
          .filter(col("l_discount").isNotNull && col("l_tax").isNotNull)
          .agg(
            expr(s"CAST(SUM($r1 * $r2) AS BIGINT)").as("c11"),
            expr(s"CAST(SUM($r1 * (1 - $r2)) AS BIGINT)").as("c10"),
            expr(s"CAST(SUM((1 - $r1) * $r2) AS BIGINT)").as("c01"),
            expr(s"CAST(SUM((1 - $r1) * (1 - $r2)) AS BIGINT)").as("c00"))
          .select(
            col("c11"), col("c10"), col("c01"), col("c00"),
            ((col("c11").cast(d38) * col("c00").cast(d38)).cast("double")
              / (col("c10").cast(d38) * col("c01").cast(d38)).cast("double"))
              .as("odds_ratio"))
          .withColumn("log_or", round(log(col("odds_ratio")), 6))
          .select(
            col("c11"), col("c10"), col("c01"), col("c00"),
            col("odds_ratio"), col("log_or"),
            round(exp(col("log_or") - lit(1.96) * expr(se)), 6).as("ci_lo"),
            round(exp(col("log_or") + lit(1.96) * expr(se)), 6).as("ci_hi"))
      })
  }

  /** One-sample KS against the fitted normal on l_extendedprice
    * ([[graft.functions.Stats.ks1Samp]]) — the normality pre-flight for
    * every analysis that assumes a Gaussian (z-scores, Grubbs, the σ
    * envelopes). Exercises three shared machines at once: the Grubbs
    * exact-moment μ̂/σ̂ text, the ks2Samp sharded ECDF kernel, and the
    * Abramowitz–Stegun Φ as ONE text in both engines (the Acklam-probit
    * discipline — approximation constants are literals, so the
    * approximation cancels in the comparison; round-6 absorbs EXP's
    * last-ulp). Both sides of every ECDF step enter the max — the
    * textbook D, not the one-sided shortcut.
    */
  val ks1Price: Q = {
    val phi = graft.fit.ClosedForm.normalCdfText("((v - st.mean) / st.std)")
    Q(
      "stat_ks_1samp",
      Some(s"""WITH s AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v
              |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
              |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              |    ${D.dsumExact("v")} AS sx, ${D.dsumExact("v * v")} AS sxx
              |  FROM s),
              |st AS (SELECT n, sx / n AS mean,
              |    SQRT((sxx - sx * sx / n) / (n - 1)) AS std FROM m),
              |g AS (SELECT v, COUNT(*) AS c FROM s GROUP BY v),
              |c AS (SELECT v, c,
              |    SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum
              |  FROM g)
              |SELECT st.n, st.mean, st.std,
              |  ROUND(MAX(GREATEST(
              |    CAST(cum AS DOUBLE) / st.n - $phi,
              |    $phi - CAST(cum - c AS DOUBLE) / st.n)), 6) AS ks_d
              |FROM c CROSS JOIN st GROUP BY st.n, st.mean, st.std""".stripMargin),
      (s, dir) =>
        graft.functions.Stats.ks1Samp(
          Tables.load(s, dir, "lineitem"), "l_extendedprice"))
  }

  /** Kuiper one-sample statistic against the fitted normal on
    * l_extendedprice ([[graft.functions.Stats.kuiper1Samp]]) — the
    * tail/shift-sensitive companion to [[ks1Price]]: V = D⁺ + D⁻ with
    * the two one-sided sups reported separately, so symmetric drift
    * (one tail up, one tail down) that the single-sup KS halves shows
    * at full strength. Same three shared machines as `stat_ks_1samp`
    * (exact-moment μ̂/σ̂, the sharded ECDF cumulative, the
    * Abramowitz–Stegun Φ as one text in both engines); D⁺/D⁻ carry the
    * round-6 transcendental tail and V is their grid-exact sum.
    */
  val kuiperPrice: Q = {
    val phi = graft.fit.ClosedForm.normalCdfText("((v - st.mean) / st.std)")
    Q(
      "stat_kuiper",
      Some(s"""WITH s AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v
              |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
              |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              |    ${D.dsumExact("v")} AS sx, ${D.dsumExact("v * v")} AS sxx
              |  FROM s),
              |st AS (SELECT n, sx / n AS mean,
              |    SQRT((sxx - sx * sx / n) / (n - 1)) AS std FROM m),
              |g AS (SELECT v, COUNT(*) AS c FROM s GROUP BY v),
              |c AS (SELECT v, c,
              |    SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum
              |  FROM g)
              |SELECT st.n, st.mean, st.std,
              |  ROUND(MAX(CAST(cum AS DOUBLE) / st.n - $phi), 6) AS d_plus,
              |  ROUND(MAX($phi - CAST(cum - c AS DOUBLE) / st.n), 6) AS d_minus,
              |  ROUND(MAX(CAST(cum AS DOUBLE) / st.n - $phi), 6)
              |    + ROUND(MAX($phi - CAST(cum - c AS DOUBLE) / st.n), 6) AS kuiper_v
              |FROM c CROSS JOIN st GROUP BY st.n, st.mean, st.std""".stripMargin),
      (s, dir) =>
        graft.functions.Stats.kuiper1Samp(
          Tables.load(s, dir, "lineitem"), "l_extendedprice"))
  }

  /** Welch's unequal-variance t-test between the l_extendedprice
    * distributions of return flags A and R — the parametric location
    * test beside the rank-based [[mannWhitney]] (U asks "did the median
    * move"; Welch asks "did the MEAN move, without assuming the two
    * slices share a variance" — the robust default over Student's
    * pooled form). Per-group moments ride the exact decimal route
    * ([[graft.functions.DetAgg.Sql.dsumExact]] — price sums pass 2⁵³
    * micro-units at sf0.01); t and the Welch–Satterthwaite df are one
    * literal IEEE tree TEXT-shared with the oracle — hash-exact
    * unrounded.
    */
  val welchTtest: Q = {
    val se1 = "(v1 / n1)"
    val se2 = "(v2 / n2)"
    val se = s"($se1 + $se2)"
    val t = s"((m1 - m2) / SQRT($se))"
    val dfW = s"(($se * $se) / ($se1 * $se1 / (n1 - 1.0) + $se2 * $se2 / (n2 - 1.0)))"
    def momentsSql(flag: String, i: Int): String =
      s"""g$i AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n$i,
         |    ${D.dsumExact("v")} AS sx$i, ${D.dsumExact("v * v")} AS sxx$i
         |  FROM (SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
         |        WHERE l_returnflag = '$flag'
         |          AND l_extendedprice IS NOT NULL))""".stripMargin
    val derived =
      """d AS (SELECT n1, n2, sx1 / n1 AS m1, sx2 / n2 AS m2,
        |    (sxx1 - sx1 * sx1 / n1) / (n1 - 1.0) AS v1,
        |    (sxx2 - sx2 * sx2 / n2) / (n2 - 1.0) AS v2
        |  FROM g1 CROSS JOIN g2)""".stripMargin
    Q(
      "stat_welch_ttest",
      Some(s"""WITH ${momentsSql("A", 1)},
              |${momentsSql("R", 2)},
              |$derived
              |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
              |  m1 - m2 AS mean_diff, $t AS t_stat, $dfW AS df
              |FROM d""".stripMargin),
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
          .filter(col("l_extendedprice").isNotNull)
          .select(
            col("l_returnflag"),
            col("l_extendedprice").cast("double").as("v"))
        def g(flag: String, i: Int) =
          li.filter(col("l_returnflag") === flag).agg(
            count(lit(1)).cast("double").as(s"n$i"),
            graft.functions.DetAgg.dsum(col("v")).as(s"sx$i"),
            graft.functions.DetAgg.dsum(col("v") * col("v")).as(s"sxx$i"))
        g("A", 1).crossJoin(g("R", 2))
          .select(
            col("n1"), col("n2"),
            (col("sx1") / col("n1")).as("m1"),
            (col("sx2") / col("n2")).as("m2"),
            ((col("sxx1") - col("sx1") * col("sx1") / col("n1"))
              / (col("n1") - lit(1.0))).as("v1"),
            ((col("sxx2") - col("sx2") * col("sx2") / col("n2"))
              / (col("n2") - lit(1.0))).as("v2"))
          .select(
            col("n1").cast("long").as("n1"),
            col("n2").cast("long").as("n2"),
            (col("m1") - col("m2")).as("mean_diff"),
            expr(t).as("t_stat"),
            expr(dfW).as("df"))
      })
  }

  /** Friedman test (repeated-measures rank ANOVA) across the return-flag
    * treatments with line numbers as blocks: does the flag effect on
    * mean quantity persist ACROSS blocks, the question one-way
    * Kruskal–Wallis cannot ask (it pools; Friedman ranks WITHIN each
    * block, so a block-level effect can't masquerade as a treatment
    * effect). Block values are exact-decimal means (davg); within-block
    * DOUBLED midranks come from a bounded k×k self-join per block
    * (2r = 2·#less + #eq + 1 — every quantity an exact integer, no
    * window anywhere); the tie-corrected statistic
    * χ² = (k−1)·Σⱼ(R2ⱼ − n(k+1))² / (Σ(2r)² − n·k(k+1)²) has the
    * doubled-rank quarters cancel algebraically, so both engines divide
    * the same exact BIGINTs once — hash-exact unrounded. Incomplete
    * blocks (a flag missing from a line number) are excluded, the
    * textbook complete-block requirement.
    */
  val friedman: Q = {
    val k = 3
    Q(
      "stat_friedman",
      Some(s"""WITH cells AS (SELECT l_linenumber AS b, l_returnflag AS f,
              |    ${D.davg("l_quantity")} AS v
              |  FROM lineitem
              |  WHERE l_quantity IS NOT NULL AND l_returnflag IS NOT NULL
              |    AND l_linenumber IS NOT NULL
              |  GROUP BY 1, 2),
              |cb AS (SELECT b FROM cells GROUP BY b HAVING COUNT(*) = $k),
              |cc AS (SELECT cells.b, cells.f, cells.v
              |  FROM cells JOIN cb USING (b)),
              |r AS (SELECT c1.b, c1.f,
              |    CAST(2 * SUM(CASE WHEN c2.v < c1.v THEN 1 ELSE 0 END)
              |       + SUM(CASE WHEN c2.v = c1.v THEN 1 ELSE 0 END) + 1
              |       AS BIGINT) AS r2
              |  FROM cc c1 JOIN cc c2 ON c1.b = c2.b GROUP BY c1.b, c1.f),
              |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb FROM cb),
              |s AS (SELECT CAST(SUM(r2 * r2) AS BIGINT) AS ss FROM r),
              |g AS (SELECT CAST(SUM(r2) AS BIGINT) AS rj FROM r GROUP BY f),
              |m AS (SELECT CAST(SUM((rj - ${k + 1} * nb) * (rj - ${k + 1} * nb))
              |       AS BIGINT) AS num
              |  FROM g CROSS JOIN t)
              |SELECT nb AS n_blocks, CAST(${k - 1} AS BIGINT) AS df,
              |  ${k - 1}.0e0 * num / (ss - ${k * (k + 1) * (k + 1)} * nb) AS chi2_f
              |FROM m CROSS JOIN t CROSS JOIN s""".stripMargin),
      (s, dir) => {
        val cells = Tables.load(s, dir, "lineitem")
          .filter(col("l_quantity").isNotNull && col("l_returnflag").isNotNull
            && col("l_linenumber").isNotNull)
          .groupBy(col("l_linenumber").as("b"), col("l_returnflag").as("f"))
          .agg(graft.functions.DetAgg.davg(col("l_quantity")).as("v"))
        val cb = cells.groupBy("b").agg(count(lit(1)).as("__kc"))
          .filter(col("__kc") === k).select("b")
        val cc = cells.join(cb, "b")
        val r = cc.as("c1")
          .join(cc.select(col("b").as("b2"), col("v").as("v2")),
            col("b") === col("b2"))
          .groupBy(col("b"), col("f"))
          .agg((lit(2) * sum(when(col("v2") < col("v"), 1L).otherwise(0L))
            + sum(when(col("v2") === col("v"), 1L).otherwise(0L)) + lit(1))
            .cast("long").as("r2"))
        val t = cb.agg(count(lit(1)).as("nb"))
        val ss = r.agg(sum(col("r2") * col("r2")).cast("long").as("ss"))
        val m = r.groupBy("f").agg(sum("r2").cast("long").as("rj"))
          .crossJoin(broadcast(t))
          .agg(sum((col("rj") - lit(k + 1) * col("nb"))
            * (col("rj") - lit(k + 1) * col("nb"))).cast("long").as("num"))
        m.crossJoin(broadcast(t)).crossJoin(broadcast(ss))
          .select(
            col("nb").as("n_blocks"),
            lit((k - 1).toLong).as("df"),
            (lit((k - 1).toDouble) * col("num")
              / (col("ss") - lit(k * (k + 1) * (k + 1)) * col("nb")))
              .as("chi2_f"))
      })
  }

  /** Wilson 95 % score interval of the `l_linestatus = 'O'` share per
    * return flag — the binomial confidence bound a mix monitor reports
    * next to the raw share (the normal-approximation interval collapses
    * at extreme p̂; Wilson does not). k and n are exact integers from
    * one conditional hash aggregate; the interval is one literal IEEE
    * tree (z = 1.96) TEXT-shared with the oracle — hash-exact unrounded.
    */
  val wilsonCi: Q = {
    val z = "1.96"
    val ph = "(CAST(k AS DOUBLE) / n)"
    val den = s"(1.0 + $z * $z / n)"
    val ctr = s"($ph + $z * $z / (2.0 * n))"
    val hw = s"($z * SQRT($ph * (1.0 - $ph) / n + $z * $z / (4.0 * n * n)))"
    Q(
      "stat_wilson_ci",
      Some(s"""WITH g AS (SELECT l_returnflag,
              |    CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS k,
              |    CAST(COUNT(*) AS BIGINT) AS n
              |  FROM lineitem GROUP BY 1)
              |SELECT l_returnflag, n, k, $ph AS p_hat,
              |  ($ctr - $hw) / $den AS wilson_lo,
              |  ($ctr + $hw) / $den AS wilson_hi
              |FROM g""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            sum(when(col("l_linestatus") === "O", 1L).otherwise(0L)).as("k"),
            count(lit(1)).as("n"))
          .select(
            col("l_returnflag"), col("n"), col("k"),
            expr(ph).as("p_hat"),
            expr(s"($ctr - $hw) / $den").as("wilson_lo"),
            expr(s"($ctr + $hw) / $den").as("wilson_hi")))
  }

  /** Brown–Forsythe homogeneity-of-variance test: one-way ANOVA on
    * |x − group median| — the robust Levene variant (median-centered, so
    * heavy tails can't masquerade as variance differences), the
    * precondition check for [[anovaQuantity]] itself. Composes two
    * existing exact kernels: per-group medians from the STRATIFIED
    * sharded cumulative ([[graft.functions.Stats.weightedMedian]] at
    * weight 1 — a type-1 median, an actual data value, so the
    * deviations `|q − med|` are exact BIGINTs for integer-valued
    * columns), then the [[anovaQuantity]] conditional-moment aggregate
    * and its literal F tree, TEXT-shared with the oracle — bit-exact
    * unrounded. Scale: a 3-row broadcast median relation + one
    * conditional hash aggregate; no window beyond the median kernel's
    * per-(group, shard) ones.
    */
  val brownForsythe: Q = {
    val flags = Seq("A", "N", "R")
    val moments = flags.flatMap { f =>
      Seq(
        s"CAST(SUM(CASE WHEN gf = '$f' THEN 1 ELSE 0 END) AS DOUBLE) AS n_$f",
        s"CAST(SUM(CASE WHEN gf = '$f' THEN z ELSE 0 END) AS DOUBLE) AS s_$f",
        s"CAST(SUM(CASE WHEN gf = '$f' THEN z * z ELSE 0 END) AS DOUBLE) AS q_$f")
    }
    val t = flags.map(f => s"s_$f * s_$f / n_$f").mkString(" + ")
    val sTot = flags.map(f => s"s_$f").mkString(" + ")
    val nTot = flags.map(f => s"n_$f").mkString(" + ")
    val qTot = flags.map(f => s"q_$f").mkString(" + ")
    val ssb = s"($t) - ($sTot) * ($sTot) / ($nTot)"
    val ssw = s"($qTot) - ($t)"
    val df1 = (flags.size - 1).toDouble
    val fStat = s"(($ssb) / $df1) / (($ssw) / (($nTot) - ${flags.size}.0))"
    Q(
      "stat_brown_forsythe",
      Some(s"""WITH g AS (
              |  SELECT l_returnflag AS gf, CAST(l_quantity AS DOUBLE) AS v,
              |    COUNT(*) AS w
              |  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2),
              |c AS (SELECT gf, v,
              |    SUM(w) OVER (PARTITION BY gf ORDER BY v
              |      ROWS UNBOUNDED PRECEDING) AS cum,
              |    SUM(w) OVER (PARTITION BY gf) AS tw FROM g),
              |med AS (SELECT gf, MIN(v) AS med FROM c WHERE 2 * cum >= tw
              |  GROUP BY gf),
              |zz AS (SELECT l.l_returnflag AS gf,
              |    ABS(CAST(l.l_quantity AS BIGINT) - CAST(m.med AS BIGINT)) AS z
              |  FROM lineitem l JOIN med m ON l.l_returnflag = m.gf
              |  WHERE l.l_quantity IS NOT NULL),
              |m AS (SELECT
              |  ${moments.mkString(",\n  ")}
              |FROM zz)
              |SELECT $ssb AS ss_between, $ssw AS ss_within,
              |  CAST($df1 AS BIGINT) AS df_between,
              |  CAST(($nTot) - ${flags.size}.0 AS BIGINT) AS df_within,
              |  $fStat AS f_stat
              |FROM m""".stripMargin),
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
          .filter(col("l_quantity").isNotNull)
        val med = graft.functions.Stats
          .weightedMedian(li, "l_returnflag", "l_quantity", lit(1L))
          .select(col("l_returnflag").as("gf"), col("wmed_l_quantity").as("med"))
        val z = li.join(broadcast(med), col("l_returnflag") === col("gf"))
          .select(col("gf"),
            abs(col("l_quantity").cast("long") - col("med").cast("long")).as("z"))
        z.agg(expr(moments.head), moments.tail.map(expr): _*)
          .select(
            expr(ssb).as("ss_between"),
            expr(ssw).as("ss_within"),
            expr(s"CAST($df1 AS BIGINT)").as("df_between"),
            expr(s"CAST(($nTot) - ${flags.size}.0 AS BIGINT)").as("df_within"),
            expr(fStat).as("f_stat"))
      })
  }

  /** Levene's homogeneity-of-variance test, the classic MEAN-centered
    * form beside [[brownForsythe]]'s median-centered robust variant
    * (textbook pairing: Levene is the more powerful test under
    * near-normality, Brown–Forsythe the safe default under heavy
    * tails — an engine should offer both and let the analyst choose).
    * Group means are one IEEE division of exact-decimal sums (bit-equal
    * in both engines), deviations are round-6 (|x − mean| is a double,
    * unlike Brown–Forsythe's exact-integer |x − median|), and the
    * ANOVA moments ride the decimal routes: Σz scale-6, Σz² through
    * [[graft.functions.DetAgg.dsumP]] (round-6 squares are exact at 12
    * decimals, VARCHAR-routed cast). The F tail is the
    * [[brownForsythe]] literal tree, TEXT-shared — hash-exact
    * unrounded. Scale: a 3-row broadcast mean relation + ONE
    * conditional hash aggregate, windowless.
    */
  val levene: Q = {
    val flags = Seq("A", "N", "R")
    val moments = flags.flatMap { f =>
      Seq(
        s"CAST(SUM(CASE WHEN gf = '$f' THEN 1 ELSE 0 END) AS DOUBLE) AS n_$f",
        D.dsum(s"CASE WHEN gf = '$f' THEN z ELSE 0 END") + s" AS s_$f",
        D.dsumP(s"CASE WHEN gf = '$f' THEN z * z ELSE 0 END") + s" AS q_$f")
    }
    val t = flags.map(f => s"s_$f * s_$f / n_$f").mkString(" + ")
    val sTot = flags.map(f => s"s_$f").mkString(" + ")
    val nTot = flags.map(f => s"n_$f").mkString(" + ")
    val qTot = flags.map(f => s"q_$f").mkString(" + ")
    val ssb = s"($t) - ($sTot) * ($sTot) / ($nTot)"
    val ssw = s"($qTot) - ($t)"
    val df1 = (flags.size - 1).toDouble
    val fStat = s"(($ssb) / $df1) / (($ssw) / (($nTot) - ${flags.size}.0))"
    Q(
      "stat_levene",
      Some(s"""WITH mu AS (SELECT l_returnflag AS gf,
              |    ${D.dsum("CAST(l_quantity AS DOUBLE)")} / COUNT(*) AS mean
              |  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1),
              |zz AS (SELECT l.l_returnflag AS gf,
              |    ROUND(ABS(CAST(l.l_quantity AS DOUBLE) - m.mean), 6) AS z
              |  FROM lineitem l JOIN mu m ON l.l_returnflag = m.gf
              |  WHERE l.l_quantity IS NOT NULL),
              |m AS (SELECT
              |  ${moments.mkString(",\n  ")}
              |FROM zz)
              |SELECT $ssb AS ss_between, $ssw AS ss_within,
              |  CAST($df1 AS BIGINT) AS df_between,
              |  CAST(($nTot) - ${flags.size}.0 AS BIGINT) AS df_within,
              |  $fStat AS f_stat
              |FROM m""".stripMargin),
      (s, dir) => {
        import graft.functions.DetAgg
        val li = Tables.load(s, dir, "lineitem")
          .filter(col("l_quantity").isNotNull)
        val mu = li.groupBy(col("l_returnflag").as("gf"))
          .agg((DetAgg.dsum(col("l_quantity").cast("double")) / count(lit(1)))
            .as("mean"))
        val z = li.join(broadcast(mu), col("l_returnflag") === col("gf"))
          .select(col("gf"),
            round(abs(col("l_quantity").cast("double") - col("mean")), 6).as("z"))
        val momentCols = flags.flatMap { f =>
          Seq(
            sum(when(col("gf") === f, 1L).otherwise(0L)).cast("double").as(s"n_$f"),
            DetAgg.dsum(when(col("gf") === f, col("z")).otherwise(lit(0.0)))
              .as(s"s_$f"),
            DetAgg.dsumP(when(col("gf") === f, col("z") * col("z"))
              .otherwise(lit(0.0))).as(s"q_$f"))
        }
        z.agg(momentCols.head, momentCols.tail: _*)
          .select(
            expr(ssb).as("ss_between"),
            expr(ssw).as("ss_within"),
            expr(s"CAST($df1 AS BIGINT)").as("df_between"),
            expr(s"CAST(($nTot) - ${flags.size}.0 AS BIGINT)").as("df_within"),
            expr(fStat).as("f_stat"))
      })
  }

  /** Fligner–Killeen homogeneity-of-variance test — the RANK-based
    * third member of the family ([[levene]] mean-centered,
    * [[brownForsythe]] median-centered, this one distribution-free):
    * normal scores a = Φ⁻¹(½ + r̄/(2(N+1))) of the global mid-ranks of
    * |x − group median|, then the one-way ANOVA χ² on the scores.
    * Composes three proven kernels end to end: the Brown–Forsythe
    * integer deviations, the Kruskal–Wallis global mid-rank cells
    * ([[graft.functions.Stats.rankedCells]] — sharded, never a
    * corpus-wide window; doubled mid-ranks exact BIGINTs), and the
    * Acklam probit ([[graft.fit.ClosedForm.probitText]] — ONE text in
    * both engines, round-6 absorbing the LN-branch last-ulp). Scores
    * are round-6, so c·a and c·a² ride the boundary-free scale-12
    * route; the χ² is a fixed IEEE tree over those exact moments.
    * Hash-exact unrounded.
    */
  val flignerKilleen: Q = {
    val flags = Seq("A", "N", "R")
    val arg = "(5.0e-1 + CAST(2 * r - ct + 1 AS DOUBLE) / (4.0 * (n + 1)))"
    val aText = s"ROUND(${graft.fit.ClosedForm.probitText(arg)}, 6)"
    val moments = flags.flatMap { f =>
      Seq(
        s"CAST(SUM(CASE WHEN f = '$f' THEN c ELSE 0 END) AS DOUBLE) AS n_$f",
        D.dsumP(s"CASE WHEN f = '$f' THEN c * a ELSE 0 END") + s" AS s_$f",
        D.dsumP(s"CASE WHEN f = '$f' THEN c * a * a ELSE 0 END") + s" AS q_$f")
    }
    val t = flags.map(f => s"s_$f * s_$f / n_$f").mkString(" + ")
    val sTot = flags.map(f => s"s_$f").mkString(" + ")
    val nTot = flags.map(f => s"n_$f").mkString(" + ")
    val qTot = flags.map(f => s"q_$f").mkString(" + ")
    val ssb = s"($t) - ($sTot) * ($sTot) / ($nTot)"
    val s2 = s"(($qTot) - ($sTot) * ($sTot) / ($nTot)) / (($nTot) - 1.0)"
    val x2 = s"($ssb) / ($s2)"
    Q(
      "stat_fligner_killeen",
      Some(s"""WITH gq AS (SELECT l_returnflag AS gf,
              |    CAST(l_quantity AS DOUBLE) AS v, COUNT(*) AS w
              |  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2),
              |cq AS (SELECT gf, v,
              |    SUM(w) OVER (PARTITION BY gf ORDER BY v
              |      ROWS UNBOUNDED PRECEDING) AS cum,
              |    SUM(w) OVER (PARTITION BY gf) AS tw FROM gq),
              |med AS (SELECT gf, MIN(v) AS med FROM cq WHERE 2 * cum >= tw
              |  GROUP BY gf),
              |zz AS (SELECT l.l_returnflag AS gf,
              |    ABS(CAST(l.l_quantity AS BIGINT) - CAST(m.med AS BIGINT)) AS z
              |  FROM lineitem l JOIN med m ON l.l_returnflag = m.gf
              |  WHERE l.l_quantity IS NOT NULL),
              |g AS (SELECT CAST(z AS DOUBLE) AS v, gf AS f, COUNT(*) AS c
              |  FROM zz GROUP BY 1, 2),
              |bv AS (SELECT v, SUM(c) AS ct FROM g GROUP BY v),
              |cum AS (SELECT v, ct,
              |    SUM(ct) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS r
              |  FROM bv),
              |n0 AS (SELECT CAST(SUM(ct) AS BIGINT) AS n FROM bv),
              |cells AS (SELECT f, c, ct, r FROM g JOIN cum USING (v)),
              |sc AS (SELECT f, c, $aText AS a FROM cells CROSS JOIN n0),
              |m AS (SELECT ${moments.mkString(",\n  ")} FROM sc)
              |SELECT n, CAST(${flags.size - 1} AS BIGINT) AS df, $x2 AS x2_stat
              |FROM m CROSS JOIN n0""".stripMargin),
      (s, dir) => {
        import graft.functions.DetAgg
        val li = Tables.load(s, dir, "lineitem")
          .filter(col("l_quantity").isNotNull)
        val med = graft.functions.Stats
          .weightedMedian(li, "l_returnflag", "l_quantity", lit(1L))
          .select(col("l_returnflag").as("gf"), col("wmed_l_quantity").as("med"))
        val zz = li.join(broadcast(med), col("l_returnflag") === col("gf"))
          .select(col("gf"),
            abs(col("l_quantity").cast("long") - col("med").cast("long")).as("z"))
        val cells = graft.functions.Stats.rankedCells(zz, "gf", "z")
          .select(
            col("__g").as("f"), col("__c").as("c"),
            col("__ct").as("ct"), col("__r").as("r"))
        val n0 = cells.select("ct", "r").groupBy().agg(
          max(col("r")).as("n")) // max inclusive cumulative = total count
        val sc = cells.crossJoin(broadcast(n0))
          .select(col("f"), col("c"), expr(aText).as("a"))
        val momentCols = flags.flatMap { f =>
          Seq(
            sum(when(col("f") === f, col("c")).otherwise(0L)).cast("double")
              .as(s"n_$f"),
            DetAgg.dsumP(when(col("f") === f, col("c") * col("a"))
              .otherwise(lit(0.0))).as(s"s_$f"),
            DetAgg.dsumP(when(col("f") === f, col("c") * col("a") * col("a"))
              .otherwise(lit(0.0))).as(s"q_$f"))
        }
        sc.agg(momentCols.head, momentCols.tail: _*)
          .crossJoin(broadcast(n0))
          .select(
            col("n"), lit((flags.size - 1).toLong).as("df"),
            expr(x2).as("x2_stat"))
      })
  }

  /** Kendall τ-b between l_quantity and l_discount — the third rank
    * correlation beside Spearman ρ (τ counts pairwise order agreements;
    * it is the statistic of record when ties are heavy, as here: both
    * columns are bounded-cardinality). Kernel: the JOINT distinct
    * relation (x, y, count) — ≤ |X|·|Y| rows, bounded for categorical /
    * discretized columns (the documented contract; continuous inputs
    * get bucketed first, like [[psiQuantity]]) — then concordant /
    * discordant mass from a strict `x_a < x_b` broadcast pair join over
    * that bounded relation, never over rows. Tie terms ride DOUBLED
    * (`Σ c·(c−1)` — always even, exact BIGINT; the [[mannWhitney]]
    * trick), so everything is integer until the single fixed IEEE tail.
    */
  val kendallTau: Q = Q(
    "stat_kendall",
    Some("""WITH j AS (
           |  SELECT CAST(l_quantity AS DOUBLE) AS x,
           |    CAST(l_discount AS DOUBLE) AS y, COUNT(*) AS c
           |  FROM lineitem
           |  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
           |  GROUP BY 1, 2),
           |p AS (
           |  SELECT
           |    CAST(SUM(CASE WHEN a.y < b.y THEN a.c * b.c ELSE 0 END) AS BIGINT) AS conc,
           |    CAST(SUM(CASE WHEN a.y > b.y THEN a.c * b.c ELSE 0 END) AS BIGINT) AS disc
           |  FROM j a JOIN j b ON a.x < b.x),
           |tx AS (SELECT CAST(SUM(cx * (cx - 1)) AS BIGINT) AS n1x2
           |  FROM (SELECT CAST(SUM(c) AS BIGINT) AS cx FROM j GROUP BY x)),
           |ty AS (SELECT CAST(SUM(cy * (cy - 1)) AS BIGINT) AS n2x2
           |  FROM (SELECT CAST(SUM(c) AS BIGINT) AS cy FROM j GROUP BY y)),
           |t AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM j)
           |SELECT n, conc, disc,
           |  CAST(conc - disc AS DOUBLE)
           |    / (SQRT(CAST(n * (n - 1) - n1x2 AS DOUBLE) / 2.0)
           |       * SQRT(CAST(n * (n - 1) - n2x2 AS DOUBLE) / 2.0)) AS tau_b
           |FROM t CROSS JOIN p CROSS JOIN tx CROSS JOIN ty""".stripMargin),
    (s, dir) =>
      graft.functions.Stats.kendallTau(
        Tables.load(s, dir, "lineitem"), "l_quantity", "l_discount"))

  /** Cramér's V of the l_returnflag × l_linestatus contingency — the
    * normalized effect size the χ² family needs at scale (χ² grows with
    * n; V ∈ [0, 1] is comparable across corpora). Contingency counts,
    * margins, and n are one hash aggregate to a ≤ |R|·|C| relation plus
    * two ≤ |R| / ≤ |C| margin aggregates (all broadcast); χ² rides the
    * DetAgg decimal route, is rounded at 6 (the [[chi2ReturnFlag]]
    * convention), and V is computed FROM the rounded χ² so both engines
    * share the literal input to the final sqrt.
    */
  val cramersV: Q = {
    val eS = "CAST(rm AS DOUBLE) * cm / n"
    Q(
      "stat_cramers_v",
      Some(s"""WITH g AS (SELECT l_returnflag AS r, l_linestatus AS c,
              |    COUNT(*) AS cnt
              |  FROM lineitem GROUP BY 1, 2),
              |rm AS (SELECT r, CAST(SUM(cnt) AS BIGINT) AS rm FROM g GROUP BY r),
              |cm AS (SELECT c, CAST(SUM(cnt) AS BIGINT) AS cm FROM g GROUP BY c),
              |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
              |    COUNT(DISTINCT r) AS nr, COUNT(DISTINCT c) AS nc FROM g),
              |x AS (SELECT ROUND(${D.dsum(
                s"(cnt - $eS) * (cnt - $eS) / ($eS)")}, 6) AS chi2
              |  FROM g JOIN rm USING (r) JOIN cm USING (c) CROSS JOIN t)
              |SELECT t.n, t.nr AS n_rows, t.nc AS n_cols, x.chi2,
              |  SQRT(x.chi2 / (t.n * LEAST(t.nr - 1, t.nc - 1))) AS cramers_v
              |FROM x CROSS JOIN t""".stripMargin),
      (s, dir) => {
        import graft.functions.DetAgg
        val g = Tables.load(s, dir, "lineitem")
          .groupBy(col("l_returnflag").as("r"), col("l_linestatus").as("c"))
          .agg(count(lit(1)).as("cnt"))
        val rm = g.groupBy("r").agg(sum("cnt").as("rm"))
        val cm = g.groupBy("c").agg(sum("cnt").as("cm"))
        val t = g.agg(
          sum("cnt").as("n"),
          countDistinct("r").as("nr"),
          countDistinct("c").as("nc"))
        val e = col("rm").cast("double") * col("cm") / col("n")
        val x = g.join(broadcast(rm), "r").join(broadcast(cm), "c")
          .crossJoin(broadcast(t))
          .agg(round(DetAgg.dsum(
            (col("cnt") - e) * (col("cnt") - e) / e), 6).as("chi2"))
        x.crossJoin(broadcast(t))
          .select(
            col("n"), col("nr").as("n_rows"), col("nc").as("n_cols"), col("chi2"),
            sqrt(col("chi2") / (col("n") * least(col("nr") - 1, col("nc") - 1)))
              .as("cramers_v"))
      })
  }

  /** The streaming drift monitor's plan run in BATCH over the events
    * table (the same serving-both-ways proof as `stream_quality_monitor`):
    * per 5-minute event-time window, χ² goodness-of-fit and PSI of the
    * event-type mix against a literal uniform reference (0.2 × 5 types),
    * plus the unseen-category count. One windowed aggregate with the
    * categories as conditional-sum COLUMNS — the single-stateful-operator
    * shape that makes the identical plan legal under a watermark.
    */
  val streamDriftMonitor: Q = {
    val cats = Seq("click", "error", "purchase", "signup", "view")
    val cnt = Map("click" -> "cc", "error" -> "ce", "purchase" -> "cp",
      "signup" -> "cs", "view" -> "cv")
    val sums = cats.map(c =>
      s"SUM(CASE WHEN event_type = '$c' THEN 1 ELSE 0 END) AS ${cnt(c)}").mkString(",\n|  ")
    val inList = cats.map(c => s"'$c'").mkString(", ")
    val chi2 = cats.map { c =>
      val o = cnt(c); s"($o - n*0.2)*($o - n*0.2)/(n*0.2)"
    }.mkString(" + ")
    val psi = cats.map { c =>
      val o = s"GREATEST(CAST(${cnt(c)} AS DOUBLE)/n, 1e-6)"
      s"($o - 0.2)*LN($o/0.2)"
    }.mkString(" + ")
    Q(
      "stream_drift_monitor",
      Some(s"""WITH g AS (SELECT CAST(FLOOR(epoch(ts) / 300) AS BIGINT) AS bucket,
              |  $sums,
              |  COUNT(*) AS n,
              |  SUM(CASE WHEN event_type IN ($inList) THEN 0 ELSE 1 END) AS n_unseen
              |FROM events GROUP BY 1)
              |SELECT bucket, n AS n_events, CAST(n_unseen AS BIGINT) AS n_unseen,
              |  ROUND($chi2, 6) AS chi2,
              |  ROUND($psi, 6) AS psi
              |FROM g""".stripMargin),
      (s, dir) =>
        graft.streaming.DriftStream
          .monitor(
            Seq("click", "error", "purchase", "signup", "view").map(_ -> 0.2).toMap,
            Tables.loadEvents(s, dir))
          .select(
            floor(unix_timestamp(col("window_start")) / 300).cast("long").as("bucket"),
            col("n_events"), col("n_unseen"), col("chi2"), col("psi")))
  }

  /** Data mixing: per-source keep percentages (web 50%, books 100%,
    * otherwise 20%) — survivor counts per (source, lang).
    */
  val sampleMix: Q = Q(
    "sample_proportional",
    Some("""WITH s AS (
           |  SELECT source, lang FROM documents
           |  WHERE ((doc_id + 11) % 100000) * 2654435761 % 4294967296 % 100 <
           |    CASE WHEN source = 'web' THEN 50
           |         WHEN source = 'books' THEN 100 ELSE 20 END)
           |SELECT source, lang, COUNT(*) AS n FROM s GROUP BY source, lang""".stripMargin),
    (s, dir) =>
      graft.operators.Sampling.proportional(
        Tables.load(s, dir, "documents"), "doc_id",
        when(col("source") === "web", 50)
          .when(col("source") === "books", 100).otherwise(20),
        seed = 11)
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n")))

  /** Oracle SQL shared VERBATIM by the window- and sharded-tier
    * budget/temperature queries: the tiers are row-identical by
    * construction, so they must stay against literally one oracle —
    * a drift between twin copies would silently fork the contract.
    */
  private val tokenBudgetOracle: String =
    """WITH t AS (
           |  SELECT doc_id, lang,
           |    len(string_split_regex(trim(text), '\s+')) AS n_tokens,
           |    ((doc_id + 5) % 100000) * 2654435761 % 4294967296 AS hk
           |  FROM documents),
           |c AS (
           |  SELECT lang, n_tokens,
           |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rn,
           |    SUM(n_tokens) OVER (PARTITION BY lang ORDER BY hk, doc_id
           |      ROWS UNBOUNDED PRECEDING) AS cum
           |  FROM t)
           |SELECT lang, COUNT(*) AS n_docs,
           |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
           |FROM c WHERE rn <= 20000 AND cum <= 20000 GROUP BY lang""".stripMargin

  private val temperatureOracle: String =
    s"""WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
            |w AS (SELECT lang, SQRT(CAST(n AS DOUBLE)) AS w FROM c),
            |tot AS (SELECT ${graft.functions.DetAgg.Sql.dsum("w")} AS wsum FROM w),
            |t AS (SELECT lang, FLOOR(3.0e2 * w / wsum) AS target
            |      FROM w CROSS JOIN tot),
            |r AS (SELECT doc_id, lang,
            |        ROW_NUMBER() OVER (PARTITION BY lang ORDER BY
            |          ((doc_id + 7) % 100000) * 2654435761 % 4294967296, doc_id) AS rn
            |      FROM documents)
            |SELECT lang, COUNT(*) AS n_kept
            |FROM r JOIN t USING (lang) WHERE rn <= target
            |GROUP BY lang""".stripMargin

  /** Token-budget capping: each language keeps a uniform hash-ordered
    * sample of docs until 20k whitespace tokens — kept counts + exact
    * token totals per language.
    */
  val sampleBudget: Q = Q(
    "sample_token_budget",
    Some(tokenBudgetOracle),
    (s, dir) => {
      val d = Tables.load(s, dir, "documents").select(
        col("doc_id"), col("lang"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
      graft.operators.Sampling
        .tokenBudgetCap(d, "doc_id", Seq("lang"), col("n_tokens"),
          budget = 20000L, seed = 5)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"))
    })

  /** Temperature mixing at τ = 0.5: per-language doc budgets ∝ √n_lang
    * out of 300 total, filled by hash order — kept counts per language.
    * The √-weight total rides a DetAgg decimal, so the floor'd targets
    * are bit-portable (see `Sampling.temperatureMixSqrt`).
    */
  val sampleTemperature: Q = Q(
    "sample_temperature",
    Some(temperatureOracle),
    (s, dir) =>
      graft.operators.Sampling.temperatureMixSqrt(
        Tables.load(s, dir, "documents").select("doc_id", "lang"),
        "doc_id", "lang", budget = 300L, seed = 7)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept")))

  /** The SHARDED prefix-sum budget kernel
    * ([[graft.operators.Sampling.tokenBudgetCapShardedBy]] — the
    * extreme-scale tier whose window partitions are shard slices, never a
    * whole stratum) against the SAME oracle as `sample_token_budget`:
    * shard structure affects execution, not output, so the oracle-tier
    * mod-100k key keeps it DuckDB-checkable (the key's narrow range
    * degenerates to one shard here; SamplingSpec pins row-identity to the
    * window tier under the full-range balanced key).
    */
  val sampleBudgetSharded: Q = Q(
    "sample_token_budget_sharded",
    Some(tokenBudgetOracle),
    (s, dir) => {
      val d = Tables.load(s, dir, "documents").select(
        col("doc_id"), col("lang"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
      graft.operators.Sampling
        .tokenBudgetCapShardedBy(
          d, Seq("lang"), col("n_tokens"), budget = 20000L,
          graft.operators.Sampling.shuffleKey(col("doc_id"), seed = 5),
          col("doc_id"), shardBits = 10)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"))
    })

  /** The sharded temperature fill
    * ([[graft.operators.Sampling.temperatureMixSharded]]) against
    * `sample_temperature`'s oracle — same √-weight targets, same
    * oracle-tier key (degenerate single shard, unchanged output);
    * SamplingSpec pins row-identity to the window tier under the
    * full-range balanced key.
    */
  val sampleTemperatureSharded: Q = Q(
    "sample_temperature_sharded",
    Some(temperatureOracle),
    (s, dir) =>
      graft.operators.Sampling.temperatureMixSharded(
        Tables.load(s, dir, "documents").select("doc_id", "lang"),
        "doc_id", "lang", budget = 300L,
        n => sqrt(n.cast("double")),
        graft.operators.Sampling.shuffleKey(col("doc_id"), seed = 7),
        shardBits = 10)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept")))

  /** Per-domain cap ([[graft.operators.Sampling.domainCap]]): at most 8
    * docs per `source`, largest first (n_chars desc, doc_id tiebreak) —
    * the Common-Crawl host-limit step. The REGISTERED path is the salted
    * tournament (head-domain-proof: no whole-domain window partition);
    * the oracle replays the direct single-window form, and because the
    * (n_chars desc, doc_id) order is total the two are hash-identical —
    * the scale partitioning itself is what gets verified.
    */
  val sampleDomainCap: Q = Q(
    "sample_domain_cap",
    Some("""WITH r AS (SELECT doc_id, source, n_chars,
           |    ROW_NUMBER() OVER (PARTITION BY source
           |      ORDER BY n_chars DESC, doc_id) AS rank_in_domain
           |  FROM documents)
           |SELECT doc_id, source, n_chars, CAST(rank_in_domain AS BIGINT) AS rank_in_domain
           |FROM r WHERE rank_in_domain <= 8""".stripMargin),
    (s, dir) =>
      graft.operators.Sampling.domainCap(
        Tables.load(s, dir, "documents").select("doc_id", "source", "n_chars"),
        "doc_id", "source",
        Seq(col("n_chars").desc, col("doc_id")), k = 8)
        .withColumn("rank_in_domain", col("rank_in_domain").cast("long")))

  /** DSIR importance resampling toward the `en` slice
    * ([[graft.operators.Dsir]]): unigram target/raw log-ratio weights
    * with add-1 smoothing, round-6 ln parity, DetAgg decimal doc sums,
    * deterministic top-100 by (weight desc, doc_id). The oracle replays
    * the identical estimate — the model relation is vocabulary-bounded,
    * so the whole pipeline after the token explode is broadcast-sized.
    * (This corpus's vocabulary is iid across slices, so the weights here
    * verify the ESTIMATE, not a separation; DsirSpec pins the actual
    * target enrichment on a shifted-vocabulary corpus, and pins the
    * open-vocabulary hashed-bucket tier row-identical on this one.)
    */
  val sampleDsir: Q = Q(
    "sample_dsir",
    Some(s"""WITH tok AS (
            |  SELECT doc_id, lang = 'en' AS tgt,
            |    unnest(string_split_regex(trim(text), '\\s+')) AS t
            |  FROM documents),
            |m AS (
            |  SELECT t,
            |    SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct,
            |    COUNT(*) AS cr
            |  FROM tok GROUP BY t),
            |tot AS (SELECT SUM(ct) AS nt, SUM(cr) AS nr, COUNT(*) AS v FROM m),
            |w AS (
            |  SELECT t,
            |    ROUND(LN(((ct + 1.0) * (nr + v)) / ((cr + 1.0) * (nt + v))), 6) AS llr
            |  FROM m CROSS JOIN tot),
            |d AS (
            |  SELECT doc_id, ${D.dsum("llr")} AS weight
            |  FROM tok JOIN w USING (t) GROUP BY doc_id)
            |SELECT d.doc_id, documents.source, d.weight
            |FROM d JOIN documents USING (doc_id)
            |ORDER BY d.weight DESC, d.doc_id LIMIT 100""".stripMargin),
    (s, dir) =>
      graft.operators.Dsir.selectTop(
        graft.operators.Dsir.importanceWeights(
          Tables.load(s, dir, "documents").select("doc_id", "source", "lang", "text"),
          "doc_id", "text", col("lang") === "en"),
        "doc_id", k = 100)
        .select("doc_id", "source", "weight"))

  /** Training-order curriculum by stride scheduling
    * ([[graft.operators.Sampling.curriculumStride]]): per-source shuffle
    * ranks → virtual time `rank · n / n_source`, which interleaves every
    * source uniformly through the training order without a global
    * window. The REGISTERED path is the sharded-rank tier (per-shard
    * windows only — the same oracle-tier key degeneracy note as
    * `sample_token_budget_sharded`); the oracle replays the direct
    * per-source window form, row-identical by construction.
    */
  val packCurriculum: Q = Q(
    "pack_curriculum",
    Some("""WITH r AS (
           |  SELECT doc_id, source,
           |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY
           |      ((doc_id + 13) % 100000) * 2654435761 % 4294967296, doc_id) AS rn
           |  FROM documents),
           |c AS (SELECT source, COUNT(*) AS ns FROM documents GROUP BY source),
           |t AS (SELECT SUM(ns) AS n FROM c)
           |SELECT doc_id, source, CAST(rn AS BIGINT) AS rank_in_stratum,
           |  CAST(rn AS DOUBLE) * n / ns AS vt
           |FROM r JOIN c USING (source) CROSS JOIN t""".stripMargin),
    (s, dir) =>
      graft.operators.Sampling.curriculumStride(
        Tables.load(s, dir, "documents").select("doc_id", "source"),
        "doc_id", "source",
        graft.operators.Sampling.shuffleKey(col("doc_id"), seed = 13))
        .select("doc_id", "source", "rank_in_stratum", "vt"))

  /** Declarative data-quality expectation suite over lineitem
    * ([[graft.operators.Quality]] — the deequ shape): seven checks
    * (null rates, key distinctness, ranges, accepted sets, regex) as ONE
    * aggregation pass; the report is a ≤ |checks|-row unpivot. The suite
    * is deliberately mixed pass/fail (the uniqueness check on a
    * multi-line key reports its true ~0.25 distinctness) and the oracle
    * is generated from the SAME check list, so the quality gate itself
    * is hash-verified.
    */
  val dqExpectations: Q = {
    import graft.operators.Quality
    import graft.operators.Quality._
    val suite: Seq[Check] = Seq(
      NotNull("l_orderkey"),
      NotNull("l_quantity"),
      Unique("l_orderkey", threshold = 0.2),
      InRange("l_quantity", 1.0, 50.0),
      InRange("l_discount", 0.0, 0.08),
      InSet("l_returnflag", Seq("A", "N", "R")),
      MatchesRe("l_linestatus", "^[OF]$"))
    Q(
      "dq_expectations",
      Some(Quality.oracleSql("lineitem", suite)),
      (s, dir) => Quality.run(Tables.load(s, dir, "lineitem"), suite))
  }

  def all: Seq[Q] = Seq(
    profileLineitem, textRedact, ksQuantity, mannWhitney, cliffsDelta, jsdQuantity,
    spearmanQP, psiQuantity, quantilesExact, ppsSample,
    chi2ReturnFlag, anovaQuantity, giniPrice, grubbsPrice, benfordPrice,
    aucLangLen, kendallTau, cramersV, brownForsythe, levene, flignerKilleen,
    theilSen, wilsonCi,
    ks1Price, mutualInfo, cohensD, hillTail, qqNormal,
    kruskalWallis, dunnPosthoc, jarqueBera, cohenKappa, kuiperPrice, welchTtest, friedman,
    mcnemar, oddsRatio, trimmedMean, bartlett, theilIndex, partialCorr,
    decileReport, tukeyFences, cochranQ, gumbelMaxima, srmCheck,
    sampleDsir, packCurriculum, dqExpectations,
    streamDriftMonitor, sampleMix, sampleBudget,
    sampleTemperature, sampleBudgetSharded, sampleTemperatureSharded,
    sampleDomainCap)
}
