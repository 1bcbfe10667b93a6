package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.functions.{DetAgg, Stats}
import graft.functions.DetAgg.{Sql => D}
import graft.operators.{Completeness, Cut, Cuts, Reshape, Windows}
import graft.sources.Tables

/** SURVEY §2 relational inventory over the driver testdata: projections,
  * filters, reshapes, joins, windows, set ops, aggregations — each mapped
  * to the Spark primitive named in the SURVEY "→ Spark" column, each with a
  * DuckDB oracle.
  */
object RelationalQueries {

  private def li(s: SparkSession, d: String) = Tables.load(s, d, "lineitem")
  private def ord(s: SparkSession, d: String) = Tables.load(s, d, "orders")
  private def cust(s: SparkSession, d: String) = Tables.load(s, d, "customer")
  private def part(s: SparkSession, d: String) = Tables.load(s, d, "part")

  /** P2: predicates referencing a scalar aggregate of the same table
    * (reference spatial masks vs whole-scan mean, `scripts/utils.py:107-111`).
    * The 1-row aggregate is crossJoined (broadcast) into the filter — no
    * driver round-trip, stays one lazy plan.
    */
  val p2AggPredicate: Q = Q(
    "p2_agg_predicate",
    Some(s"""SELECT l_orderkey, l_linenumber, l_extendedprice
            |FROM lineitem
            |WHERE l_extendedprice > (SELECT ${D.davg("l_extendedprice")} FROM lineitem)""".stripMargin),
    (s, dir) => {
      val t = li(s, dir)
      val thr = t.agg(DetAgg.davg(col("l_extendedprice")).as("__thr"))
      t.crossJoin(broadcast(thr))
        .filter(col("l_extendedprice") > col("__thr"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    })

  /** P4: group-completeness filter (reference
    * `remove_nans_grouping_by_n_trigger`, `scripts/utils.py:9-21`). Nulls
    * are injected via NULLIF since the synthetic data has none.
    */
  val p4Completeness: Q = Q(
    "p4_completeness",
    Some("""WITH t AS (SELECT l_orderkey, l_linenumber,
           |            NULLIF(l_discount, 0.0) AS d FROM lineitem),
           |g AS (SELECT l_orderkey FROM t GROUP BY l_orderkey
           |      HAVING COUNT(d) = COUNT(*))
           |SELECT t.l_orderkey, t.l_linenumber, t.d
           |FROM t JOIN g USING (l_orderkey)""".stripMargin),
    (s, dir) => {
      val t = li(s, dir).select(
        col("l_orderkey"),
        col("l_linenumber"),
        nullif(col("l_discount"), lit(0.0)).as("d"))
      Completeness.filterComplete(t, Seq("l_orderkey"), Seq("d"))
    })

  /** P5: data-driven cut application (reference `apply_cuts`,
    * `scripts/clean_beta_scan.py:25-58`) — a conjunction of per-key range
    * predicates folded into one codegen'd Column, then bool_and per group.
    */
  val p5Cuts: Q = Q(
    "p5_cuts",
    Some("""SELECT l_orderkey,
           |  bool_and(
           |    (l_returnflag <> 'A' OR l_quantity >= 3.0) AND
           |    (l_returnflag <> 'A' OR l_extendedprice <= 80000.0) AND
           |    (l_returnflag <> 'R' OR l_quantity >= 2.0)) AS accepted
           |FROM lineitem GROUP BY l_orderkey""".stripMargin),
    (s, dir) => {
      val cuts = Seq(
        Cut("l_quantity", "A", "lower", 3.0),
        Cut("l_extendedprice", "A", "higher", 80000.0),
        Cut("l_quantity", "R", "lower", 2.0))
      Cuts.acceptedPerGroup(li(s, dir), cuts, "l_returnflag", Seq("l_orderkey"))
    })

  /** P9: string functions — split-last / substring / contains / regexp
    * extract / replace / concat (reference name parsing,
    * `scripts/measurements.py:259-267`, `scripts/utils.py:51-52`).
    */
  val p9Strings: Q = Q(
    "p9_strings",
    Some("""SELECT p_partkey,
           |  string_split(p_type, ' ')[-1] AS type_last,
           |  SUBSTRING(p_name, 1, 5) AS name5,
           |  (LOWER(p_name) LIKE '%a%') AS has_a,
           |  CAST(regexp_extract(p_brand, '(\d+)', 1) AS INT) AS brand_num,
           |  REPLACE(p_type, ' ', '_') AS type_us,
           |  CONCAT(p_brand, ':', p_type) AS brand_type
           |FROM part""".stripMargin),
    (s, dir) =>
      part(s, dir).select(
        col("p_partkey"),
        element_at(split(col("p_type"), " "), -1).as("type_last"),
        substring(col("p_name"), 1, 5).as("name5"),
        lower(col("p_name")).like("%a%").as("has_a"),
        regexp_extract(col("p_brand"), "(\\d+)", 1).cast("int").as("brand_num"),
        regexp_replace(col("p_type"), " ", "_").as("type_us"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type")))

  /** P10: date/time functions — extract / truncate / interval add / diff
    * (reference timestamp-prefix parsing `scripts/measurements.py:117`,
    * seconds offset `scripts/convert_probe_station_measurement_to_our_format
    * .py:60`).
    */
  val p10Datetime: Q = Q(
    "p10_datetime",
    Some("""SELECT o_orderkey,
           |  year(o_orderdate) AS yr,
           |  month(o_orderdate) AS mo,
           |  date_trunc('month', o_orderdate) AS month_start,
           |  o_orderdate + INTERVAL 5 DAY AS plus5,
           |  date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since
           |FROM orders""".stripMargin),
    (s, dir) =>
      ord(s, dir).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast(LongType).as("yr"),
        month(col("o_orderdate")).cast(LongType).as("mo"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        (col("o_orderdate") + expr("INTERVAL 5 DAYS")).as("plus5"),
        datediff(col("o_orderdate"), to_timestamp(lit("1995-01-01"))).cast(LongType).as("days_since")))

  /** P13: type casts with engine-portable semantics (FLOOR before int cast:
    * Spark truncates double→int, DuckDB rounds — floor makes both exact).
    */
  val p13Casts: Q = Q(
    "p13_casts",
    Some("""SELECT l_orderkey, l_linenumber,
           |  CAST(FLOOR(l_quantity) AS BIGINT) AS qty_int,
           |  CAST(l_orderkey AS VARCHAR) AS okey_str,
           |  CAST(l_linenumber AS DOUBLE) AS ln_dbl
           |FROM lineitem""".stripMargin),
    (s, dir) =>
      li(s, dir).select(
        col("l_orderkey"),
        col("l_linenumber"),
        floor(col("l_quantity")).cast(LongType).as("qty_int"),
        col("l_orderkey").cast("string").as("okey_str"),
        col("l_linenumber").cast("double").as("ln_dbl")))

  /** R1: long→wide pivot with explicit pivot values (reference
    * `pivot(index='n_trigger', columns='device_name')`,
    * `scripts/utils.py:14-18`). Explicit values skip the distinct-collect
    * job — the only scalable form.
    */
  val r1Pivot: Q = Q(
    "r1_pivot",
    Some(s"""SELECT l_linestatus,
            |  ${D.dsum("CASE WHEN l_returnflag = 'A' THEN l_quantity END")} AS "A",
            |  ${D.dsum("CASE WHEN l_returnflag = 'N' THEN l_quantity END")} AS "N",
            |  ${D.dsum("CASE WHEN l_returnflag = 'R' THEN l_quantity END")} AS "R"
            |FROM lineitem GROUP BY l_linestatus""".stripMargin),
    (s, dir) => {
      val wide = Reshape.pivotWide(
        li(s, dir), Seq("l_linestatus"), "l_returnflag", Seq("A", "N", "R"),
        sum(DetAgg.dec(col("l_quantity"))))
      wide.select(col("l_linestatus"),
        col("A").cast("double").as("A"),
        col("N").cast("double").as("N"),
        col("R").cast("double").as("R"))
    })

  /** R2: wide→long unpivot (pandas `.stack()`, reference
    * `scripts/utils.py:19`) via Spark's native `unpivot` — a generate,
    * no shuffle.
    */
  val r2Unpivot: Q = Q(
    "r2_unpivot",
    Some("""SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val FROM lineitem
           |UNION ALL
           |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
           |UNION ALL
           |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem""".stripMargin),
    (s, dir) =>
      Reshape.unpivotLong(
        li(s, dir), Seq("l_orderkey", "l_linenumber"),
        Seq("l_quantity", "l_extendedprice", "l_discount"), "metric", "val"))

  /** J1: left-join per-group accepted flags back onto the event table with
    * a COALESCE default (reference `scripts/time_resolution_beta_scan
    * .py:223-228`).
    */
  val j1Flags: Q = Q(
    "j1_flag_join",
    Some("""SELECT l_orderkey, l_linenumber, COALESCE(f.flag, FALSE) AS accepted
           |FROM lineitem
           |LEFT JOIN (SELECT o_orderkey, TRUE AS flag FROM orders
           |           WHERE o_orderstatus = 'F') f
           |  ON l_orderkey = f.o_orderkey""".stripMargin),
    (s, dir) => {
      val flags = ord(s, dir)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey").as("l_orderkey"), lit(true).as("flag"))
      li(s, dir)
        .join(flags, Seq("l_orderkey"), "left")
        .select(col("l_orderkey"), col("l_linenumber"),
          coalesce(col("flag"), lit(false)).as("accepted"))
    })

  /** J3: composite-key equi-join of a derived aggregate back onto the fact
    * table (reference `set_index(['device_name','Bias voltage (V)'])`
    * alignment, `scripts/compare_measurements.py:260-264`).
    */
  val j3Composite: Q = Q(
    "j3_composite_join",
    Some(s"""WITH ps AS (SELECT l_partkey, l_suppkey,
            |              ${D.dsum("l_quantity")} AS ps_qty
            |            FROM lineitem GROUP BY l_partkey, l_suppkey)
            |SELECT l.l_orderkey, l.l_linenumber, ps.ps_qty
            |FROM lineitem l
            |JOIN ps ON l.l_partkey = ps.l_partkey AND l.l_suppkey = ps.l_suppkey""".stripMargin),
    (s, dir) => {
      val t = li(s, dir)
      val ps = t.groupBy("l_partkey", "l_suppkey")
        .agg(DetAgg.dsum(col("l_quantity")).as("ps_qty"))
      t.join(ps, Seq("l_partkey", "l_suppkey"))
        .select("l_orderkey", "l_linenumber", "ps_qty")
    })

  /** J4: self-join pulse1×pulse2 + constant-grid crossJoin — the Δt shape
    * (reference `scripts/time_resolution_beta_scan.py:32-55`, 81 (k1,k2)
    * pairs). The grid is a literal crossJoin (broadcast nested loop over 9
    * rows); the self-join shuffles once on the group key.
    */
  val j4SelfGrid: Q = Q(
    "j4_selfjoin_grid",
    Some("""SELECT a.l_orderkey, g1.k1, g2.k2,
           |  a.p1 * g1.k1 / 100.0 - b.p2 * g2.k2 / 100.0 AS delta
           |FROM (SELECT l_orderkey, l_extendedprice AS p1 FROM lineitem WHERE l_linenumber = 1) a
           |JOIN (SELECT l_orderkey, l_extendedprice AS p2 FROM lineitem WHERE l_linenumber = 2) b
           |  ON a.l_orderkey = b.l_orderkey
           |CROSS JOIN (VALUES (25), (50), (75)) g1(k1)
           |CROSS JOIN (VALUES (25), (50), (75)) g2(k2)""".stripMargin),
    (s, dir) => {
      import s.implicits._
      val t = li(s, dir)
      val a = t.filter(col("l_linenumber") === 1)
        .select(col("l_orderkey"), col("l_extendedprice").as("p1"))
      val b = t.filter(col("l_linenumber") === 2)
        .select(col("l_orderkey"), col("l_extendedprice").as("p2"))
      val g1 = Seq(25, 50, 75).toDF("k1")
      val g2 = Seq(25, 50, 75).toDF("k2")
      a.join(b, "l_orderkey")
        .crossJoin(broadcast(g1))
        .crossJoin(broadcast(g2))
        .select(col("l_orderkey"), col("k1"), col("k2"),
          (col("p1") * col("k1") / lit(100.0) - col("p2") * col("k2") / lit(100.0)).as("delta"))
    })

  /** W1: order-then-keep-first-half per group (reference voltage-ramp trim,
    * `scripts/compare_measurements.py:33-35`).
    */
  val w1FirstHalf: Q = Q(
    "w1_first_half",
    Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
           |QUALIFY row_number() OVER (PARTITION BY l_orderkey
           |          ORDER BY l_linenumber, l_quantity)
           |        <= FLOOR(COUNT(*) OVER (PARTITION BY l_orderkey) / 2)""".stripMargin),
    (s, dir) =>
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data;
      // ordering by every output column makes tie placement irrelevant to
      // the result multiset, keeping the operator hash-deterministic.
      Windows.firstHalf(
        li(s, dir).select("l_orderkey", "l_linenumber", "l_quantity"),
        Seq("l_orderkey"), Seq(col("l_linenumber"), col("l_quantity"))))

  /** W2: global sort + limit (top-k by totalprice; tiebreak on key keeps it
    * deterministic). Spark plans this as TakeOrderedAndProject — no full
    * sort at scale.
    */
  val w2TopK: Q = Q(
    "w2_topk_sort",
    Some("""SELECT o_orderkey, o_totalprice FROM orders
           |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin),
    (s, dir) =>
      ord(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_totalprice"))

  /** W4 (extension breadth): the remaining window surface in one pass —
    * lead/lag deltas, quartile ntile, percent_rank — over per-customer
    * order histories (all share ONE window partitioning/sort, so Spark
    * plans a single shuffle + sort for all four functions).
    */
  val w4WindowPack: Q = Q(
    "w4_window_pack",
    Some("""SELECT o_custkey, o_orderkey,
           |  o_totalprice - lag(o_totalprice) OVER w AS delta_prev,
           |  lead(o_orderkey) OVER w AS next_order,
           |  ntile(4) OVER w AS quartile,
           |  ROUND(percent_rank() OVER w, 6) AS pr
           |FROM orders
           |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin),
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      ord(s, dir).select(
        col("o_custkey"), col("o_orderkey"),
        (col("o_totalprice") - lag(col("o_totalprice"), 1).over(w)).as("delta_prev"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pr"))
    })

  /** Fuzzy key reconciliation: supplier-name pairs within edit distance 2
    * — the messy-metadata join problem (same device typed two ways in two
    * measurement campaigns). Candidates come from
    * [[graft.operators.Dedup.editDistancePairsByDeletion]] — the
    * deletion-neighborhood generator (lossless: ed ≤ 2 implies a shared
    * ≤2-deletion variant; the brute all-pairs oracle is the proof) — an
    * equi join on the variant, NEVER a cartesian. The choice of tier is
    * the r14 sf1 lesson: supplier names are UNIFORM LENGTH, the regime
    * where length banding ([[graft.operators.Dedup.editDistancePairs]],
    * the r13 route) degenerates to all-pairs candidates (measured 16×
    * wall at 10× data); deletion-variant buckets instead track near-dup
    * density, so candidates stay output-proportional at any scale.
    * `levenshtein` is identically defined in both engines.
    */
  val fuzzyKeys: Q = Q(
    "j_fuzzy_keys",
    Some("""SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
           |  levenshtein(a.s_name, b.s_name) AS dist
           |FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
           |WHERE levenshtein(a.s_name, b.s_name) <= 2""".stripMargin),
    (s, dir) => {
      val sup = Tables.load(s, dir, "supplier").select("s_suppkey", "s_name")
      graft.operators.Dedup
        .editDistancePairsByDeletion(sup, "s_suppkey", "s_name", maxDist = 2)
        .select("id_a", "id_b", "dist")
    })

  /** A5/W3: deterministic arg-min per group (reference `idxmin`,
    * `scripts/time_resolution_beta_scan.py:64-67`), full tiebreak ordering.
    */
  val a5ArgMin: Q = Q(
    "a5_argmin",
    Some("""SELECT l_returnflag, l_orderkey, l_linenumber, l_shipdate FROM lineitem
           |QUALIFY row_number() OVER (PARTITION BY l_returnflag
           |  ORDER BY l_shipdate, l_orderkey, l_linenumber) = 1""".stripMargin),
    (s, dir) =>
      Windows.argMinPerGroup(
        li(s, dir).select("l_returnflag", "l_orderkey", "l_linenumber", "l_shipdate"),
        Seq("l_returnflag"),
        Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))))

  /** A7: fixed-range histogram with clamped under/overflow (reference
    * `np.histogram` + manual overflow bins, `scripts/clean_beta_scan
    * .py:65-72`).
    */
  val a7Histogram: Q = Q(
    "a7_histogram",
    Some("""SELECT bucket, COUNT(*) AS n,
           |  900.0 + bucket * ((105000.0 - 900.0) / 20) AS bin_lo
           |FROM (SELECT CAST(LEAST(GREATEST(FLOOR((l_extendedprice - 900.0)
           |        / ((105000.0 - 900.0) / 20)), 0), 19) AS BIGINT) AS bucket
           |      FROM lineitem)
           |GROUP BY bucket""".stripMargin),
    (s, dir) =>
      Stats.histogram(li(s, dir), col("l_extendedprice"), 900.0, 105000.0, 20))

  /** A8: ECDF per group (reference `scripts/clean_beta_scan.py:212-220`)
    * — production tier: per-value counts + window over distinct values +
    * join back ([[Stats.ecdfByValueCounts]]), so no group ever becomes a
    * single sort task; the oracle stays the cume_dist definition, which
    * the counts form reproduces exactly (StatsSpec pins tier equality).
    */
  val a8Ecdf: Q = Q(
    "a8_ecdf",
    Some("""SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
           |  cume_dist() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS ecdf
           |FROM lineitem""".stripMargin),
    (s, dir) =>
      Stats.ecdfByValueCounts(
        li(s, dir).select("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity"),
        Seq("l_returnflag"), "l_quantity"))

  /** A11: distinct values / distinct counts (reference
    * `set(df['device_name'])` control flow, `scripts/time_resolution_beta_
    * scan.py:233-236`).
    */
  val a11Distinct: Q = Q(
    "a11_distinct",
    Some("""SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS n_orders,
           |  COUNT(DISTINCT l_partkey) AS n_parts
           |FROM lineitem GROUP BY l_returnflag""".stripMargin),
    (s, dir) =>
      li(s, dir).groupBy("l_returnflag")
        .agg(countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_partkey")).as("n_parts")))

  /** U1: union-by-name with missing-column null fill (pandas concat
    * alignment, reference `scripts/compare_measurements.py:50`).
    */
  val u1Union: Q = Q(
    "u1_union",
    Some("""SELECT o_orderkey AS key, o_totalprice AS amount,
           |       o_orderpriority AS priority, 'orders' AS src FROM orders
           |UNION ALL
           |SELECT l_orderkey, l_extendedprice, CAST(NULL AS VARCHAR), 'lineitem'
           |FROM lineitem""".stripMargin),
    (s, dir) => {
      val a = ord(s, dir).select(
        col("o_orderkey").as("key"), col("o_totalprice").as("amount"),
        col("o_orderpriority").as("priority"), lit("orders").as("src"))
      val b = li(s, dir).select(
        col("l_orderkey").as("key"), col("l_extendedprice").as("amount"),
        lit("lineitem").as("src"))
      a.unionByName(b, allowMissingColumns = true)
    })

  /** P11: conditional tagging decided by comparing group aggregates against
    * a global aggregate (reference pad tagging, `scripts/utils.py:58-77`) —
    * two aggregates + a broadcast crossJoin, no driver decision.
    */
  val p11Tag: Q = Q(
    "p11_conditional_tag",
    Some(s"""WITH n AS (SELECT c_nationkey, ${D.davg("c_acctbal")} AS nat_avg
            |           FROM customer GROUP BY c_nationkey),
            |g AS (SELECT ${D.davg("c_acctbal")} AS g_avg FROM customer)
            |SELECT c_nationkey, nat_avg,
            |  CASE WHEN nat_avg > g_avg THEN 'high' ELSE 'low' END AS tag
            |FROM n CROSS JOIN g""".stripMargin),
    (s, dir) => {
      val c = cust(s, dir)
      val perNation = c.groupBy("c_nationkey")
        .agg(DetAgg.davg(col("c_acctbal")).as("nat_avg"))
      val global = c.agg(DetAgg.davg(col("c_acctbal")).as("g_avg"))
      perNation.crossJoin(broadcast(global))
        .select(col("c_nationkey"), col("nat_avg"),
          when(col("nat_avg") > col("g_avg"), "high").otherwise("low").as("tag"))
    })

  /** A2: the custom exact MAD_std aggregate (reference
    * `scripts/utils.py:140-141`), oracle = two-pass median in SQL.
    */
  val a2Mad: Q = Q(
    "a2_mad_std",
    Some("""WITH med AS (SELECT l_returnflag, median(l_extendedprice) AS m
           |            FROM lineitem GROUP BY l_returnflag)
           |SELECT l.l_returnflag,
           |  ROUND(median(ABS(l_extendedprice - m)) * 1.4826, 6) AS mad_std
           |FROM lineitem l JOIN med USING (l_returnflag)
           |GROUP BY l.l_returnflag""".stripMargin),
    (s, dir) =>
      li(s, dir).groupBy("l_returnflag")
        .agg(round(Stats.madStd(col("l_extendedprice")), 6).as("mad_std")))

  /** A1: the reference's flagship `mean_std` wide aggregate with flattened
    * `"col stat"` names (reference `scripts/utils.py:118-146`).
    */
  val a1MeanStd: Q = Q(
    "a1_mean_std",
    Some(s"""WITH med AS (SELECT l_returnflag, median(l_quantity) AS mq,
            |              median(l_extendedprice) AS mp
            |            FROM lineitem GROUP BY l_returnflag)
            |SELECT l.l_returnflag,
            |  ${D.davg("l_quantity")} AS "l_quantity mean",
            |  ROUND(${D.dstd("l_quantity")}, 6) AS "l_quantity std",
            |  ROUND(median(l_quantity), 6) AS "l_quantity median",
            |  ROUND(median(ABS(l_quantity - mq)) * 1.4826, 6) AS "l_quantity MAD_std",
            |  ${D.davg("l_extendedprice")} AS "l_extendedprice mean",
            |  ROUND(${D.dstd("l_extendedprice")}, 6) AS "l_extendedprice std",
            |  ROUND(median(l_extendedprice), 6) AS "l_extendedprice median",
            |  ROUND(median(ABS(l_extendedprice - mp)) * 1.4826, 6) AS "l_extendedprice MAD_std"
            |FROM lineitem l JOIN med USING (l_returnflag)
            |GROUP BY l.l_returnflag""".stripMargin),
    (s, dir) =>
      Stats.meanStd(li(s, dir), Seq("l_returnflag"), Seq("l_quantity", "l_extendedprice")))

  /** S13 scatter-matrix sample table (reference
    * `scripts/clean_beta_scan.py:245-258`): the exact table
    * `px.scatter_matrix` consumes — dimensions chosen by COLUMN-SET
    * ARITHMETIC over the wide measured-data frame (all columns minus the
    * ignore set, minus every CFD threshold except t_50, minus the
    * environment columns), colored by the per-trigger Accepted flag
    * (apply_cuts conjunction joined back on n_trigger, reference P5+J1),
    * with n_trigger as hover data. The set difference runs over the real
    * wide schema — the env/t_k columns exist and are dropped, not never
    * built.
    */
  val s13ScatterMatrix: Q = Q(
    "s13_scatter_matrix",
    Some("""WITH base AS (
           |  SELECT l_orderkey AS n_trigger, l_linenumber AS dev,
           |    MIN(l_extendedprice) * 1.0e-9 AS t0,
           |    CAST(SUM(l_quantity) AS DOUBLE) AS charge,
           |    MAX(l_discount) AS amp
           |  FROM lineitem WHERE l_linenumber IN (1, 2) GROUP BY 1, 2),
           |acc AS (
           |  SELECT n_trigger, BOOL_AND(amp <= 0.08 AND charge >= 10) AS accepted
           |  FROM base GROUP BY 1)
           |SELECT b.n_trigger, 'dev' || CAST(b.dev AS VARCHAR) AS device_name,
           |  a.accepted AS accepted,
           |  b.amp AS "Amplitude (V)",
           |  b.charge AS "Collected charge (V s)",
           |  b.t0 + 50 * 1.0e-10 AS "t_50 (s)"
           |FROM base b JOIN acc a USING (n_trigger)""".stripMargin),
    (s, dir) => {
      val base = li(s, dir).filter(col("l_linenumber").isin(1, 2))
        .groupBy("l_orderkey", "l_linenumber")
        .agg(
          min("l_extendedprice").as("t0r"),
          sum("l_quantity").cast("double").as("charge"),
          max("l_discount").as("amp"),
          max("l_tax").as("temp"))
        .select(
          col("l_orderkey").as("n_trigger"),
          concat(lit("dev"), col("l_linenumber")).as("device_name"),
          (col("t0r") * lit(1.0e-9)).as("t0"),
          col("charge"), col("amp"), col("temp"))
      // the full wide frame the reference iterates over: 9 CFD threshold
      // columns + physics + environment columns
      val wide = (1 to 9).foldLeft(
        base
          .withColumn("Amplitude (V)", col("amp"))
          .withColumn("Collected charge (V s)", col("charge"))
          .withColumn("Temperature (°C)", col("temp") * lit(100.0))
          .withColumn("Humidity (%RH)", col("temp") * lit(500.0))
          .withColumn("Bias voltage (V)", lit(111.0))
          .withColumn("Bias current (A)", lit(1.0e-6))) { (df, i) =>
        df.withColumn(s"t_${i * 10} (s)", col("t0") + lit(i * 10) * lit(1.0e-10))
      }
      // per-trigger accept conjunction over BOTH devices, joined back (P5+J1)
      val accepted = wide.groupBy("n_trigger")
        .agg(bool_and(col("amp") <= lit(0.08) && col("charge") >= lit(10.0)).as("accepted"))
      val ignore = Set("n_trigger", "device_name", "t0", "charge", "amp", "temp") ++
        Seq(1, 2, 3, 4, 6, 7, 8, 9).map(i => s"t_${i * 10} (s)") ++
        Set("Temperature (°C)", "Humidity (%RH)", "Bias voltage (V)", "Bias current (A)")
      val dims = wide.columns.filterNot(ignore).sorted
      wide.join(accepted, "n_trigger")
        .select(
          Seq(col("n_trigger"), col("device_name"), col("accepted"))
            ++ dims.map(c => col(s"`$c`")): _*)
    })

  /** S13 waveform-overlay 2-D histogram table (reference
    * `scripts/clean_beta_scan.py:317-360`): per device, 2-D
    * (time, amplitude) bin occupancy with DATA-DRIVEN bins exactly as the
    * plot builds them — x bins start at the GLOBAL (unfiltered) time
    * minimum with the distinct-time grid step, y bins at the per-device
    * accepted minimum with the per-device distinct-amplitude step, counts
    * normalized to per-device probability (`histnorm='probability'`).
    * Steps are min-positive-diff over sorted distinct values (the
    * reference's `np.diff(sorted(set(...)))[0]` on its regular ADC grid),
    * computed in integer domain so bucket indices are bit-portable.
    */
  val s13WaveformsHist2d: Q = {
    import org.apache.spark.sql.expressions.Window
    Q(
      "s13_waveforms_hist2d",
      Some("""WITH w AS (
             |  SELECT 'dev' || CAST(l_linenumber AS VARCHAR) AS device_name,
             |    CAST(l_quantity AS BIGINT) AS t,
             |    CAST(FLOOR(l_extendedprice / 100.0) AS BIGINT) AS a,
             |    l_discount <= 0.08 AS accepted
             |  FROM lineitem WHERE l_linenumber IN (1, 2)),
             |tg AS (SELECT MIN(t) AS tmin FROM w),
             |ts AS (SELECT COALESCE(MIN(d), 1) AS tstep FROM (
             |    SELECT t - LAG(t) OVER (ORDER BY t) AS d
             |    FROM (SELECT DISTINCT t FROM w)) WHERE d IS NOT NULL AND d > 0),
             |acc AS (SELECT * FROM w WHERE accepted),
             |ag AS (SELECT device_name, MIN(a) AS amin FROM acc GROUP BY 1),
             |asx AS (SELECT device_name, COALESCE(MIN(d), 1) AS astep FROM (
             |    SELECT device_name, a - LAG(a) OVER (PARTITION BY device_name ORDER BY a) AS d
             |    FROM (SELECT DISTINCT device_name, a FROM acc))
             |  WHERE d IS NOT NULL AND d > 0 GROUP BY 1),
             |tot AS (SELECT device_name, COUNT(*) AS n FROM acc GROUP BY 1),
             |b AS (SELECT acc.device_name,
             |    tg.tmin + CAST(FLOOR(CAST(acc.t - tg.tmin AS DOUBLE) / ts.tstep) AS BIGINT)
             |      * ts.tstep AS t_lo,
             |    CAST(ag.amin + CAST(FLOOR(CAST(acc.a - ag.amin AS DOUBLE) / asx.astep) AS BIGINT)
             |      * asx.astep AS DOUBLE) / 10.0 AS a_lo
             |  FROM acc CROSS JOIN tg CROSS JOIN ts
             |  JOIN ag ON acc.device_name = ag.device_name
             |  JOIN asx ON acc.device_name = asx.device_name)
             |SELECT b.device_name, b.t_lo, b.a_lo,
             |  ROUND(CAST(COUNT(*) AS DOUBLE) / tot.n, 6) AS p
             |FROM b JOIN tot ON b.device_name = tot.device_name
             |GROUP BY b.device_name, b.t_lo, b.a_lo, tot.n""".stripMargin),
      (s, dir) => {
        val w = li(s, dir).filter(col("l_linenumber").isin(1, 2))
          .select(
            concat(lit("dev"), col("l_linenumber")).as("device_name"),
            col("l_quantity").cast("long").as("t"),
            floor(col("l_extendedprice") / lit(100.0)).cast("long").as("a"),
            (col("l_discount") <= lit(0.08)).as("accepted"))
        val tg = w.agg(min("t").as("tmin"))
        val ts = w.select("t").distinct()
          // distinct quantities: bounded by the value domain (~50), the
          // constant partition key marks the single partition deliberate
          .withColumn("d", col("t") - lag("t", 1)
            .over(Window.partitionBy(graft.plans.ScalarExpressions.singlePartitionKey(col("t"))).orderBy("t")))
          .filter(col("d").isNotNull && col("d") > 0)
          .agg(coalesce(min("d"), lit(1L)).as("tstep"))
        val acc = w.filter(col("accepted"))
        val ag = acc.groupBy("device_name").agg(min("a").as("amin"))
        val astep = acc.select("device_name", "a").distinct()
          .withColumn(
            "d",
            col("a") - lag("a", 1).over(Window.partitionBy("device_name").orderBy("a")))
          .filter(col("d").isNotNull && col("d") > 0)
          .groupBy("device_name").agg(coalesce(min("d"), lit(1L)).as("astep"))
        val tot = acc.groupBy("device_name").agg(count(lit(1)).as("n"))
        acc.crossJoin(broadcast(tg)).crossJoin(broadcast(ts))
          .join(broadcast(ag), "device_name")
          .join(broadcast(astep), "device_name")
          .groupBy(
            col("device_name"),
            (col("tmin")
              + floor((col("t") - col("tmin")).cast("double") / col("tstep")).cast("long")
              * col("tstep")).as("t_lo"),
            ((col("amin")
              + floor((col("a") - col("amin")).cast("double") / col("astep")).cast("long")
              * col("astep")).cast("double") / lit(10.0)).as("a_lo"))
          .agg(count(lit(1)).as("cnt"))
          .join(broadcast(tot), "device_name")
          .select(
            col("device_name"), col("t_lo"), col("a_lo"),
            round(col("cnt").cast("double") / col("n"), 6).as("p"))
      })
  }

  /** Bloom-pruned semi join ([[graft.operators.BloomJoin]]): lineitems of
    * the high-value order set (top ~5 % by price), reduced by a broadcast
    * bloom sketch BEFORE the exact semi join. The sketch admits only
    * false positives and the exact join removes them, so the oracle is
    * the plain semi join — the bloom changes the row count reaching the
    * shuffle, never the result. This is the runtime-filter pattern made
    * explicit: at 100 TB the probe side sheds ~95 % of its rows map-side
    * for a few MB of broadcast state.
    */
  val bloomPrune: Q = Q(
    "j_bloom_prune",
    Some(s"""SELECT l_returnflag, COUNT(*) AS n,
            |  ${D.dsum("l_extendedprice")} AS sum_price
            |FROM lineitem l
            |WHERE EXISTS (SELECT 1 FROM orders o
            |              WHERE o.o_orderkey = l.l_orderkey
            |                AND o.o_totalprice > 475000.0)
            |GROUP BY l_returnflag""".stripMargin),
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_returnflag", "l_extendedprice")
      val hot = Tables.load(s, dir, "orders")
        .filter(col("o_totalprice") > 475000.0)
        .select("o_orderkey")
      graft.operators.BloomJoin.semiJoin(li, hot, "l_orderkey", "o_orderkey",
          expectedItems = 100000L, numBits = 1L << 20)
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          DetAgg.dsum(col("l_extendedprice")).as("sum_price"))
    })

  def all: Seq[Q] = Seq(
    p2AggPredicate, p4Completeness, p5Cuts, p9Strings, p10Datetime, p13Casts,
    r1Pivot, r2Unpivot, j1Flags, j3Composite, j4SelfGrid,
    w1FirstHalf, w2TopK, w4WindowPack, fuzzyKeys,
    a5ArgMin, a7Histogram, a8Ecdf, a11Distinct, u1Union,
    p11Tag, a2Mad, a1MeanStd, s13ScatterMatrix, s13WaveformsHist2d,
    bloomPrune)
}
