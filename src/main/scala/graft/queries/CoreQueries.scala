package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.DetAgg
import graft.functions.DetAgg.{Sql => D}
import graft.sources.Tables

/** Core relational queries covering SURVEY §2 scans / filters / aggs.
  *
  * Each query is bound to the driver's synthetic TPC-H-ish tables
  * (TESTDATA.md) and paired with DuckDB oracle SQL. Floating-point
  * aggregates go through [[graft.functions.DetAgg]] so Spark and DuckDB
  * produce bit-identical doubles.
  */
object CoreQueries {

  private def li(s: SparkSession, dir: String) = Tables.load(s, dir, "lineitem")
  private def ord(s: SparkSession, dir: String) = Tables.load(s, dir, "orders")
  private def cust(s: SparkSession, dir: String) = Tables.load(s, dir, "customer")
  private def nat(s: SparkSession, dir: String) = Tables.load(s, dir, "nation")
  private def reg(s: SparkSession, dir: String) = Tables.load(s, dir, "region")

  /** A3/A1-style multi-aggregate groupBy — the reference's `mean_std` shape
    * (reference `scripts/utils.py:118-146`) on the pricing table. Hash
    * aggregate, partial+final map-side combine; scales linearly with data
    * and constant with group count (6 groups).
    */
  val q1Agg: Q = Q(
    "q1_agg",
    Some(s"""SELECT l_returnflag, l_linestatus,
            |  ${D.dsum("l_quantity")} AS sum_qty,
            |  ${D.dsum("l_extendedprice")} AS sum_base_price,
            |  ${D.dsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
            |  ${D.davg("l_quantity")} AS avg_qty,
            |  ${D.dstd("l_quantity")} AS std_qty,
            |  COUNT(*) AS count_order
            |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin),
    (s, dir) =>
      li(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          DetAgg.dsum(col("l_quantity")).as("sum_qty"),
          DetAgg.dsum(col("l_extendedprice")).as("sum_base_price"),
          DetAgg.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          DetAgg.davg(col("l_quantity")).as("avg_qty"),
          DetAgg.dstd(col("l_quantity")).as("std_qty"),
          count(lit(1)).as("count_order")))

  /** P1/P6: predicate filter + derived arithmetic column (reference
    * `query('...')` + column arithmetic, `scripts/time_resolution_beta_scan
    * .py:231`, `scripts/measurements.py:82-84`). Both the filter and the
    * 2-column projection push down to the parquet scan.
    */
  val p1Filter: Q = Q(
    "p1_filter_project",
    Some("""SELECT l_orderkey, l_linenumber,
           |  l_extendedprice * (1 - l_discount) AS revenue,
           |  ABS(l_extendedprice - l_quantity * 1000.0) AS abs_dev
           |FROM lineitem
           |WHERE l_quantity > 45 AND l_shipdate >= TIMESTAMP '1995-07-01'""".stripMargin),
    (s, dir) =>
      li(s, dir)
        .filter(col("l_quantity") > 45 && col("l_shipdate") >= to_timestamp(lit("1995-07-01")))
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          abs(col("l_extendedprice") - col("l_quantity") * lit(1000.0)).as("abs_dev")))

  /** J2: broadcast dimension join chain (reference device-info lookups,
    * `scripts/compare_measurements.py:45-48`). nation/region are tiny —
    * explicitly broadcast so the fact table never shuffles.
    */
  val j2Dim: Q = Q(
    "j2_dim_join",
    Some(s"""SELECT r_name, n_name, COUNT(*) AS n_cust,
            |  ${D.dsum("c_acctbal")} AS sum_bal
            |FROM customer
            |JOIN nation ON c_nationkey = n_nationkey
            |JOIN region ON n_regionkey = r_regionkey
            |GROUP BY r_name, n_name""".stripMargin),
    (s, dir) =>
      cust(s, dir)
        .join(broadcast(nat(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_cust"), DetAgg.dsum(col("c_acctbal")).as("sum_bal")))

  /** The complete TPC-H Q1 shape (all eight aggregates + shipdate
    * predicate) — the canonical pricing-summary benchmark headline.
    */
  val q1Full: Q = Q(
    "q1_tpch_full",
    Some(s"""SELECT l_returnflag, l_linestatus,
            |  ${D.dsum("l_quantity")} AS sum_qty,
            |  ${D.dsum("l_extendedprice")} AS sum_base_price,
            |  ${D.dsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
            |  ${D.dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
            |  ${D.davg("l_quantity")} AS avg_qty,
            |  ${D.davg("l_extendedprice")} AS avg_price,
            |  ${D.davg("l_discount")} AS avg_disc,
            |  COUNT(*) AS count_order
            |FROM lineitem
            |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            |GROUP BY l_returnflag, l_linestatus""".stripMargin),
    (s, dir) =>
      li(s, dir)
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          DetAgg.dsum(col("l_quantity")).as("sum_qty"),
          DetAgg.dsum(col("l_extendedprice")).as("sum_base_price"),
          DetAgg.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          DetAgg.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax"))).as("sum_charge"),
          DetAgg.davg(col("l_quantity")).as("avg_qty"),
          DetAgg.davg(col("l_extendedprice")).as("avg_price"),
          DetAgg.davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order")))

  /** TPC-H Q3 shape: selective fact×fact×dim three-way join with a
    * ranked aggregate cut — the canonical "shipping priority" OLAP
    * pattern. Join shape is pinned for scale: the filtered customer
    * side BROADCASTS into orders, and the orders×lineitem equi-join is
    * a SHUFFLED hash join on the natural key with the selective
    * customer⋈orders output as build side — without the hint, sf0.1
    * file stats tempt AQE into broadcasting the pruned LINEITEM fact
    * scan, a shape that dies at 100 TB (and its 600k-row broadcast
    * build was the slowest step of the whole suite here). The top-10 is
    * round-then-order with full key tiebreaks.
    */
  val q3Shipping: Q = Q(
    "q3_shipping_priority",
    Some(s"""SELECT l_orderkey,
            |  ROUND(${D.dsum("l_extendedprice * (1 - l_discount)")}, 6) AS revenue,
            |  o_orderdate, o_orderpriority
            |FROM customer
            |JOIN orders ON c_custkey = o_custkey
            |JOIN lineitem ON l_orderkey = o_orderkey
            |WHERE c_mktsegment = 'BUILDING'
            |GROUP BY l_orderkey, o_orderdate, o_orderpriority
            |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin),
    (s, dir) =>
      cust(s, dir).filter(col("c_mktsegment") === "BUILDING").hint("broadcast")
        .join(ord(s, dir), col("c_custkey") === col("o_custkey"))
        .hint("shuffle_hash")
        .join(li(s, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(round(
          DetAgg.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 6)
          .as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10))

  /** S13 extension: 2-D histogram (heatmap plot table) — quantity ×
    * discount occupancy per cell, clamped edges, one hash aggregate.
    */
  val hist2d: Q = Q(
    "a7_histogram2d",
    Some("""SELECT
           |  CAST(LEAST(GREATEST(FLOOR((l_quantity - 0.0e0) / 5.0e0), 0), 9) AS BIGINT) AS bx,
           |  CAST(LEAST(GREATEST(FLOOR((l_discount - 0.0e0) / 1.0e-2), 0), 10) AS BIGINT) AS by,
           |  COUNT(*) AS n
           |FROM lineitem GROUP BY 1, 2""".stripMargin),
    (s, dir) =>
      li(s, dir)
        .select(
          least(greatest(floor((col("l_quantity") - lit(0.0)) / lit(5.0)), lit(0L)), lit(9L))
            .as("bx"),
          least(greatest(floor((col("l_discount") - lit(0.0)) / lit(0.01)), lit(0L)), lit(10L))
            .as("by"))
        .groupBy("bx", "by")
        .agg(count(lit(1)).as("n")))

  /** TPC-H Q5 shape — local supplier volume: the 6-way star+snowflake
    * join (customer × orders × lineitem × supplier × nation × region)
    * with the co-location predicate `c_nationkey = s_nationkey`. Plan
    * contract: region→nation is a broadcast chain onto supplier; the
    * two fact joins shuffle on their natural keys; the date filter
    * pushes into the orders scan. This is the canonical "does the
    * optimizer order a snowflake correctly" probe.
    */
  val q5LocalSupplier: Q = Q(
    "q5_local_supplier_volume",
    Some(s"""SELECT n_name,
            |  ROUND(${D.dsum("l_extendedprice * (1 - l_discount)")}, 6) AS revenue
            |FROM customer
            |JOIN orders ON c_custkey = o_custkey
            |JOIN lineitem ON l_orderkey = o_orderkey
            |JOIN supplier ON l_suppkey = s_suppkey
            |  AND c_nationkey = s_nationkey
            |JOIN nation ON s_nationkey = n_nationkey
            |JOIN region ON n_regionkey = r_regionkey
            |WHERE r_name = 'ASIA'
            |  AND o_orderdate >= TIMESTAMP '1996-01-01'
            |  AND o_orderdate < TIMESTAMP '1998-01-01'
            |GROUP BY n_name""".stripMargin),
    (s, dir) => {
      val nat = Tables.load(s, dir, "nation")
      val reg = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
      val sup = Tables.load(s, dir, "supplier")
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
      val o = ord(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      cust(s, dir)
        .join(o, col("c_custkey") === col("o_custkey"))
        .join(li(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg(round(
          DetAgg.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 6)
          .as("revenue"))
    })

  /** TPC-H Q18 shape — large-volume customers: the HAVING-driven
    * semi-join (orders whose line quantities sum past a threshold, then
    * the customer/order detail for exactly those). The big aggregate
    * runs FIRST and only its survivors join back — the fact table never
    * carries customer columns through the heavy aggregation.
    */
  val q18LargeVolume: Q = Q(
    "q18_large_volume_customer",
    Some(s"""WITH big AS (
            |  SELECT l_orderkey, ${D.dsum("l_quantity")} AS sum_qty
            |  FROM lineitem GROUP BY l_orderkey
            |  HAVING ${D.dsum("l_quantity")} > 250.0)
            |SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
            |FROM big
            |JOIN orders ON o_orderkey = l_orderkey
            |JOIN customer ON c_custkey = o_custkey
            |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin),
    (s, dir) => {
      val big = li(s, dir).groupBy("l_orderkey")
        .agg(DetAgg.dsum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 250.0)
      big
        .join(ord(s, dir), col("o_orderkey") === col("l_orderkey"))
        .join(cust(s, dir), col("c_custkey") === col("o_custkey"))
        .select("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    })

  /** TPC-H Q10 shape — returned-item reporting: the "who returned the
    * most revenue this quarter" customer ranking, completing the TPC-H
    * join-shape family (Q1 scan-agg, Q3 selective 3-way, Q5 snowflake,
    * Q18 having-semi-join; Q10 is the QUARTER-WINDOWED fact×fact join
    * with a selective FACT-side predicate on each fact: the date window
    * prunes the orders scan, `l_returnflag = 'R'` prunes lineitem — both
    * must reach their parquet scans as pushed filters). Nation is a
    * broadcast dim; the top-20 is round-then-order with the custkey
    * tiebreak.
    */
  val q10ReturnedItems: Q = Q(
    "q10_returned_items",
    Some(s"""SELECT c_custkey, c_name,
            |  ROUND(${D.dsum("l_extendedprice * (1 - l_discount)")}, 6) AS revenue,
            |  c_acctbal, n_name
            |FROM customer
            |JOIN orders ON c_custkey = o_custkey
            |JOIN lineitem ON l_orderkey = o_orderkey
            |JOIN nation ON c_nationkey = n_nationkey
            |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
            |  AND o_orderdate < TIMESTAMP '1996-04-01'
            |  AND l_returnflag = 'R'
            |GROUP BY c_custkey, c_name, c_acctbal, n_name
            |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin),
    (s, dir) => {
      val nat = Tables.load(s, dir, "nation").select("n_nationkey", "n_name")
      val o = ord(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      val l = li(s, dir).filter(col("l_returnflag") === "R")
      cust(s, dir)
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(round(
          DetAgg.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 6)
          .as("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    })

  /** TPC-H Q14 shape — promotion effect: the conditional-share aggregate
    * over a month-windowed fact×dim join (promo revenue as a percent of
    * all revenue). The date filter pushes into the lineitem scan; part
    * is the broadcast dim; both sums ride ONE conditional exact-decimal
    * aggregate — hash-exact after the final round-6 (the division of
    * two exact-decimal casts is one IEEE op, rounded like the TPC-H
    * siblings' revenue columns).
    */
  val q14PromoEffect: Q = Q(
    "q14_promo_effect",
    Some(s"""SELECT
            |  ROUND(100.0 * ${D.dsumExact("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
            |    / ${D.dsumExact("l_extendedprice * (1 - l_discount)")}, 6)
            |    AS promo_revenue_pct,
            |  CAST(COUNT(*) AS BIGINT) AS n
            |FROM lineitem JOIN part ON l_partkey = p_partkey
            |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
            |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin),
    (s, dir) => {
      val p = Tables.load(s, dir, "part").select("p_partkey", "p_type")
      li(s, dir)
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .agg(
          DetAgg.dsum(when(col("p_type").startsWith("PROMO"),
            col("l_extendedprice") * (lit(1) - col("l_discount")))
            .otherwise(lit(0.0))).as("__promo"),
          DetAgg.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("__all"),
          count(lit(1)).as("n"))
        .select(
          round(lit(100.0) * col("__promo") / col("__all"), 6)
            .as("promo_revenue_pct"),
          col("n"))
    })

  /** TPC-H Q19 shape — discounted revenue under a brand × quantity-range
    * DISJUNCTION: the classic "OR-of-ANDs" predicate that tests whether
    * the optimizer can still push a common conjunct (the join key) while
    * the disjunction stays row-local. Broadcast part dim; one
    * exact-decimal sum — hash-exact round-6.
    */
  val q19DiscountRevenue: Q = {
    val pred =
      """((p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11)
        | OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20)
        | OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30))""".stripMargin
    Q(
      "q19_discount_revenue",
      Some(s"""SELECT ROUND(${D.dsum("l_extendedprice * (1 - l_discount)")}, 6)
              |    AS revenue,
              |  CAST(COUNT(*) AS BIGINT) AS n
              |FROM lineitem JOIN part ON l_partkey = p_partkey
              |WHERE $pred""".stripMargin),
      (s, dir) => {
        val p = Tables.load(s, dir, "part").select("p_partkey", "p_brand")
        li(s, dir)
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .filter(expr(pred))
          .agg(
            round(DetAgg.dsum(
              col("l_extendedprice") * (lit(1) - col("l_discount"))), 6)
              .as("revenue"),
            count(lit(1)).as("n"))
      })
  }

  /** TPC-H Q4 shape — order-priority checking: count a quarter's orders
    * by priority where at least one lineitem satisfies a per-line
    * predicate (the schema's stand-in for commit<receipt is a returned
    * line, `l_returnflag = 'R'` — same EXISTS/semi-join shape). The
    * date filter pushes into the orders scan, the flag filter into the
    * lineitem scan; the existence test is ONE left-semi shuffle join on
    * the order key (never an aggregate-then-join), so at 100 TB it is
    * the canonical key-partitioned semi join with both inputs pruned.
    */
  val q4OrderPriority: Q = Q(
    "q4_order_priority",
    Some("""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
           |FROM orders
           |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
           |  AND o_orderdate < TIMESTAMP '1996-10-01'
           |  AND EXISTS (SELECT 1 FROM lineitem
           |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
           |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
    (s, dir) =>
      ord(s, dir)
        .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
        .join(
          li(s, dir).filter(col("l_returnflag") === "R").select("l_orderkey"),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority"))

  /** TPC-H Q6 shape — forecast-revenue change: the pure pushdown
    * benchmark (year × discount-band × quantity filter, no join, one
    * exact-decimal sum). All three predicates reach the parquet scan as
    * PushedFilters; the aggregate is a 1-row map-side combine.
    */
  val q6ForecastRevenue: Q = Q(
    "q6_forecast_revenue",
    Some(s"""SELECT ROUND(${D.dsum("l_extendedprice * l_discount")}, 6)
            |    AS revenue,
            |  CAST(COUNT(*) AS BIGINT) AS n
            |FROM lineitem
            |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            |  AND l_shipdate < TIMESTAMP '1997-01-01'
            |  AND l_discount BETWEEN 0.05 AND 0.07
            |  AND l_quantity < 24""".stripMargin),
    (s, dir) =>
      li(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(
          round(DetAgg.dsum(col("l_extendedprice") * col("l_discount")), 6)
            .as("revenue"),
          count(lit(1)).as("n")))

  /** TPC-H Q12 shape — shipping-mode / priority matrix: per line
    * category (the schema's mode stand-in is `l_returnflag`), how many
    * of a year's lines belong to critical-priority orders vs not — the
    * classic fact→dim join with a two-way conditional count. Orders is
    * the join's smaller side only at toy SF, so the join stays a
    * key-partitioned shuffle; the year filter pushes into the lineitem
    * scan. Both CASE counts ride one aggregate (cast BIGINT on both
    * sides — the type-gate discipline).
    */
  val q12ShipPriority: Q = Q(
    "q12_ship_priority",
    Some("""SELECT l_returnflag AS mode,
           |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
           |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
           |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           |WHERE l_returnflag IN ('A', 'R')
           |  AND l_shipdate >= TIMESTAMP '1996-01-01'
           |  AND l_shipdate < TIMESTAMP '1997-01-01'
           |GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, dir) => {
      val crit = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      li(s, dir)
        .filter(col("l_returnflag").isin("A", "R") &&
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(ord(s, dir).select("o_orderkey", "o_orderpriority"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_returnflag").as("mode"))
        .agg(
          sum(when(crit, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!crit, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy("mode")
    })

  /** TPC-H Q13 shape — customer order-count distribution: LEFT join so
    * zero-order customers keep a 0 bucket (the whole point of Q13), a
    * join-predicate filter (only non-LOW orders count), then the
    * two-level aggregate. COUNT(o_orderkey) counts matches only —
    * portable null semantics on both engines.
    */
  val q13CustDist: Q = Q(
    "q13_custdist",
    Some("""WITH c_orders AS (
           |  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
           |  FROM customer LEFT JOIN orders
           |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
           |  GROUP BY c_custkey)
           |SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
           |FROM c_orders GROUP BY c_count
           |ORDER BY custdist DESC, c_count DESC""".stripMargin),
    (s, dir) =>
      cust(s, dir).select("c_custkey")
        .join(
          ord(s, dir).filter(col("o_orderpriority") =!= "5-LOW")
            .select("o_custkey", "o_orderkey"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc))

  /** TPC-H Q17 shape — small-quantity-order revenue: per-part average
    * quantity (exact-decimal davg — one IEEE division, bit-portable),
    * lines under 20 % of their part's average, brand-filtered, total
    * extendedprice / 7. The correlated scalar subquery is DECORRELATED
    * on both sides into a per-part aggregate + equi join (the oracle
    * replays the decorrelated text, so the threshold double is the
    * same IEEE value in both engines); the brand filter semi-prunes
    * the per-part aggregate input, and part is broadcast.
    */
  val q17SmallQtyRevenue: Q = Q(
    "q17_small_qty_revenue",
    Some(s"""WITH pq AS (
            |  SELECT l_partkey, 0.2 * ${D.davg("l_quantity")} AS thresh
            |  FROM lineitem JOIN part ON p_partkey = l_partkey
            |  WHERE p_brand = 'Brand#1' GROUP BY l_partkey)
            |SELECT ROUND(${D.dsumExact("l_extendedprice")} / 7.0, 6)
            |    AS avg_yearly,
            |  CAST(COUNT(*) AS BIGINT) AS n
            |FROM lineitem JOIN pq ON lineitem.l_partkey = pq.l_partkey
            |WHERE l_quantity < thresh""".stripMargin),
    (s, dir) => {
      val brandParts = Tables.load(s, dir, "part")
        .filter(col("p_brand") === "Brand#1").select("p_partkey")
      val pq = li(s, dir)
        .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
        .groupBy("l_partkey")
        .agg((lit(0.2) * DetAgg.davg(col("l_quantity"))).as("thresh"))
      li(s, dir)
        .join(pq.withColumnRenamed("l_partkey", "__pk"),
          col("l_partkey") === col("__pk"))
        .filter(col("l_quantity") < col("thresh"))
        .agg(
          round(DetAgg.dsum(col("l_extendedprice")) / lit(7.0), 6)
            .as("avg_yearly"),
          count(lit(1)).as("n"))
    })

  /** TPC-H Q22 shape — global sales opportunity: customers from a
    * country set with above-average positive balance and no RECENT
    * orders (the schema's phone-prefix stand-in is `c_nationkey`; the
    * no-orders test is date-bounded because this dataset gives every
    * customer at least one lifetime order — lapsed-since-2000 keeps the
    * anti join non-vacuous at every SF). The average is a 1-row
    * broadcast (exact-decimal davg), the lapsed test ONE anti join on
    * the customer key with the date filter pushed into the orders scan,
    * the census a ≤|countries|-row aggregate — at 100 TB: scan +
    * broadcast + anti join, nothing else.
    */
  val q22GlobalSales: Q = Q(
    "q22_global_sales",
    Some(s"""WITH pos AS (
            |  SELECT ${D.davg("c_acctbal")} AS avg_bal FROM customer
            |  WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 2, 3, 4, 5)),
            |cand AS (
            |  SELECT c_custkey, c_nationkey, c_acctbal
            |  FROM customer CROSS JOIN pos
            |  WHERE c_nationkey IN (1, 2, 3, 4, 5) AND c_acctbal > avg_bal)
            |SELECT c_nationkey AS cntrycode,
            |  CAST(COUNT(*) AS BIGINT) AS numcust,
            |  ${D.dsum("c_acctbal")} AS totacctbal
            |FROM cand LEFT JOIN (
            |    SELECT DISTINCT o_custkey FROM orders
            |    WHERE o_orderdate >= TIMESTAMP '2000-01-01') o
            |  ON o.o_custkey = c_custkey
            |WHERE o_custkey IS NULL
            |GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, dir) => {
      val inSet = col("c_nationkey").isin(1, 2, 3, 4, 5)
      val c = cust(s, dir)
      val avgBal = c.filter(col("c_acctbal") > 0.0 && inSet)
        .agg(DetAgg.davg(col("c_acctbal")).as("avg_bal"))
      c.filter(inSet)
        .crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(
          ord(s, dir)
            .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
            .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").as("cntrycode"))
        .agg(
          count(lit(1)).as("numcust"),
          DetAgg.dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy("cntrycode")
    })

  /** TPC-H Q9 shape — product-type profit by supplier nation and year:
    * the every-year rollup whose measure spans TWO fact-adjacent tables
    * (classic Q9's `extendedprice·(1−discount) − supplycost·quantity`;
    * this schema has no partsupp, so the unit cost adapts to
    * `0.5·p_retailprice` — the arithmetic still reaches across the
    * part join, which is the shape that matters). Parts are filtered
    * by name substring BEFORE joining (the filter prunes the dim to a
    * broadcast), supplier→nation chains as a broadcast, and the only
    * shuffle is lineitem ⋈ orders on the order key for the year. The
    * profit terms are products of round-≤2 quantities, so the scale-12
    * decimal route ([[DetAgg.dsumP]]) sums them exactly on both
    * engines — boundary-free, round-6 output.
    */
  val q9ProductTypeProfit: Q = Q(
    "q9_product_type_profit",
    Some(s"""WITH profit AS (
            |  SELECT n_name AS nation,
            |    CAST(year(o_orderdate) AS BIGINT) AS o_year,
            |    l_extendedprice * (1 - l_discount)
            |      - 0.5 * p_retailprice * l_quantity AS amount
            |  FROM lineitem
            |  JOIN part ON p_partkey = l_partkey
            |  JOIN supplier ON s_suppkey = l_suppkey
            |  JOIN nation ON n_nationkey = s_nationkey
            |  JOIN orders ON o_orderkey = l_orderkey
            |  WHERE p_name LIKE '%red%')
            |SELECT nation, o_year,
            |  ROUND(${D.dsumP("amount")}, 6) AS sum_profit,
            |  CAST(COUNT(*) AS BIGINT) AS n
            |FROM profit GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    (s, dir) => {
      val p = Tables.load(s, dir, "part")
        .filter(col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
      val supp = Tables.load(s, dir, "supplier")
        .join(broadcast(nat(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation"))
      li(s, dir)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(ord(s, dir).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(
          col("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          round(DetAgg.dsumP(
            col("l_extendedprice") * (lit(1) - col("l_discount"))
              - lit(0.5) * col("p_retailprice") * col("l_quantity")), 6)
            .as("sum_profit"),
          count(lit(1)).as("n"))
        .orderBy("nation", "o_year")
    })

  /** TPC-H Q21 shape — suppliers who kept orders waiting: the
    * multi-existence fact query (a semi join AND an anti join against
    * the SAME fact on the same key) that the rest of the suite never
    * exercises. The schema has no commit/receipt dates, so "late"
    * adapts to `l_shipdate > o_orderdate + 60 days` — line-local once
    * the order is joined, the same planner shape as Q21's
    * receipt > commit. A supplier's late line in a finished (status
    * 'F') AFRICA-region order counts iff the order involves ANOTHER
    * supplier (semi join on the order key, supplier-inequality riding
    * the join condition) and no OTHER supplier was late on that order
    * (anti join on the order key, lateness + inequality riding the
    * condition — referencing the already-joined o_orderdate, so the
    * probe never rejoins orders). At 100 TB: the geo dims
    * (supplier⋈nation⋈region) broadcast; lineitem⋈orders, the semi
    * probe and the anti probe are each ONE hash-partitioned shuffle on
    * the order key — three fact shuffles, no nested loop anywhere
    * (PlanSpec pins it); the top-100 is a TakeOrdered with the unique
    * supplier name as tiebreak, never a global sort.
    */
  val q21SuppliersKeptWaiting: Q = Q(
    "q21_suppliers_kept_waiting",
    Some("""SELECT n_name, s_name, CAST(COUNT(*) AS BIGINT) AS numwait
           |FROM supplier s
           |JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
           |JOIN orders o ON o.o_orderkey = l1.l_orderkey
           |JOIN nation n ON s.s_nationkey = n.n_nationkey
           |JOIN region r ON n.n_regionkey = r.r_regionkey
           |WHERE o.o_orderstatus = 'F'
           |  AND r.r_name = 'AFRICA'
           |  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
           |  AND EXISTS (SELECT 1 FROM lineitem l2
           |    WHERE l2.l_orderkey = l1.l_orderkey
           |      AND l2.l_suppkey <> l1.l_suppkey)
           |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
           |    WHERE l3.l_orderkey = l1.l_orderkey
           |      AND l3.l_suppkey <> l1.l_suppkey
           |      AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
           |GROUP BY 1, 2 ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin),
    (s, dir) => {
      val supGeo = Tables.load(s, dir, "supplier")
        .join(broadcast(nat(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg(s, dir).filter(col("r_name") === "AFRICA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
      val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")
      val l1 = li(s, dir).select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(
          ord(s, dir).filter(col("o_orderstatus") === "F")
            .select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(late)
        .join(broadcast(supGeo), col("l_suppkey") === col("s_suppkey"))
      val l2 = li(s, dir).select(
        col("l_orderkey").as("l2_orderkey"), col("l_suppkey").as("l2_suppkey"))
      val l3 = li(s, dir).select(
        col("l_orderkey").as("l3_orderkey"), col("l_suppkey").as("l3_suppkey"),
        col("l_shipdate").as("l3_shipdate"))
      l1
        .join(l2,
          col("l_orderkey") === col("l2_orderkey") &&
            col("l2_suppkey") =!= col("l_suppkey"), "left_semi")
        .join(l3,
          col("l_orderkey") === col("l3_orderkey") &&
            col("l3_suppkey") =!= col("l_suppkey") &&
            col("l3_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_anti")
        .groupBy("n_name", "s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    })

  /** TPC-H Q7 shape — volume shipping between a nation PAIR: the
    * five-way star (lineitem → supplier/nation, → orders → customer/
    * nation) with the pair disjunction and a per-year revenue rollup.
    * Supplier and customer sides are pre-FILTERED to the two nations
    * before joining (the pair predicate only references the names, so
    * pushing it below the joins is semantics-preserving and prunes both
    * dims to 1/25th), then broadcast; the only shuffle is lineitem ⋈
    * orders on the order key. Exact-decimal revenue, round-6.
    */
  val q7NationVolume: Q = {
    val pair =
      """((supp_nation = 'NATION_1' AND cust_nation = 'NATION_2')
        | OR (supp_nation = 'NATION_2' AND cust_nation = 'NATION_1'))""".stripMargin
    Q(
      "q7_nation_volume",
      Some(s"""WITH j AS (
              |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
              |    l_extendedprice * (1 - l_discount) AS volume
              |  FROM lineitem
              |  JOIN supplier ON s_suppkey = l_suppkey
              |  JOIN orders ON o_orderkey = l_orderkey
              |  JOIN customer ON c_custkey = o_custkey
              |  JOIN nation n1 ON n1.n_nationkey = s_nationkey
              |  JOIN nation n2 ON n2.n_nationkey = c_nationkey
              |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              |    AND l_shipdate < TIMESTAMP '1998-01-01')
              |SELECT supp_nation, cust_nation, l_year,
              |  ROUND(${D.dsumExact("volume")}, 6) AS revenue,
              |  CAST(COUNT(*) AS BIGINT) AS n
              |FROM j WHERE $pair
              |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin),
      (s, dir) => {
        val names = Seq("NATION_1", "NATION_2")
        val n = nat(s, dir).select("n_nationkey", "n_name")
        val supp = Tables.load(s, dir, "supplier")
          .join(n, col("s_nationkey") === col("n_nationkey"))
          .filter(col("n_name").isin(names: _*))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        val c = cust(s, dir)
          .join(n, col("c_nationkey") === col("n_nationkey"))
          .filter(col("n_name").isin(names: _*))
          .select(col("c_custkey"), col("n_name").as("cust_nation"))
        li(s, dir)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .join(ord(s, dir).select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .filter(expr(pair))
          .groupBy(
            col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("long").as("l_year"))
          .agg(
            round(DetAgg.dsum(
              col("l_extendedprice") * (lit(1) - col("l_discount"))), 6)
              .as("revenue"),
            count(lit(1)).as("n"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      })
  }

  /** TPC-H Q15 shape — top supplier by quarterly revenue: the
    * view-plus-max pattern (revenue per supplier, keep the argmax
    * row(s)). The max is a 1-row broadcast and the equality compare is
    * between two doubles DERIVED FROM THE SAME exact-decimal sum — the
    * only way a double equality join is portable. Supplier is the
    * broadcast dim.
    */
  val q15TopSupplier: Q = Q(
    "q15_top_supplier",
    Some(s"""WITH rev AS (
            |  SELECT l_suppkey,
            |    ${D.dsumExact("l_extendedprice * (1 - l_discount)")}
            |      AS total_revenue
            |  FROM lineitem
            |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            |    AND l_shipdate < TIMESTAMP '1996-04-01'
            |  GROUP BY l_suppkey),
            |m AS (SELECT MAX(total_revenue) AS mr FROM rev)
            |SELECT s_suppkey, s_name, total_revenue
            |FROM supplier JOIN rev ON s_suppkey = l_suppkey CROSS JOIN m
            |WHERE total_revenue = mr ORDER BY s_suppkey""".stripMargin),
    (s, dir) => {
      val rev = li(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(DetAgg.dsum(
          col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("total_revenue"))
      val m = rev.agg(max("total_revenue").as("mr"))
      Tables.load(s, dir, "supplier").select("s_suppkey", "s_name")
        .join(rev, col("s_suppkey") === col("l_suppkey"))
        .crossJoin(broadcast(m))
        .filter(col("total_revenue") === col("mr"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    })

  /** TPC-H Q8 shape — national market share: of a REGION's customers'
    * spending on one part TYPE, what fraction went to suppliers from
    * one NATION, per year. The densest star in the registry (lineitem
    * → part, supplier/nation, orders → customer/nation/region): part,
    * supplier-side, and customer-side relations are all pre-filtered
    * and broadcast (the region filter prunes the customer dim to 1/5th
    * BEFORE the join — predicate-into-dim, the Q7 discipline), so the
    * only shuffle is lineitem ⋈ orders. The share is a conditional
    * exact-decimal sum over the total sum — round-6.
    */
  val q8MarketShare: Q = Q(
    "q8_market_share",
    Some(s"""WITH j AS (
            |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
            |    l_extendedprice * (1 - l_discount) AS volume,
            |    sn.n_name AS supp_nation
            |  FROM lineitem
            |  JOIN part ON p_partkey = l_partkey
            |  JOIN supplier ON s_suppkey = l_suppkey
            |  JOIN nation sn ON sn.n_nationkey = s_nationkey
            |  JOIN orders ON o_orderkey = l_orderkey
            |  JOIN customer ON c_custkey = o_custkey
            |  JOIN nation cn ON cn.n_nationkey = c_nationkey
            |  JOIN region ON r_regionkey = cn.n_regionkey
            |  WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
            |    AND o_orderdate >= TIMESTAMP '1996-01-01'
            |    AND o_orderdate < TIMESTAMP '1998-01-01')
            |SELECT o_year,
            |  ROUND(${D.dsumExact("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END")}
            |    / ${D.dsumExact("volume")}, 6) AS mkt_share,
            |  CAST(COUNT(*) AS BIGINT) AS n
            |FROM j GROUP BY o_year ORDER BY o_year""".stripMargin),
    (s, dir) => {
      val n = nat(s, dir)
      val p = Tables.load(s, dir, "part")
        .filter(col("p_type") === "ECONOMY").select("p_partkey")
      val supp = Tables.load(s, dir, "supplier")
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val custAsia = cust(s, dir)
        .join(n.withColumnRenamed("n_name", "cn_name"),
          col("c_nationkey") === col("n_nationkey"))
        .join(reg(s, dir).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select("c_custkey")
      li(s, dir)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(
          ord(s, dir)
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
            .select("o_orderkey", "o_custkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(custAsia), col("o_custkey") === col("c_custkey"))
        .withColumn("volume",
          col("l_extendedprice") * (lit(1) - col("l_discount")))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          round(
            DetAgg.dsum(when(col("supp_nation") === "NATION_3", col("volume"))
              .otherwise(lit(0.0)))
              / DetAgg.dsum(col("volume")), 6).as("mkt_share"),
          count(lit(1)).as("n"))
        .orderBy("o_year")
    })

  /** The derived part-supplier COST relation for the Q2 shape — the
    * schema has no partsupp table (TESTDATA.md), so ps_supplycost is
    * DERIVED from the fact: per (part, supplier) pair, the minimum
    * observed unit price. MIN over doubles is an exact pick (no
    * accumulation), and the unit price is one IEEE division — both
    * engines bit-agree. Q20's availqty stand-in (shipped-quantity
    * totals) is a DIFFERENT derivation built inline in
    * [[q20PotentialPromotion]] — the two queries share the
    * no-partsupp premise, not this relation.
    */
  private def psCost(s: SparkSession, dir: String) =
    li(s, dir)
      .groupBy(
        col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("ps_supplycost"))

  /** TPC-H Q2 shape — min-cost supplier per part: the CORRELATED SCALAR
    * SUBQUERY planner shape (for each part, the min supply cost among
    * the region's suppliers) that the rest of the suite never
    * exercises. The oracle keeps the correlated form verbatim; the
    * Spark plan is the classical decorrelation — aggregate the
    * candidate (part × regional-supplier) relation by part, then join
    * the min back on (key, cost) equality, keeping ALL tied suppliers
    * exactly like the subquery does. At 100 TB: supplier⋈nation⋈region
    * broadcasts (geo dims), the derived ps aggregates the fact on its
    * natural (part, supp) key, and the min-cost relation (≤ one row per
    * filtered part) broadcasts back onto the candidates — the fact
    * shuffles ONCE, on the ps groupBy; no nested loop (PlanSpec pins
    * it).
    */
  val q2MinCostSupplier: Q = Q(
    "q2_min_cost_supplier",
    Some("""WITH ps AS (SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           |    MIN(l_extendedprice / l_quantity) AS ps_supplycost
           |  FROM lineitem GROUP BY 1, 2),
           |geo AS (SELECT s_suppkey, s_name, s_acctbal, n_name
           |  FROM supplier
           |  JOIN nation ON s_nationkey = n_nationkey
           |  JOIN region ON n_regionkey = r_regionkey
           |  WHERE r_name = 'EUROPE')
           |SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           |  ps_supplycost AS supplycost
           |FROM part, ps, geo
           |WHERE p_partkey = ps_partkey AND ps_suppkey = s_suppkey
           |  AND p_size <= 5 AND p_type = 'LARGE'
           |  AND ps_supplycost = (
           |    SELECT MIN(ps2.ps_supplycost)
           |    FROM ps ps2, geo g2
           |    WHERE ps2.ps_partkey = p_partkey
           |      AND ps2.ps_suppkey = g2.s_suppkey)
           |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
           |LIMIT 100""".stripMargin),
    (s, dir) => {
      val geo = Tables.load(s, dir, "supplier")
        .join(broadcast(nat(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg(s, dir).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      val pf = Tables.load(s, dir, "part")
        .filter(col("p_size") <= 5 && col("p_type") === "LARGE")
        .select("p_partkey", "p_name")
      val cand = psCost(s, dir)
        .join(broadcast(geo), col("ps_suppkey") === col("s_suppkey"))
        .join(broadcast(pf), col("ps_partkey") === col("p_partkey"))
      val best = cand.groupBy(col("ps_partkey").as("mk"))
        .agg(min("ps_supplycost").as("min_cost"))
      cand
        .join(broadcast(best),
          col("ps_partkey") === col("mk") &&
            col("ps_supplycost") === col("min_cost"))
        .select(
          col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_name"),
          col("ps_supplycost").as("supplycost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    })

  /** TPC-H Q11 shape — important stock: the GLOBAL-FRACTION HAVING
    * (keep groups whose value exceeds a fraction of the grand total)
    * the suite never exercises. Per-part revenue from one region's
    * suppliers, kept when above 0.1% of that region's total. Both the
    * per-part sums and the grand total ride the exact scale-12 decimal
    * route ([[DetAgg.dsumP]]), so the threshold comparison is one IEEE
    * `>` over bit-identical doubles in both engines. At 100 TB: geo
    * dims broadcast, ONE fact shuffle for the per-part aggregate, and
    * the 1-row threshold broadcasts onto the groups (the p2 scalar-
    * predicate pattern) — never a second fact pass on the probe side.
    */
  val q11ImportantStock: Q = Q(
    "q11_important_stock",
    Some(s"""WITH f AS (
            |  SELECT l_partkey, l_extendedprice * (1 - l_discount) AS rev
            |  FROM lineitem
            |  JOIN supplier ON l_suppkey = s_suppkey
            |  JOIN nation ON s_nationkey = n_nationkey
            |  JOIN region ON n_regionkey = r_regionkey
            |  WHERE r_name = 'ASIA'),
            |v AS (SELECT l_partkey AS partkey, ${D.dsumP("rev")} AS val
            |  FROM f GROUP BY 1),
            |t AS (SELECT ${D.dsumP("rev")} * 0.001 AS thr FROM f)
            |SELECT partkey, ROUND(val, 6) AS value
            |FROM v CROSS JOIN t
            |WHERE val > thr
            |ORDER BY value DESC, partkey""".stripMargin),
    (s, dir) => {
      val geo = Tables.load(s, dir, "supplier")
        .join(broadcast(nat(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg(s, dir).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey")
      val f = li(s, dir)
        .join(broadcast(geo), col("l_suppkey") === col("s_suppkey"))
        .select(
          col("l_partkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      val v = f.groupBy(col("l_partkey").as("partkey"))
        .agg(DetAgg.dsumP(col("rev")).as("val"))
      val thr = f.agg((DetAgg.dsumP(col("rev")) * 0.001).as("thr"))
      v.crossJoin(broadcast(thr))
        .filter(col("val") > col("thr"))
        .select(col("partkey"), round(col("val"), 6).as("value"))
        .orderBy(col("value").desc, col("partkey"))
    })

  /** TPC-H Q16 shape — supplier count by part attributes: the
    * DISTINCT-COUNT + ANTI-JOIN planner shape (suppliers excluded by a
    * name predicate via NOT IN, then COUNT(DISTINCT) per attribute
    * cell). At 100 TB: the excluded-supplier list and the filtered part
    * dim both broadcast (anti + inner), so the only fact shuffle is the
    * two-phase distinct aggregate itself (partial distinct on
    * (brand, type, size, suppkey), then the count) — Spark plans
    * COUNT(DISTINCT) exactly that way.
    */
  val q16SupplierCnt: Q = Q(
    "q16_supplier_cnt",
    Some("""SELECT p_brand, p_type, p_size,
           |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
           |FROM lineitem
           |JOIN part ON p_partkey = l_partkey
           |WHERE p_brand <> 'Brand#5' AND p_type <> 'MEDIUM'
           |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
           |  AND l_suppkey NOT IN (
           |    SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
           |GROUP BY 1, 2, 3
           |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin),
    (s, dir) => {
      val pf = Tables.load(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "MEDIUM" &&
          col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      val bad = Tables.load(s, dir, "supplier")
        .filter(col("s_name").like("%7")).select("s_suppkey")
      li(s, dir).select("l_partkey", "l_suppkey")
        .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
        .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    })

  /** TPC-H Q20 shape — potential part promotion: the NESTED SEMI-JOIN
    * CHAIN (suppliers ⋉ qualifying part-supplier pairs ⋉ name-filtered
    * parts). With no partsupp/availqty in the schema, "still has stock
    * to promote" adapts to: the pair's all-time shipped quantity
    * exceeds TWICE what it shipped before 1997 — i.e. the pair kept
    * supplying that part well past the window. Quantities ride the
    * exact decimal route so the 2× comparison is exact in both engines.
    * At 100 TB: the name-filtered part dim broadcasts as a semi join
    * BELOW the aggregate (only red-part lines are ever aggregated),
    * the qualifying-supplier set semi-joins into the 100-row supplier
    * dim, and nation broadcasts — one fact shuffle total, no cartesian
    * (PlanSpec pins the chain).
    */
  val q20PotentialPromotion: Q = Q(
    "q20_potential_promotion",
    Some(s"""WITH ps AS (
            |  SELECT l_partkey, l_suppkey,
            |    ${D.dsum("l_quantity")} AS qty_total,
            |    ${D.dsum("CASE WHEN l_shipdate < TIMESTAMP '1997-01-01' " +
              "THEN l_quantity ELSE 0 END")} AS qty_window
            |  FROM lineitem
            |  WHERE l_partkey IN (
            |    SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
            |  GROUP BY 1, 2)
            |SELECT s_name, n_name
            |FROM supplier
            |JOIN nation ON s_nationkey = n_nationkey
            |WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
            |  AND s_suppkey IN (
            |    SELECT l_suppkey FROM ps WHERE qty_total > 2 * qty_window)
            |ORDER BY s_name""".stripMargin),
    (s, dir) => {
      val red = Tables.load(s, dir, "part")
        .filter(col("p_name").like("red%")).select("p_partkey")
      val qualifying = li(s, dir)
        .select("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
        .join(broadcast(red), col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
          DetAgg.dsum(col("l_quantity")).as("qty_total"),
          DetAgg.dsum(when(
            col("l_shipdate") < expr("TIMESTAMP '1997-01-01 00:00:00'"),
            col("l_quantity")).otherwise(lit(0))).as("qty_window"))
        .filter(col("qty_total") > lit(2) * col("qty_window"))
        .select("l_suppkey")
      Tables.load(s, dir, "supplier")
        .join(broadcast(nat(s, dir)
          .filter(col("n_name").isin("NATION_3", "NATION_7", "NATION_11"))),
          col("s_nationkey") === col("n_nationkey"))
        .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    })

  /** ROLLUP — the multi-level aggregate planner shape (Expand) the
    * suite never exercised: detail, per-flag subtotal, and grand total
    * in ONE pass. `grouping_id()` disambiguates a NULL group key from a
    * subtotal row (both engines define the leftmost rollup column as
    * the most-significant grouping bit). At 100 TB this is the whole
    * point of ROLLUP over k separate aggregates: Expand triples the
    * map-side rows but the plan still shuffles ONCE with partial
    * aggregation on every level (PlanSpec pins Expand + the single
    * fact shuffle), where k stacked GROUP BYs would be k scans and k
    * shuffles.
    */
  val olapRollup: Q = Q(
    "olap_rollup",
    Some(s"""SELECT l_returnflag, l_linestatus,
            |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
            |    AS BIGINT) AS gid,
            |  CAST(COUNT(*) AS BIGINT) AS n,
            |  ${D.dsum("l_quantity")} AS sum_qty,
            |  ${D.dsumP("l_extendedprice * (1 - l_discount)")} AS revenue
            |FROM lineitem
            |GROUP BY ROLLUP(l_returnflag, l_linestatus)
            |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin),
    (s, dir) =>
      // decimal casts happen ONCE per input row, BEFORE Expand
      // triplicates it — each grouping level then only adds decimals
      // (sum(decP(x)) ≡ dsumP(x) minus the final double cast, so the
      // oracle text is unchanged); measured 3.1 → 1.8 s warm at sf0.1
      li(s, dir)
        .select(
          col("l_returnflag"), col("l_linestatus"),
          DetAgg.dec(col("l_quantity")).as("qty_dec"),
          DetAgg.decP(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("rev_dec"))
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"),
          sum(col("qty_dec")).cast("double").as("sum_qty"),
          sum(col("rev_dec")).cast("double").as("revenue"))
        .select("l_returnflag", "l_linestatus", "gid", "n", "sum_qty", "revenue")
        .orderBy("gid", "l_returnflag", "l_linestatus"))

  /** CUBE — all four grouping combinations of (event_type, day-of-week)
    * in one Expand pass; the day key rides integer `div 86400` (the e17
    * discipline) and the Thursday-epoch `+4` anchor makes 1970-01-01
    * dow 4. Same single-shuffle scale story as [[olapRollup]].
    */
  val olapCube: Q = Q(
    "olap_cube",
    Some(s"""WITH e AS (SELECT event_type,
            |    (CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 + 4) % 7
            |      AS dow,
            |    value
            |  FROM events)
            |SELECT event_type, dow,
            |  CAST(GROUPING(event_type) * 2 + GROUPING(dow) AS BIGINT) AS gid,
            |  CAST(COUNT(*) AS BIGINT) AS n,
            |  ${D.dsum("value")} AS sum_value
            |FROM e
            |GROUP BY CUBE(event_type, dow)
            |ORDER BY gid, event_type, dow""".stripMargin),
    (s, dir) =>
      Tables.loadEvents(s, dir)
        .select(
          col("event_type"),
          expr("(unix_timestamp(date_trunc('second', ts)) div 86400 + 4) % 7")
            .as("dow"),
          col("value"))
        .cube("event_type", "dow")
        .agg(
          grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"),
          DetAgg.dsum(col("value")).as("sum_value"))
        .select("event_type", "dow", "gid", "n", "sum_value")
        .orderBy("gid", "event_type", "dow"))

  /** INTERSECT / EXCEPT — the bag-vs-set operators the suite never
    * exercised (Spark plans them as distinct + LeftSemi / LeftAnti
    * hash joins): the classic cohort-retention split — customers who
    * ordered in BOTH 1996 and 1997 (retained) and those who ordered in
    * 1996 but never again in 1997 (churned), one tagged relation. At
    * 100 TB each arm is one shuffle on the customer key over the
    * year-pruned fact — the same plan a hand-written semi/anti pair
    * would get, which is exactly why the declarative form is safe to
    * expose.
    */
  val setOpsRetention: Q = Q(
    "setops_retention",
    Some("""WITH a AS (SELECT DISTINCT o_custkey FROM orders
           |  WHERE year(o_orderdate) = 1996),
           |b AS (SELECT DISTINCT o_custkey FROM orders
           |  WHERE year(o_orderdate) = 1997)
           |SELECT 'retained' AS class, o_custkey
           |FROM (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b)
           |UNION ALL
           |SELECT 'churned' AS class, o_custkey
           |FROM (SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b)
           |ORDER BY class, o_custkey""".stripMargin),
    (s, dir) => {
      def yr(y: Int) = ord(s, dir)
        .filter(year(col("o_orderdate")) === y)
        .select("o_custkey").distinct()
      val (a, b) = (yr(1996), yr(1997))
      a.intersect(b).select(lit("retained").as("class"), col("o_custkey"))
        .unionByName(
          a.except(b).select(lit("churned").as("class"), col("o_custkey")))
        .orderBy("class", "o_custkey")
    })

  def all: Seq[Q] = Seq(
    q1Agg, q1Full, p1Filter, j2Dim, q3Shipping, hist2d,
    q5LocalSupplier, q18LargeVolume, q10ReturnedItems, q14PromoEffect,
    q19DiscountRevenue, q4OrderPriority, q6ForecastRevenue,
    q12ShipPriority, q13CustDist, q17SmallQtyRevenue, q22GlobalSales,
    q7NationVolume, q15TopSupplier, q8MarketShare, q21SuppliersKeptWaiting,
    q9ProductTypeProfit, q2MinCostSupplier, q11ImportantStock,
    q16SupplierCnt, q20PotentialPromotion, olapRollup, olapCube,
    setOpsRetention)
}
