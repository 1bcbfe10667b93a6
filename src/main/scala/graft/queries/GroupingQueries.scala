package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.DetAgg
import graft.functions.DetAgg.{Sql => D}
import graft.sources.Tables

/** Multi-level aggregation and sketch queries — OLAP surface the
  * reference's pandas scripts approximate with repeated groupbys
  * (reference computes per-level summaries by re-aggregating in the
  * driver; here each is ONE pass producing every level).
  *
  * At 100 TB: rollup/cube/grouping-sets are a single shuffle with
  * partial aggregation per level (Catalyst expands the grouping sets
  * before the exchange, so the map side combines for all levels at
  * once); approx_count_distinct is a mergeable HLL++ sketch — constant
  * memory per group where exact distinct would shuffle every value.
  */
object GroupingQueries {

  /** ROLLUP over (returnflag, linestatus): per-pair, per-flag, and grand
    * totals in one pass. Grouping flags distinguish rolled-up NULLs from
    * data NULLs.
    */
  val rollup: Q = Q(
    "agg_rollup",
    Some(s"""SELECT l_returnflag, l_linestatus,
            |  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
            |  CAST(GROUPING(l_linestatus) AS INT) AS g_status,
            |  COUNT(*) AS n, ${D.dsum("l_quantity")} AS sum_qty
            |FROM lineitem
            |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin),
    (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          grouping(col("l_returnflag")).cast("int").as("g_flag"),
          grouping(col("l_linestatus")).cast("int").as("g_status"),
          count(lit(1)).as("n"),
          DetAgg.dsum(col("l_quantity")).as("sum_qty")))

  /** CUBE over (returnflag, shipmode-ish tag): all 4 grouping levels in
    * one pass.
    */
  val cube_ : Q = Q(
    "agg_cube",
    Some(s"""SELECT l_returnflag, l_linestatus,
            |  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
            |  CAST(GROUPING(l_linestatus) AS INT) AS g_status,
            |  COUNT(*) AS n, ${D.dsum("l_extendedprice")} AS sum_price
            |FROM lineitem
            |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin),
    (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
          grouping(col("l_returnflag")).cast("int").as("g_flag"),
          grouping(col("l_linestatus")).cast("int").as("g_status"),
          count(lit(1)).as("n"),
          DetAgg.dsum(col("l_extendedprice")).as("sum_price")))

  /** Explicit GROUPING SETS — the general form (reference's per-script
    * summary tables become one declarative pass). Expressed via Spark SQL
    * on a temp view: the DataFrame API's rollup/cube are the common
    * cases; GROUPING SETS is SQL surface in both engines.
    */
  val groupingSets: Q = Q(
    "agg_grouping_sets",
    Some(s"""SELECT l_returnflag, l_linestatus,
            |  COUNT(*) AS n, ${D.dsum("l_quantity")} AS sum_qty
            |FROM lineitem
            |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin),
    (s, dir) => {
      Tables.load(s, dir, "lineitem").createOrReplaceTempView("graft_gs_lineitem")
      s.sql(s"""SELECT l_returnflag, l_linestatus,
               |  COUNT(*) AS n,
               |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
               |FROM graft_gs_lineitem
               |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)
    })

  /** HLL++ approximate distinct next to the exact count — rows-only (the
    * sketch estimate is engine-specific); GroupingSpec pins the relative
    * error. The exact twin `agg_distinct_exact` is the oracle row.
    */
  val approxDistinct: Q = Q(
    "agg_approx_distinct",
    None,
    (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_orderkey")).as("n_exact"),
          approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("n_approx")))

  /** Exact-distinct twin of [[approxDistinct]] — hash-checked. */
  val distinctExact: Q = Q(
    "agg_distinct_exact",
    Some("""SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS n_exact
           |FROM lineitem GROUP BY l_returnflag""".stripMargin),
    (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_orderkey")).as("n_exact")))

  def all: Seq[Q] = Seq(rollup, cube_, groupingSets, approxDistinct, distinctExact)
}
