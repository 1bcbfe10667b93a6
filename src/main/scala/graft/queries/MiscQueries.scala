package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.DetAgg
import graft.functions.DetAgg.{Sql => D}
import graft.sources.{Tables, TextSources}

/** Remaining SURVEY §2 inventory: null handling (P3), error propagation
  * (P7), pivot_table+mean (R3), conditional aggregation (A6), scalar
  * aggregates (A4), and a CSV sink/scan round-trip (S2/S9) proven inside
  * the oracle-checked path.
  */
object MiscQueries {

  private def li(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.load(s, d, "lineitem")

  /** P3: dropna on an injected-null column. */
  val p3NullDrop: Q = Q(
    "p3_null_drop",
    Some("""SELECT l_orderkey, l_linenumber, d FROM
           |  (SELECT l_orderkey, l_linenumber, NULLIF(l_discount, 0.0) AS d
           |   FROM lineitem)
           |WHERE d IS NOT NULL""".stripMargin),
    (s, dir) =>
      li(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          nullif(col("l_discount"), lit(0.0)).as("d"))
        .na.drop(Seq("d")))

  /** P7: quadrature error propagation sqrt(a²c² + b²d²) (reference
    * `scripts/collected_charge_vs_bias_voltage_beta_scan.py:84-85`) —
    * written with explicit multiplies (not POW) so both engines run the
    * identical IEEE sequence.
    */
  val p7ErrorProp: Q = Q(
    "p7_error_prop",
    Some("""SELECT l_orderkey, l_linenumber,
           |  SQRT((l_quantity * l_discount) * (l_quantity * l_discount)
           |     + (l_extendedprice * l_tax) * (l_extendedprice * l_tax)) AS prop_err
           |FROM lineitem""".stripMargin),
    (s, dir) => {
      val a = col("l_quantity") * col("l_discount")
      val b = col("l_extendedprice") * col("l_tax")
      li(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        sqrt(a * a + b * b).as("prop_err"))
    })

  /** R3: pivot_table + mean — the k1×k2 matrix shape (reference
    * `scripts/time_resolution_beta_scan.py:70-76`).
    */
  val r3PivotMean: Q = Q(
    "r3_pivot_mean",
    Some(s"""SELECT l_linenumber,
            |  ${D.dsum("CASE WHEN l_returnflag = 'A' THEN l_quantity END")}
            |    / COUNT(CASE WHEN l_returnflag = 'A' THEN l_quantity END) AS "A",
            |  ${D.dsum("CASE WHEN l_returnflag = 'N' THEN l_quantity END")}
            |    / COUNT(CASE WHEN l_returnflag = 'N' THEN l_quantity END) AS "N",
            |  ${D.dsum("CASE WHEN l_returnflag = 'R' THEN l_quantity END")}
            |    / COUNT(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS "R"
            |FROM lineitem GROUP BY l_linenumber""".stripMargin),
    (s, dir) => {
      val wide = li(s, dir)
        .groupBy("l_linenumber")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(DetAgg.dec(col("l_quantity"))).cast(DoubleType) / count(col("l_quantity")))
      wide
    })

  /** A6: conditional aggregation — per-group stats of a predicated subset
    * (reference pad-tagging means, `scripts/utils.py:67-73`).
    */
  val a6ConditionalAgg: Q = Q(
    "a6_conditional_agg",
    Some(s"""SELECT l_returnflag,
            |  ${D.dsum("CASE WHEN l_quantity > 25 THEN l_extendedprice END")}
            |    / COUNT(CASE WHEN l_quantity > 25 THEN l_extendedprice END) AS avg_hi,
            |  ${D.dsum("CASE WHEN l_quantity <= 25 THEN l_extendedprice END")}
            |    / COUNT(CASE WHEN l_quantity <= 25 THEN l_extendedprice END) AS avg_lo,
            |  ROUND(median(CASE WHEN l_quantity > 25 THEN l_extendedprice END), 6) AS med_hi
            |FROM lineitem GROUP BY l_returnflag""".stripMargin),
    (s, dir) => {
      val hi = when(col("l_quantity") > 25, col("l_extendedprice"))
      val lo = when(col("l_quantity") <= 25, col("l_extendedprice"))
      li(s, dir).groupBy("l_returnflag").agg(
        (sum(DetAgg.dec(hi)).cast(DoubleType) / count(hi)).as("avg_hi"),
        (sum(DetAgg.dec(lo)).cast(DoubleType) / count(lo)).as("avg_lo"),
        round(median(hi), 6).as("med_hi"))
    })

  /** A4: global scalar aggregates in one row (reference whole-column
    * `mean()/min()/max()/len` inside expressions, `scripts/utils.py:67-68`).
    */
  val a4ScalarAgg: Q = Q(
    "a4_scalar_agg",
    Some(s"""SELECT COUNT(*) AS n, MIN(l_shipdate) AS min_ship,
            |  MAX(l_shipdate) AS max_ship,
            |  ${D.davg("l_extendedprice")} AS avg_price,
            |  COUNT(DISTINCT l_orderkey) AS n_orders
            |FROM lineitem""".stripMargin),
    (s, dir) =>
      li(s, dir).agg(
        count(lit(1)).as("n"),
        min("l_shipdate").as("min_ship"),
        max("l_shipdate").as("max_ship"),
        DetAgg.davg(col("l_extendedprice")).as("avg_price"),
        countDistinct(col("l_orderkey")).as("n_orders")))

  /** S2/S9: CSV sink + scan round-trip inside the verified path — the
    * nation table goes out through the summary-CSV sink and comes back
    * through the schema'd CSV scan; the oracle reads the parquet
    * directly, so any round-trip corruption breaks the hash.
    */
  val s2CsvRoundtrip: Q = Q(
    "s2_csv_roundtrip",
    Some("SELECT n_nationkey, n_name, n_regionkey FROM nation"),
    (s, dir) => {
      val n = Tables.load(s, dir, "nation")
      val tmp = s"/tmp/graft_csv_roundtrip_nation"
      TextSources.writeSummaryCsv(n, tmp)
      TextSources.readCsv(s, tmp, StructType(Seq(
        StructField("n_nationkey", IntegerType),
        StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType))))
    })

  /** P12: column-set projection arithmetic — "all columns except" via set
    * difference on df.columns (reference `scripts/clean_beta_scan.py:245`).
    */
  val p12ColumnSets: Q = Q(
    "p12_column_sets",
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
           |  l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
           |FROM lineitem""".stripMargin),
    (s, dir) => {
      val t = li(s, dir)
      val excluded = Set("l_partkey", "l_suppkey")
      t.select(t.columns.filterNot(excluded).map(col): _*)
    })

  /** Semi/anti joins — the Spark-native form of the reference's
    * completeness rewrite (SURVEY §2.4 note): lineitems of F-status orders
    * (semi) and of orders with no lineitems under quantity 3 (anti).
    */
  val jSemiAnti: Q = Q(
    "j_semi_anti",
    Some("""SELECT l.l_orderkey, l.l_linenumber FROM lineitem l
           |WHERE EXISTS (SELECT 1 FROM orders o
           |              WHERE o.o_orderkey = l.l_orderkey
           |                AND o.o_orderstatus = 'F')
           |  AND NOT EXISTS (SELECT 1 FROM lineitem x
           |                  WHERE x.l_orderkey = l.l_orderkey
           |                    AND x.l_quantity < 3)""".stripMargin),
    (s, dir) => {
      val t = li(s, dir)
      val fOrders = Tables.load(s, dir, "orders")
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey").as("l_orderkey"))
      val smallQty = t.filter(col("l_quantity") < 3).select("l_orderkey")
      t.join(fOrders, Seq("l_orderkey"), "left_semi")
        .join(smallQty, Seq("l_orderkey"), "left_anti")
        .select("l_orderkey", "l_linenumber")
    })

  /** S10-adjacent: ORC sink + scan round-trip inside the verified path —
    * Spark's second bundled columnar format (the Hive-ecosystem
    * counterpart of parquet). The supplier table goes out through
    * `.write.orc` and comes back through `.read.orc` with an int64 /
    * string / int32 / double column mix; the oracle reads the parquet
    * directly, so any round-trip type or value corruption breaks the
    * hash.
    */
  val sOrcRoundtrip: Q = Q(
    "s_orc_roundtrip",
    Some("SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier"),
    (s, dir) => {
      val sup = Tables.load(s, dir, "supplier")
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      val tmp = "/tmp/graft_orc_roundtrip_supplier"
      sup.write.mode("overwrite").orc(tmp)
      s.read.orc(tmp)
    })

  /** Parquet schema evolution: two generations of the supplier feed land
    * with DIFFERENT column sets (old writer: key+name, new writer:
    * key+acctbal), and one `mergeSchema` read recovers the superset
    * schema with nulls where a file lacks the column — the standard
    * lakehouse pattern for additive schema drift. The oracle rebuilds the
    * same union from the parquet source, so both the row routing and the
    * null filling are hash-checked.
    */
  val sParquetSchemaMerge: Q = Q(
    "s_parquet_schema_merge",
    Some(s"""WITH m AS (
            |  SELECT s_suppkey, s_name, CAST(NULL AS DOUBLE) AS s_acctbal
            |  FROM supplier WHERE s_suppkey % 2 = 0
            |  UNION ALL
            |  SELECT s_suppkey, CAST(NULL AS VARCHAR), s_acctbal
            |  FROM supplier WHERE s_suppkey % 2 = 1)
            |SELECT COUNT(*) AS n, COUNT(s_name) AS n_names,
            |  COUNT(s_acctbal) AS n_bals,
            |  ${D.dsum("s_acctbal")} AS sum_bal
            |FROM m""".stripMargin),
    (s, dir) => {
      val sup = Tables.load(s, dir, "supplier")
      val tmp = "/tmp/graft_parquet_schema_merge"
      sup.filter(col("s_suppkey") % 2 === 0).select("s_suppkey", "s_name")
        .write.mode("overwrite").parquet(s"$tmp/gen=old")
      sup.filter(col("s_suppkey") % 2 === 1).select("s_suppkey", "s_acctbal")
        .write.mode("overwrite").parquet(s"$tmp/gen=new")
      s.read.option("mergeSchema", "true").parquet(s"$tmp/gen=old", s"$tmp/gen=new")
        .agg(
          count(lit(1)).as("n"),
          count(col("s_name")).as("n_names"),
          count(col("s_acctbal")).as("n_bals"),
          DetAgg.dsum(col("s_acctbal")).as("sum_bal"))
    })

  /** A15-adjacent: per-group MODE (most frequent value, smallest-value
    * tie-break) — the categorical summary missing from the A-family.
    * Deterministic argmax WITHOUT a window: `min(struct(-cnt, v))` over
    * the (group, value) count relation — struct ordering is
    * lexicographic in both engines, so the pick is the (max count, min
    * value) pair by construction, and the plan is two hash aggregates
    * with map-side partials (no per-group sort, no window; at 100 TB the
    * count relation is bounded by distinct values per group).
    */
  val a15Mode: Q = Q(
    "a15_mode",
    Some("""WITH c AS (
           |  SELECT l_returnflag, l_quantity AS v, COUNT(*) AS cnt
           |  FROM lineitem WHERE l_quantity IS NOT NULL
           |  GROUP BY l_returnflag, l_quantity),
           |m AS (
           |  SELECT l_returnflag,
           |    MIN(struct_pack(nc := -cnt, v := v)) AS p FROM c
           |  GROUP BY l_returnflag)
           |SELECT l_returnflag, p.v AS mode_value, -p.nc AS n_mode
           |FROM m""".stripMargin),
    (s, dir) => {
      val c = li(s, dir).filter(col("l_quantity").isNotNull)
        .groupBy(col("l_returnflag"), col("l_quantity").as("v"))
        .agg(count(lit(1)).as("cnt"))
      c.groupBy("l_returnflag")
        .agg(min(struct((-col("cnt")).as("nc"), col("v"))).as("p"))
        .select(
          col("l_returnflag"),
          col("p.v").as("mode_value"),
          (-col("p.nc")).as("n_mode"))
    })

  /** A16: exact per-group WEIGHTED median (price weighted by quantity)
    * — [[graft.functions.Stats.weightedMedian]], the first stratified
    * drive of the sharded cumulative kernel: offsets per (group, shard),
    * integer half-total test, no group-wide window ever. Oracle = the
    * naive per-group sort-window form (the w6 discipline).
    */
  val a16WeightedMedian: Q = Q(
    "a16_weighted_median",
    Some("""WITH g AS (
           |  SELECT l_returnflag AS gf, CAST(l_extendedprice AS DOUBLE) AS v,
           |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
           |  FROM lineitem WHERE l_extendedprice IS NOT NULL
           |  GROUP BY 1, 2),
           |c AS (SELECT gf, v,
           |    SUM(w) OVER (PARTITION BY gf ORDER BY v
           |      ROWS UNBOUNDED PRECEDING) AS cum,
           |    SUM(w) OVER (PARTITION BY gf) AS tw FROM g)
           |SELECT gf AS l_returnflag, MIN(v) AS wmed_l_extendedprice
           |FROM c WHERE 2 * cum >= tw GROUP BY gf""".stripMargin),
    (s, dir) =>
      graft.functions.Stats.weightedMedian(
        li(s, dir), "l_returnflag", "l_extendedprice", col("l_quantity")))

  /** A17: the full weighted-quartile grid from ONE cumulative pass
    * ([[graft.functions.Stats.weightedQuartiles]]) — integer `4·cum ≥
    * j·W` tests over a 3-row broadcast grid on the stratified sharded
    * kernel. Oracle = the per-group window form with identical integer
    * comparisons.
    */
  val a17WeightedQuartiles: Q = Q(
    "a17_weighted_quartiles",
    Some("""WITH g AS (
           |  SELECT l_returnflag AS gf, CAST(l_extendedprice AS DOUBLE) AS v,
           |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
           |  FROM lineitem WHERE l_extendedprice IS NOT NULL
           |  GROUP BY 1, 2),
           |c AS (SELECT gf, v,
           |    SUM(w) OVER (PARTITION BY gf ORDER BY v
           |      ROWS UNBOUNDED PRECEDING) AS cum,
           |    SUM(w) OVER (PARTITION BY gf) AS tw FROM g),
           |j AS (SELECT * FROM (VALUES (1), (2), (3)) AS t(jq))
           |SELECT gf AS l_returnflag, jq / 4.0 AS q,
           |  MIN(v) AS wq_l_extendedprice
           |FROM c CROSS JOIN j
           |WHERE 4 * cum >= jq * tw
           |GROUP BY gf, jq / 4.0""".stripMargin),
    (s, dir) =>
      graft.functions.Stats.weightedQuartiles(
        li(s, dir), "l_returnflag", "l_extendedprice", col("l_quantity")))

  /** Leak-free grouped 5-fold split over lineitem keyed by order
    * ([[graft.operators.Splits.groupKFold]]): every line item of an
    * order lands in the same fold (fold = portable hash of l_orderkey),
    * so cross-validation can never leak order-level features across
    * folds. The fold profile — rows, distinct groups, and an exact
    * quantity checksum per fold — is the oracle surface; the leak-free
    * property itself is structural (fold is a function of the group
    * key) and spec-pinned. Pure map + one hash aggregate; the
    * assignment column is stable under reprocessing, appends, and any
    * partitioning — the property that makes folds reproducible at
    * 100 TB.
    */
  val splitGroupKfold: Q = Q(
    "split_group_kfold",
    Some("""WITH f AS (SELECT l_orderkey,
           |    ((l_orderkey + 13) % 100000) * 2654435761 % 4294967296 % 5 AS fold,
           |    CAST(l_quantity AS BIGINT) AS q
           |  FROM lineitem)
           |SELECT fold, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  COUNT(DISTINCT l_orderkey) AS n_groups,
           |  CAST(SUM(q) AS BIGINT) AS sum_qty
           |FROM f GROUP BY fold""".stripMargin),
    (s, dir) =>
      graft.operators.Splits
        .groupKFold(
          li(s, dir).select(col("l_orderkey"), col("l_quantity")),
          "l_orderkey", k = 5, seed = 13)
        .groupBy("fold")
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct("l_orderkey").as("n_groups"),
          sum(col("l_quantity").cast(LongType)).as("sum_qty")))

  def all: Seq[Q] = Seq(
    p3NullDrop, p7ErrorProp, r3PivotMean, a6ConditionalAgg, a4ScalarAgg,
    s2CsvRoundtrip, p12ColumnSets, jSemiAnti, sOrcRoundtrip,
    sParquetSchemaMerge, a15Mode, a16WeightedMedian, a17WeightedQuartiles,
    splitGroupKfold)
}
