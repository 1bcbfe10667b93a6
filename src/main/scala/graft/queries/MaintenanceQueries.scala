package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.DetAgg
import graft.functions.DetAgg.{Sql => D}
import graft.operators.Snapshot
import graft.sources.Tables

/** Versioned-snapshot maintenance queries ([[graft.operators.Snapshot]]):
  * the change-data-capture surface between corpus crawls. Both queries
  * derive version 2 of `orders` DETERMINISTICALLY inside the query (drop
  * keys ≡0 mod 97, reprice ≡0 mod 89, insert ≡0 mod 101 clones shifted
  * past the key range) so the oracle can derive the identical v2 and
  * replay the diff/merge in portable SQL — the +1.0 reprice is an exact
  * IEEE-754 operation, so sums stay bit-portable through DetAgg.
  */
object MaintenanceQueries {

  /** Change feed between orders v1 and the derived v2, rolled up per
    * change class: one full-outer hash join on the key, no windows.
    */
  val snapshotDiff: Q = Q(
    "maint_snapshot_diff",
    Some(s"""WITH v2 AS (
            |  SELECT o_orderkey, o_orderstatus,
            |    CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 1.0
            |         ELSE o_totalprice END AS o_totalprice
            |  FROM orders WHERE o_orderkey % 97 <> 0
            |  UNION ALL
            |  SELECT o_orderkey + 900000000, 'P', o_totalprice
            |  FROM orders WHERE o_orderkey % 101 = 0),
            |d AS (
            |  SELECT COALESCE(n.o_totalprice, o.o_totalprice) AS price,
            |    CASE WHEN o.o_orderkey IS NULL THEN 'added'
            |         WHEN n.o_orderkey IS NULL THEN 'removed'
            |         WHEN n.o_orderstatus IS DISTINCT FROM o.o_orderstatus
            |           OR n.o_totalprice IS DISTINCT FROM o.o_totalprice
            |           THEN 'changed'
            |         ELSE 'unchanged' END AS change
            |  FROM orders o FULL OUTER JOIN v2 n
            |    ON o.o_orderkey = n.o_orderkey)
            |SELECT change, COUNT(*) AS n, ${D.dsum("price")} AS sum_price
            |FROM d GROUP BY change""".stripMargin),
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val v2 = o.filter(col("o_orderkey") % 97 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 89 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
        .unionByName(o.filter(col("o_orderkey") % 101 === 0)
          .select(
            (col("o_orderkey") + 900000000L).as("o_orderkey"),
            lit("P").as("o_orderstatus"),
            col("o_totalprice")))
      Snapshot.diff(o, v2,
          key = Seq("o_orderkey"),
          compare = Seq("o_orderstatus", "o_totalprice"))
        .groupBy("change")
        .agg(
          count(lit(1)).as("n"),
          DetAgg.dsum(col("o_totalprice")).as("sum_price"))
    })

  /** MERGE INTO semantics: an upsert batch (repriced matches + shifted
    * inserts) replaces/extends the base wholesale, then the merged table
    * is summarized per status. Whole-row replacement via a presence
    * marker — an update that nulls a column is honored, unlike
    * per-column coalesce.
    */
  val mergeUpsert: Q = Q(
    "maint_merge_upsert",
    Some(s"""WITH upd AS (
            |  SELECT o_orderkey, o_custkey, o_orderstatus,
            |    o_totalprice + 1.0 AS o_totalprice, o_orderdate, o_orderpriority
            |  FROM orders WHERE o_orderkey % 89 = 0
            |  UNION ALL
            |  SELECT o_orderkey + 900000000, o_custkey, 'P',
            |    o_totalprice, o_orderdate, o_orderpriority
            |  FROM orders WHERE o_orderkey % 101 = 0),
            |m AS (
            |  SELECT
            |    CASE WHEN u.o_orderkey IS NOT NULL
            |         THEN u.o_orderstatus ELSE b.o_orderstatus END AS st,
            |    CASE WHEN u.o_orderkey IS NOT NULL
            |         THEN u.o_totalprice ELSE b.o_totalprice END AS price,
            |    CASE WHEN u.o_orderkey IS NOT NULL
            |         THEN u.o_custkey ELSE b.o_custkey END AS ck
            |  FROM orders b FULL OUTER JOIN upd u
            |    ON b.o_orderkey = u.o_orderkey)
            |SELECT st AS o_orderstatus, COUNT(*) AS n,
            |  ${D.dsum("price")} AS sum_price,
            |  COUNT(DISTINCT ck) AS n_cust
            |FROM m GROUP BY st""".stripMargin),
    (s, dir) => {
      val base = Tables.load(s, dir, "orders")
      val upd = base.filter(col("o_orderkey") % 89 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1.0)
        .unionByName(base.filter(col("o_orderkey") % 101 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 900000000L)
          .withColumn("o_orderstatus", lit("P")))
        .select(base.columns.map(col): _*)
      Snapshot.merge(base, upd, key = Seq("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("n"),
          DetAgg.dsum(col("o_totalprice")).as("sum_price"),
          countDistinct(col("o_custkey")).as("n_cust"))
    })

  /** SCD type-2 history of each customer's order stream
    * ([[Snapshot.scd2]]): every order becomes a validity interval
    * `[valid_from, valid_to)` in the customer's timeline, the latest one
    * flagged current — the dimension-history build every warehouse
    * maintains next to its CDC feed. The oracle replays the identical
    * `lead` window; second-truncated timestamps keep ns/µs engines
    * bit-identical (the events-table parity discipline).
    */
  val scd2History: Q = Q(
    "maint_scd2",
    Some("""WITH v AS (SELECT o_custkey, o_orderkey, o_orderstatus,
           |    date_trunc('second', o_orderdate) AS t FROM orders)
           |SELECT o_custkey, o_orderkey, o_orderstatus,
           |  t AS valid_from,
           |  lead(t) OVER (PARTITION BY o_custkey ORDER BY t, o_orderkey)
           |    AS valid_to,
           |  lead(t) OVER (PARTITION BY o_custkey ORDER BY t, o_orderkey)
           |    IS NULL AS is_current
           |FROM v""".stripMargin),
    (s, dir) =>
      Snapshot.scd2(
          Tables.load(s, dir, "orders")
            .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
              date_trunc("second", col("o_orderdate")).as("t")),
          key = Seq("o_custkey"),
          time = col("t"),
          tiebreak = col("o_orderkey"))
        .select("o_custkey", "o_orderkey", "o_orderstatus",
          "valid_from", "valid_to", "is_current"))

  /** Order-independent table fingerprint — the cheap "did anything
    * change?" gate a snapshot pipeline runs before the full
    * [[snapshotDiff]]: each row hashes to a 32-bit value through the
    * engine-portable Knuth multiplicative family
    * ([[graft.operators.Splits.bucket100]]), folding in the key AND the
    * payload (status + micro-unit price), and the fingerprint is the SUM
    * of row hashes per slice — commutative, so it is identical under any
    * partitioning, any row order, any cluster size. Pure hash aggregate:
    * linear, windowless, one shuffle of ≤ #slices rows.
    */
  val tableFingerprint: Q = {
    // row integer: key ⊕ payload, kept < 2^31 before the Knuth multiply
    // so the product stays inside BIGINT on both engines
    val rowInt =
      """((o_orderkey * 31 + CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
        |   + CASE WHEN o_orderstatus = 'F' THEN 1
        |          WHEN o_orderstatus = 'P' THEN 2 ELSE 3 END) % 100000)""".stripMargin
    val rowHash = s"($rowInt * 2654435761) % 4294967296"
    Q(
      "maint_table_fingerprint",
      Some(s"""SELECT o_orderstatus, COUNT(*) AS n_rows,
              |  CAST(SUM($rowHash) AS BIGINT) AS fingerprint
              |FROM orders GROUP BY o_orderstatus""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .groupBy("o_orderstatus")
          .agg(
            count(lit(1)).as("n_rows"),
            sum(expr(rowHash)).cast("long").as("fingerprint")))
  }

  /** Partition-skew diagnostic: simulate a 32-way hash partitioning of
    * lineitem on l_suppkey with the PORTABLE Knuth hash (the
    * [[graft.operators.Splits]] family — engine-replayable, unlike
    * xxhash64) and report the max/avg task-size ratio — the number that
    * predicts whether a shuffle on this key needs salting BEFORE the
    * straggler shows up in production. One hash aggregate over 32
    * buckets; exact integers + one IEEE ratio — hash-exact.
    */
  val partitionSkew: Q = {
    val bucket = "((l_suppkey + 7) % 100000 * 2654435761 % 4294967296 % 32)"
    Q(
      "maint_partition_skew",
      Some(s"""WITH b AS (SELECT $bucket AS bucket, CAST(COUNT(*) AS BIGINT) AS n
              |  FROM lineitem WHERE l_suppkey IS NOT NULL GROUP BY 1)
              |SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
              |  CAST(MAX(n) AS BIGINT) AS max_rows,
              |  CAST(SUM(n) AS DOUBLE) / COUNT(*) AS avg_rows,
              |  MAX(n) / (CAST(SUM(n) AS DOUBLE) / COUNT(*)) AS skew
              |FROM b""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .filter(col("l_suppkey").isNotNull)
          .groupBy(expr(bucket).as("bucket"))
          .agg(count(lit(1)).as("n"))
          .agg(
            count(lit(1)).as("n_buckets"),
            max("n").as("max_rows"),
            (sum("n").cast("double") / count(lit(1))).as("avg_rows"))
          .select(
            col("n_buckets"), col("max_rows"), col("avg_rows"),
            (col("max_rows") / col("avg_rows")).as("skew")))
  }

  /** Z-order layout MAINTENANCE manifest ([[graft.operators.ZOrder]]) —
    * the rollup half of the OPTIMIZE ZORDER BY pass (`export_zorder`
    * oracle-checks the per-row KEY with plan-side constant bounds;
    * this computes the bounds FROM THE DATA as a 1-row broadcast and
    * emits the bucket manifest): quantize (l_extendedprice,
    * l_quantity) to 8 bits each,
    * interleave into a 16-bit Morton key, and roll up the 4⁴ = 256
    * top-level buckets a writer would range-partition on. The output
    * is the layout MANIFEST — per bucket, the row count and the
    * axis-aligned (x, y) rectangle it covers — i.e. exactly the
    * min/max file statistics a reader prunes with. ZOrderSpec proves
    * the locality claim those rectangles imply: a second-dimension
    * range predicate touches ~1/16 of z-buckets where an x-sorted
    * layout must read everything, and a partitioned write prunes to
    * precisely the candidate buckets. At 100 TB: the bounds are a
    * 1-row broadcast, the z computation is map-side arithmetic, and
    * the manifest is one 256-group hash aggregate — the clustering
    * pass costs one scan + one `repartitionByRange(z)` shuffle no
    * matter the table size. Everything (quantize, interleave, bucket)
    * is ONE generated text per dialect — hash-exact.
    */
  val layoutZorder: Q = {
    import graft.operators.ZOrder
    val Bits = 8
    val BucketBits = 4
    val bx = ZOrder.bucketizeSql("x", "mnx", "mxx", Bits)
    val by = ZOrder.bucketizeSql("y", "mny", "mxy", Bits)
    Q(
      "layout_zorder",
      Some(s"""WITH b AS (SELECT
              |    MIN(l_extendedprice) AS mnx, MAX(l_extendedprice) AS mxx,
              |    MIN(l_quantity) AS mny, MAX(l_quantity) AS mxy
              |  FROM lineitem),
              |q AS (SELECT l_extendedprice AS x, l_quantity AS y,
              |    mnx, mxx, mny, mxy FROM lineitem CROSS JOIN b),
              |c AS (SELECT x, y, $bx AS bx, $by AS by FROM q),
              |z AS (SELECT x, y,
              |    ${ZOrder.interleaveSql("bx", "by", Bits)} AS z FROM c)
              |SELECT ${ZOrder.bucketOfSql("z", Bits, BucketBits)} AS zbucket,
              |  CAST(COUNT(*) AS BIGINT) AS n,
              |  MIN(x) AS min_x, MAX(x) AS max_x,
              |  MIN(y) AS min_y, MAX(y) AS max_y
              |FROM z GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        val b = li.agg(
            min("l_extendedprice").as("mnx"), max("l_extendedprice").as("mxx"),
            min("l_quantity").as("mny"), max("l_quantity").as("mxy"))
          // a CONSTANT dimension cannot be clustered, and its 0/0
          // quantization diverges across dialects (Spark ANSI raises,
          // DuckDB NULLs) — fail loudly on the 1-row bounds relation
          // BEFORE the shared text runs (the house in-plan guard)
          .filter(assert_true(
            col("mnx") < col("mxx") && col("mny") < col("mxy"),
            lit("layout_zorder: a z-order dimension is constant " +
              "(min = max) — constant columns cannot be clustered; " +
              "drop the dimension instead")).isNull)
        li.select(
            col("l_extendedprice").as("x"), col("l_quantity").as("y"))
          .crossJoin(broadcast(b))
          .select(
            col("x"), col("y"),
            ZOrder.bucketize("x", "mnx", "mxx", Bits).as("bx"),
            ZOrder.bucketize("y", "mny", "mxy", Bits).as("by"))
          .select(
            col("x"), col("y"),
            ZOrder.interleave("bx", "by", Bits).as("z"))
          .groupBy(ZOrder.bucketOf("z", Bits, BucketBits).as("zbucket"))
          .agg(
            count(lit(1)).as("n"),
            min("x").as("min_x"), max("x").as("max_x"),
            min("y").as("min_y"), max("y").as("max_y"))
          .orderBy("zbucket")
      })
  }

  /** Incremental aggregate maintenance with retractions
    * ([[graft.operators.IncrementalAgg]]) — the aggregate-view member
    * of the maintenance family (Snapshot maintains rows; this maintains
    * a per-group COUNT/SUM/AVG under appends AND deletes without
    * recomputing history). Three deterministic generations over
    * `events`: the base crawl (event_id ≢ 2 mod 3), an insert batch
    * (≡ 2 mod 3), and a delete batch (≡ 0 mod 7, retracted as NEGATED
    * partials). Counts and exact-decimal sums form a group under
    * addition, so the fold is associative/commutative (MaintenanceSpec
    * pins both) and a group returning to zero count leaves the state.
    * The oracle is the from-scratch rebuild over the surviving rows —
    * hash-equality proves maintained ≡ recomputed. At 100 TB: each
    * delta costs one aggregate over the DELTA and a group-bounded
    * merge; history is never rescanned. MIN/MAX are deliberately
    * absent — not retractable, per the operator contract.
    */
  val aggIncremental: Q = Q(
    "maint_agg_incremental",
    // mean is SQL AVG (÷ COUNT(value), the non-null count) — the state
    // tracks the non-null count separately, so the view keeps AVG
    // semantics on nullable measures too (r12 ADVICE). On this corpus
    // value is never NULL, so COUNT(value) = COUNT(*) and the hash is
    // unchanged; the SEMANTICS are pinned by MaintenanceSpec's
    // null-measure case.
    Some(s"""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
            |  ${D.dsum("value")} AS total,
            |  ${D.dsum("value")} / COUNT(value) AS mean
            |FROM events WHERE event_id % 7 <> 0
            |GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, dir) => {
      import graft.operators.IncrementalAgg
      val ev = Tables.loadEvents(s, dir)
        .select("event_id", "event_type", "value")
      val base = ev.filter(col("event_id") % 3 =!= 2)
      val ins = ev.filter(col("event_id") % 3 === 2)
      val del = ev.filter(col("event_id") % 7 === 0)
      val keys = Seq("event_type")
      val state = IncrementalAgg.merge(Seq(
        IncrementalAgg.partials(base, keys, "value"),
        IncrementalAgg.partials(ins, keys, "value"),
        IncrementalAgg.partials(del, keys, "value", sign = -1)), keys)
      IncrementalAgg.view(state, keys).orderBy("event_type")
    })

  /** Incremental MIN/MAX maintenance ([[graft.operators.MinMaxAgg]]) —
    * the aggregate class `maint_agg_incremental` excludes by contract
    * (extremes aren't retractable from a (count, sum) state; r12
    * verdict item 8). Same three generations as the agg row: base
    * crawl, insert batch, delete batch — the delete batch retracts
    * value-matched instances from the bounded per-group top-k heaps,
    * then [[graft.operators.MinMaxAgg.repair]] rebuilds any
    * underflowed group from the surviving rows (none at these SFs —
    * the spec forces that path with k = 2). The oracle is the
    * from-scratch MIN/MAX rebuild: hash-equality proves
    * maintained ≡ recomputed. MIN/MAX over identical doubles are
    * order-independent, so no DetAgg routing is needed.
    */
  val minMaxIncremental: Q = Q(
    "maint_minmax_incremental",
    Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           |  MIN(value) AS min, MAX(value) AS max
           |FROM events WHERE event_id % 7 <> 0
           |GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, dir) => {
      import graft.operators.MinMaxAgg
      val ev = Tables.loadEvents(s, dir)
        .select("event_id", "event_type", "value")
      val base = ev.filter(col("event_id") % 3 =!= 2)
      val ins = ev.filter(col("event_id") % 3 === 2)
      val del = ev.filter(col("event_id") % 7 === 0)
      val keys = Seq("event_type")
      val merged = MinMaxAgg.mergeInserts(Seq(
        MinMaxAgg.partials(base, keys, "value"),
        MinMaxAgg.partials(ins, keys, "value")), keys)
      val after = MinMaxAgg.applyDeletes(merged, del, keys, "value")
      val survivors = ev.filter(col("event_id") % 7 =!= 0)
      MinMaxAgg.view(MinMaxAgg.repair(after, survivors, keys, "value"), keys)
        .orderBy("event_type")
    })

  /** Exact COUNT(DISTINCT) maintenance
    * ([[graft.operators.IncrementalAgg.distinctPartials]]) — the third
    * aggregate class of the IVM family: per-(group, value) instance
    * counts fold under inserts and NEGATED deletes, and a value stays
    * distinct while its count is positive — so deleting ONE copy of a
    * twice-seen value does not drop it (the delete batch here overlaps
    * values the survivors still hold, which is exactly the case a
    * set-difference maintenance gets wrong). Oracle = from-scratch
    * COUNT(DISTINCT) rebuild over the surviving rows; integers compare
    * exactly, so the row is hash-exact with no DetAgg routing. Values
    * are bucketed to integers so the distinct space is small enough
    * that the delete/survivor overlap actually occurs at sf0.01.
    */
  val distinctIncremental: Q = Q(
    "maint_distinct_incremental",
    Some("""SELECT event_type,
           |  CAST(COUNT(DISTINCT CAST(FLOOR(value * 1.0e1) AS BIGINT)) AS BIGINT)
           |    AS n_distinct
           |FROM events WHERE event_id % 7 <> 0
           |GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, dir) => {
      import graft.operators.IncrementalAgg
      val ev = Tables.loadEvents(s, dir)
        .select(col("event_id"), col("event_type"),
          expr("CAST(FLOOR(value * 1.0e1) AS BIGINT)").as("vb"))
      val base = ev.filter(col("event_id") % 3 =!= 2)
      val ins = ev.filter(col("event_id") % 3 === 2)
      val del = ev.filter(col("event_id") % 7 === 0)
      val keys = Seq("event_type")
      val state = IncrementalAgg.distinctMerge(Seq(
        IncrementalAgg.distinctPartials(base, keys, "vb"),
        IncrementalAgg.distinctPartials(ins, keys, "vb"),
        IncrementalAgg.distinctPartials(del, keys, "vb", sign = -1)), keys)
      IncrementalAgg.distinctView(state, keys).orderBy("event_type")
    })

  /** The three IVM classes COMPOSED into one maintained view
    * ([[graft.streaming.MaintainedView]], r13 verdict item 5):
    * COUNT/SUM/AVG + MIN/MAX + exact COUNT(DISTINCT) folded TOGETHER
    * through the same three-generation delta sequence as the
    * single-class rows (base crawl, insert batch, delete batch) — this
    * registry row is the hash-exact BATCH REPLAY of the identical fold
    * plan the streaming `foreachBatch` sink runs (MaintainedViewSpec
    * proves the sink side: kill-and-resume across a batch boundary ≡
    * uninterrupted ≡ this rebuild, through real parquet state and a
    * real checkpoint). Oracle = the from-scratch seven-column rebuild
    * over survivors.
    */
  val viewComposed: Q = Q(
    "maint_view_composed",
    Some(s"""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
            |  ${D.dsum("value")} AS total,
            |  ${D.dsum("value")} / COUNT(value) AS mean,
            |  MIN(value) AS min, MAX(value) AS max,
            |  CAST(COUNT(DISTINCT CAST(FLOOR(value * 1.0e1) AS BIGINT)) AS BIGINT)
            |    AS n_distinct
            |FROM events WHERE event_id % 7 <> 0
            |GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, dir) => {
      import graft.streaming.MaintainedView
      val ev = Tables.loadEvents(s, dir)
        .select(col("event_id"), col("event_type"), col("value"))
        .withColumn("vb", expr("CAST(FLOOR(value * 1.0e1) AS BIGINT)"))
      val keys = Seq("event_type")
      val b1 = ev.filter(col("event_id") % 3 =!= 2).withColumn("op", lit("I"))
      val b2 = ev.filter(col("event_id") % 3 === 2).withColumn("op", lit("I"))
      val b3 = ev.filter(col("event_id") % 7 === 0).withColumn("op", lit("D"))
      val s1 = MaintainedView.fold(None, b1, keys, "value", "vb", b1)
      val s2 = MaintainedView.fold(Some(s1), b2, keys, "value", "vb",
        b1.unionByName(b2))
      val s3 = MaintainedView.fold(Some(s2), b3, keys, "value", "vb",
        ev.filter(col("event_id") % 7 =!= 0))
      MaintainedView.view(s3, keys).orderBy("event_type")
    })

  def all: Seq[Q] = Seq(snapshotDiff, mergeUpsert, scd2History, tableFingerprint,
    partitionSkew, layoutZorder, aggIncremental, minMaxIncremental,
    distinctIncremental, viewComposed)
}
