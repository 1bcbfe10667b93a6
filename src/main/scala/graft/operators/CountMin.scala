package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) as a RELATION, not a
  * driver-side object: the counter matrix lives as a (row, bucket, count)
  * DataFrame of exactly `d × w` cells, built by one hash aggregate over
  * the corpus — partials combine map-side, counters merge by addition, so
  * the sketch is embarrassingly mergeable across shards/days (sum the
  * cell relations), which is the whole point at 100 TB: frequency
  * estimates for ANY value from constant state, no per-value exact count
  * kept anywhere.
  *
  * Estimates are deterministic: increments are commutative sums and the
  * estimate is a MIN over `d` cells, so any partitioning and any merge
  * order yields identical counters — the sketch is exactly replayable in
  * portable SQL, and the classic one-sided guarantee (estimate ≥ true
  * count; ≤ true + N/w with probability 1−2^−d) is assertable per row.
  *
  * The hash family is the [[Splits.bucket100]] Knuth-multiplicative
  * oracle tier (id reduced mod 1e5 first, keeping every product inside
  * 63 bits — BIGINT overflow is an error in ANSI engines, silent wrap in
  * Java; avoid both). Row-r decorrelation comes from an additive
  * pre-shift `r·1000003` and a per-row odd multiplier `2654435761+2r`.
  * For >100k-id spaces a production deployment swaps in xxhash64 exactly
  * as [[Splits.bucket100Full]] does — same relation shape, spec-verified
  * rather than oracle-replayed.
  */
object CountMin {

  /** Bucket of `v` under hash row `r`, in [0, w). Pure BIGINT arithmetic,
    * identical in Spark and DuckDB.
    */
  def bucket(v: Column, r: Int, w: Int): Column =
    pmod(
      pmod(pmod(v + lit(r * 1000003L), lit(100000L)) * lit(2654435761L + 2L * r),
        lit(4294967296L)),
      lit(w.toLong))

  /** The matching oracle-SQL text for [[bucket]] — kept adjacent (DetAgg
    * discipline) so the two hash bodies can never drift. `r` is a column
    * reference here, so the SQL form multiplies by `(2654435761 + 2*r)`
    * computed row-wise.
    */
  def bucketSql(v: String, r: String, w: Int): String =
    s"((((($v + $r * 1000003) % 100000) * (2654435761 + 2 * $r)) % 4294967296) % $w)"

  /** Build the d×w counter relation over `values` (a single-column
    * DataFrame named `v`): returns (r, b, c). The cross join against the
    * d-row literal relation is a broadcast by construction.
    */
  def counters(values: DataFrame, d: Int, w: Int): DataFrame = {
    require(d >= 1 && d <= 16, s"depth $d out of range")
    require(w >= 2, s"width $w out of range")
    // one bucket expression per literal r keeps the hash codegen'd with
    // constant multipliers; the union is d map-only passes over the scan
    (0 until d).map { r =>
      values.select(lit(r.toLong).as("r"), bucket(col("v"), r, w).as("b"))
    }.reduce(_ union _)
      .groupBy("r", "b").agg(count(lit(1)).as("c"))
  }

  /** Point estimates for `queries` (single column `v`) against a counter
    * relation: min over the d per-row cells; values never seen by the
    * sketch estimate 0 (their cells may be absent from the relation).
    */
  def estimate(queries: DataFrame, cnt: DataFrame, d: Int, w: Int): DataFrame = {
    val withBuckets = (0 until d).map { r =>
      queries.select(col("v"), lit(r.toLong).as("r"), bucket(col("v"), r, w).as("b"))
    }.reduce(_ union _)
    withBuckets.join(cnt, Seq("r", "b"), "left")
      .groupBy("v")
      .agg(min(coalesce(col("c"), lit(0L))).as("n_cms"))
  }
}
