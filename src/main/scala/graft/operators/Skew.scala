package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.DetAgg

/** Skew mitigation: salting for hot keys.
  *
  * A group/join key with a dominant value turns one shuffle partition
  * into the whole job's critical path (AQE's skew-join split handles
  * sort-merge joins at runtime, but aggregations and non-AQE paths
  * don't get that help). Salting splits each hot key across `salts`
  * sub-keys deterministically:
  *
  *  - [[saltedSumCount]]: two-stage aggregation — partials per
  *    (key, salt), exact DECIMAL merge per key. Because the partial sums
  *    are fixed-scale decimals ([[DetAgg]]), the final double is
  *    bit-identical to the unsalted aggregate — salting is a pure
  *    physical rewrite, and the oracle row proves it.
  *  - [[saltedJoin]]: fact side salted by a hash of a fact column, dim
  *    side replicated ×salts — each hot key's rows spread over `salts`
  *    reducers at the cost of a `salts`× dim blow-up (use when the dim
  *    is too big to broadcast but far smaller than the fact).
  */
object Skew {

  /** Deterministic salt in [0, salts): a hash of `saltBy` (any column
    * that varies within a hot key — a row id, a timestamp).
    */
  def salt(saltBy: Column, salts: Int): Column =
    pmod(xxhash64(saltBy), lit(salts)).cast("int")

  /** Two-stage salted sum/count of `value` per `keys`. Output:
    * keys + `sum_<out>` (double) + `n` (long) — bit-identical to the
    * direct aggregate (decimal partials are associative).
    */
  def saltedSumCount(
      df: DataFrame,
      keys: Seq[String],
      value: Column,
      out: String,
      saltBy: Column,
      salts: Int): DataFrame = {
    val g = keys.map(col)
    df.withColumn("__salt", salt(saltBy, salts))
      .groupBy((g :+ col("__salt")): _*)
      .agg(
        sum(DetAgg.dec(value)).as("__psum"), // stays DECIMAL: exact merge
        count(lit(1)).as("__pn"))
      .groupBy(g: _*)
      .agg(
        sum(col("__psum")).cast("double").as(out),
        sum(col("__pn")).as("n"))
  }

  /** Salted equi-join: `fact` joins `dim` on `key`, with each fact row
    * salted by `saltBy` and the dim replicated across all salt values.
    * Semantically identical to `fact.join(dim, key)` — physically, hot
    * keys fan out over `salts` reducers.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltBy: Column,
      salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt", salt(saltBy, salts))
    val saltedDim = dim.withColumn(
      "__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
