package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier, minimize both axes) — the classic
  * multi-criteria "best tradeoffs" operator (Börzsönyi et al. 2001):
  * keep every point not dominated by another (`qx ≤ px ∧ qy ≤ py`,
  * strict somewhere). For two dimensions the frontier has a closed
  * sort-scan form — a point survives iff its y is strictly below the
  * running minimum y over all strictly-smaller x — so the whole operator
  * reduces to a distinct-pair aggregate plus a PREFIX-MIN, and the
  * prefix-min runs on the same range-sharded kernel as
  * [[graft.functions.Stats.ks2Samp]]'s cumulative (monotone
  * sortable-bits shard index, per-shard windows, a ≤ 2^shardBits-row
  * offsets relation): no corpus-wide window even when x is
  * near-continuous, and never the quadratic dominance join a naive
  * skyline plan would run.
  *
  * Within one x, only the minimal y can survive (any other y there is
  * dominated strictly in y), so the per-x `min(y)` aggregate is
  * lossless; across x the strict `<` test drops frontier ties (a point
  * matching the prefix min is dominated by the earlier point, strict
  * in x). Nulls are excluded: dominance is undefined for a valueless
  * coordinate.
  */
object Skyline {

  /** Distinct frontier points (x, y) of `df` minimizing both columns. */
  def skyline2d(
      df: DataFrame,
      x: String,
      y: String,
      shardBits: Int = 12): DataFrame = {
    require(shardBits >= 1 && shardBits <= 20, s"shardBits $shardBits out of range")
    val g = df
      .filter(col(x).isNotNull && col(y).isNotNull)
      .groupBy(col(x).cast("double").as("__x"))
      .agg(min(col(y).cast("double")).as("__y"))
    val keyed = g.withColumn(
      "__shard",
      shiftright(
        graft.plans.ScalarExpressions.sortableBits(col("__x")),
        64 - shardBits) + lit(1L << (shardBits - 1)))
    // strict-prefix min of the per-shard minima (bounded offsets window)
    val wOff = Window.partitionBy(
      graft.plans.ScalarExpressions.singlePartitionKey(col("__shard")))
      .orderBy("__shard").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy("__shard")
      .agg(min("__y").as("__m"))
      .select(
        col("__shard").as("__oshard"),
        min("__m").over(wOff).as("__pm")) // null for the first shard
    // strict prefix within the shard: rows preceding the current one
    val wCum = Window.partitionBy("__shard").orderBy("__x")
      .rowsBetween(Window.unboundedPreceding, -1)
    keyed.join(broadcast(offsets), col("__shard") === col("__oshard"))
      .withColumn("__prior", least(
        min("__y").over(wCum), // null when first in shard
        col("__pm")))
      .filter(col("__prior").isNull || col("__y") < col("__prior"))
      .select(col("__x").as(x), col("__y").as(y))
  }
}
