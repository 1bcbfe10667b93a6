package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Bloom-pruned semi-join reduction — the 100 TB join pattern where the
  * probe side is enormous and the build side merely large: aggregate the
  * build keys into ONE bloom sketch (a few MB for hundreds of millions of
  * keys at 1% fpp), broadcast it, and discard probe rows that cannot
  * match BEFORE the shuffle the exact join needs. This is precisely what
  * Spark's runtime row-level filtering injects when statistics justify
  * it; surfacing it as an operator makes the reduction available
  * unconditionally (e.g. filtering a petabyte of crawl rows against last
  * night's curated-id set) and testable.
  *
  * Uses Spark's own `BloomFilterAggregate` / `BloomFilterMightContain`
  * expressions over `xxhash64(key)` — codegen'd, mergeable sketch
  * partials, no UDF. Correctness does NOT depend on the sketch: the
  * bloom pass can only admit false POSITIVES, and the exact semi join
  * behind it removes them, so results are bit-identical to the plain
  * join — the sketch only changes how many rows reach the shuffle. That
  * is why the oracle for any query built on this is the plain join.
  */
object BloomJoin {

  /** Aggregate a key column into a bloom sketch (binary). */
  def bloomAgg(key: Column, expectedItems: Long, numBits: Long): Column =
    GraftBridge.column(new BloomFilterAggregate(
      GraftBridge.expression(xxhash64(key)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe against a sketch built by [[bloomAgg]]. */
  def mightContain(bloom: Column, key: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      GraftBridge.expression(bloom),
      GraftBridge.expression(xxhash64(key))))

  /** `big` semi-joined to `small`'s keys, with the bloom reduction in
    * front of the exact join. Result is identical to
    * `big.join(small, bigKey === smallKey, "left_semi")`.
    *
    * The sketch is materialized driver-side as a LITERAL in the probe
    * plan — `BloomFilterMightContain` requires a constant or scalar
    * subquery (Spark's `InjectRuntimeFilter` resolves its subquery to
    * exactly this literal at runtime), and a literal keeps the probe
    * filter inside whole-stage codegen. The collect is ONE row of a few
    * MB (the trained-model pattern, [[TrainCache]] discipline): the
    * sketch AGGREGATION is fully distributed with mergeable partials;
    * only the finished filter state crosses the driver.
    */
  def semiJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      expectedItems: Long = 1000000L,
      numBits: Long = 8388608L): DataFrame = {
    val sketch = small
      .agg(bloomAgg(col(smallKey), expectedItems, numBits).as("__bloom"))
      .head.getAs[Array[Byte]]("__bloom")
    if (sketch == null) big.filter(lit(false)) // empty build side: no keys
    else big.filter(mightContain(lit(sketch), col(bigKey)))
      .join(small.select(col(smallKey).as(bigKey)), Seq(bigKey), "left_semi")
  }
}
