package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch point-in-interval join via BUCKETING — the scale path for range
  * joins with no equi key. Spark plans a bare `t BETWEEN lo AND hi` join
  * as BroadcastNestedLoop (or a full cartesian when neither side fits),
  * which is the canonical 100 TB cliff; the standard fix is to quantize
  * time into fixed buckets, explode each interval into every bucket it
  * overlaps, map each point to its single containing bucket, EQUI-join
  * on the bucket, and refine with the exact range predicate.
  *
  * Each (interval, point) pair can meet in at most ONE bucket — the
  * point's — so the equi-join emits no duplicates and needs no distinct.
  * Join volume is `points + Σ interval_spans/width`, shuffled on the
  * bucket key like any other equi join; the refine is a row-local
  * filter. Width trades explode factor against candidate precision —
  * pick it near the typical interval length.
  *
  * The streaming twin is [[graft.streaming.EnrichStream.intervalJoin]]
  * (there the watermark bounds state; here the bucket bounds the join).
  */
object IntervalJoin {

  /** Join `points` (with long column `t`) to `intervals` (with long
    * columns `lo`, `hi`; half-open [lo, hi)) on containment. All other
    * columns of both inputs are carried through.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      t: String,
      lo: String,
      hi: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val iv = intervals.withColumn(
      "__bucket",
      explode(sequence(
        floor(col(lo) / bucketWidth).cast("long"),
        // hi is exclusive: the last covered bucket is the one holding
        // hi − 1 (an interval ending exactly on a bucket edge must not
        // claim the next bucket)
        floor((col(hi) - 1) / bucketWidth).cast("long"))))
    val pt = points.withColumn("__bucket", floor(col(t) / bucketWidth).cast("long"))
    pt.join(iv, Seq("__bucket"))
      .filter(col(t) >= col(lo) && col(t) < col(hi))
      .drop("__bucket")
  }
}
