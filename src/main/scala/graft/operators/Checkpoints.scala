package graft.operators

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.storage.StorageLevel

/** Tracked eager `localCheckpoint`s for iterative kernels — the release
  * half of the lineage-cut discipline ([[PageRank]], [[Hits]],
  * [[LabelProp]], [[KCore]], the Markov queries).
  *
  * `Dataset.localCheckpoint(true)` pins the materialized rows for the
  * JVM lifetime and hands back no handle, so a fixed-point kernel that
  * cuts lineage every round leaks edges+nodes+rank blocks per CALL —
  * across a 288-query bench pass that accumulation is executor-memory
  * pressure that inflates every storage-heavy query that runs after it
  * (the r9 driver-artifact regression). The scope recovers each
  * checkpoint's pinned RDD by walking the execution RDD's dependency
  * chain to the first persisted ancestor — public RDD API only, no
  * global registry diffing, so concurrent sessions/tests can't sweep
  * each other's blocks.
  *
  * Release protocol (matches the [[Components]] liveRdds house pattern):
  *
  *  - [[mat]] — a BASE relation (edges, nodes, degrees) read every
  *    round; released by [[close]] once the final cut is taken.
  *  - [[roll]] — a LOOP-CARRIED relation: checkpointing round i+1
  *    eagerly materializes every block BEFORE the round-i blocks are
  *    released, so the old checkpoint can never be read again (lineage
  *    is already truncated — an unpersisted localCheckpoint cannot
  *    recompute, which is exactly why release must wait for the eager
  *    materialization of its successor).
  *  - [[close]] — releases all base handles and every rolling channel
  *    EXCEPT those named in `keep`: the kernel's returned plan is rooted
  *    only in the kept final checkpoints, which the caller (or the
  *    Bench/Verify per-query sweep) owns from then on.
  */
private[graft] final class CheckpointScope {
  private val base = mutable.ArrayBuffer.empty[RDD[_]]
  private val cached = mutable.ArrayBuffer.empty[DataFrame]
  private val cachedChannels = mutable.Map.empty[String, DataFrame]
  private val channels = mutable.Map.empty[String, RDD[_]]

  /** Eager localCheckpoint of a base relation, tracked for [[close]]. */
  def mat(df: DataFrame): DataFrame = {
    val out = df.localCheckpoint(true)
    Checkpoints.pinnedRdd(out).foreach(base += _)
    out
  }

  /** Eager PERSIST of a base relation whose physical LAYOUT must stay
    * visible to the planner: under AQE a `localCheckpoint`'s LogicalRDD
    * reports `UnknownPartitioning`, so a relation joined on the same key
    * every round re-pays its exchange (and sort) per iteration. A cached
    * plan's `InMemoryTableScan` keeps the HashPartitioning/ordering of
    * the materialized plan, so per-round joins against it co-partition
    * with zero exchange on this side (guide §2.4: operations keyed the
    * same way share one exchange). Lineage is NOT truncated — use only
    * for shallow base relations (edges/degrees/nodes), never for
    * loop-carried state ([[roll]] remains the lineage cut). Released by
    * [[close]]/[[closeAll]] like every other handle.
    *
    * The cache is populated by running the supplied one-row aggregate
    * over the frame (an aggregate scan materializes every partition of
    * the InMemoryRelation being built), so kernels fold their setup
    * statistics — node counts, dangling-node counts, overflow guards —
    * into the SAME job that materializes the relation instead of paying
    * a separate action per statistic.
    */
  def matLayoutStats(df: DataFrame, aggs: Column*): (DataFrame, Row) = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    cached += df
    (df, row)
  }

  /** [[matLayoutStats]] without a statistic (populate via count). */
  def matLayout(df: DataFrame): DataFrame =
    matLayoutStats(df, org.apache.spark.sql.functions.count(
      org.apache.spark.sql.functions.lit(1)))._1

  /** Rolling PERSISTED channel for loop-carried state whose layout must
    * stay visible across rounds (the [[matLayout]] rationale applied to
    * the per-round mass/state relation): persists `df`, populates the
    * cache with the given one-row aggregate (kernels read their
    * per-round global statistic — dangling mass, convergence triple —
    * from the SAME job that materializes the round), then unpersists the
    * channel's previous frame. Lineage is NOT cut — with the state
    * referenced once per round the logical plan grows linearly, and the
    * caller MUST [[roll]] the final round before [[close]] drops these
    * caches (the returned plan must never be rooted in an evicted cache
    * whose own roots were released).
    */
  def rollLayout(channel: String, df: DataFrame, aggs: Column*): (DataFrame, Row) = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    cachedChannels.remove(channel).foreach(_.unpersist(false))
    cachedChannels(channel) = df
    (df, row)
  }

  /** Release ONE base checkpoint early (a setup-only relation whose
    * derived products are already materialized) — its blocks otherwise
    * ride executor storage for the whole loop.
    */
  def release(df: DataFrame): Unit =
    Checkpoints.pinnedRdd(df).foreach { r =>
      base -= r
      r.unpersist(blocking = false)
    }

  /** Eager localCheckpoint of a loop-carried relation: the channel's
    * previous checkpoint is released as soon as the new one is fully
    * materialized. Distinct channels roll independently (HITS rolls the
    * raw-authority and raw-hub relations side by side).
    */
  def roll(channel: String, df: DataFrame): DataFrame = {
    val out = df.localCheckpoint(true)
    val h = Checkpoints.pinnedRdd(out)
    channels.remove(channel).foreach(_.unpersist(blocking = false))
    h.foreach(channels(channel) = _)
    out
  }

  /** Release every base checkpoint and every rolling channel not named
    * in `keep`. Idempotent — safe to call again from a `finally`.
    */
  def close(keep: String*): Unit = {
    base.foreach(_.unpersist(blocking = false))
    base.clear()
    cached.foreach(_.unpersist(false))
    cached.clear()
    cachedChannels.values.foreach(_.unpersist(false))
    cachedChannels.clear()
    val k = keep.toSet
    channels.filterInPlace { case (name, rdd) =>
      if (k.contains(name)) true
      else { rdd.unpersist(blocking = false); false }
    }
  }

  /** Release EVERYTHING including kept channels — the exception path
    * (the returned plan is never consumed, so nothing must survive).
    */
  def closeAll(): Unit = { close(); () }
}

private[graft] object Checkpoints {

  /** First persisted ancestor of `df`'s execution RDD — for a freshly
    * `localCheckpoint(true)`'d frame this is exactly the pinned
    * checkpoint RDD (the scan plan has no exchange, so building the
    * execution RDD here runs no job). Lineage walk over the public
    * `dependencies`/`getStorageLevel` API, depth-first first match.
    */
  def pinnedRdd(df: DataFrame): Option[RDD[_]] = {
    def walk(r: RDD[_]): Option[RDD[_]] =
      if (r.getStorageLevel != StorageLevel.NONE) Some(r)
      else r.dependencies.iterator
        .map(d => walk(d.rdd))
        .collectFirst { case Some(x) => x }
    walk(df.queryExecution.toRdd)
  }
}
