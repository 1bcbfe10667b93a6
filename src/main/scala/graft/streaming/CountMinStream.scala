package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.CountMin

/** Windowed count-min heavy-hitter monitor — the streaming serving twin
  * of the batch `sketch_cms_topk` (the sessionize/anomaly/quantile
  * serving-both-ways discipline): ONE function builds the per-window
  * d×w counter relation, valid as a watermarked streaming aggregation
  * (tumbling event-time window × a literal hash-row union) and as a
  * batch query — the registry's `stream_topk_monitor` runs the batch
  * form against a DuckDB replay, StreamingSpec drives the same plan
  * through `readStream`.
  *
  * Why this is the 100 TB serving shape: per-window state is EXACTLY
  * d×w counters regardless of key cardinality (the CMS contract), the
  * counters merge by addition (map-side partials, cross-shard/day
  * merges), and any key's per-window frequency is answerable later
  * from constant state — no per-user exact counts retained anywhere.
  * Hash family and estimate semantics are [[graft.operators.CountMin]]
  * verbatim, so the one-sided guarantee (estimate ≥ true; ≤ true + N/w
  * w.p. 1−2^−d) holds per window.
  */
object CountMinStream {

  /** Per-(5-minute tumbling window) CMS counters
    * `(window_start, r, b, c)`. `events` may be a `readStream` (append
    * mode under the 10-minute watermark) or a batch frame — the plan is
    * the same aggregation either way. Windows align to the epoch, so
    * `floor(epoch/300)` buckets match `window_start` exactly.
    */
  def windowedCounters(events: DataFrame, d: Int, w: Int): DataFrame = {
    require(d >= 1 && d <= 16 && w >= 2, s"bad sketch shape d=$d w=$w")
    val keyed = events
      .withWatermark("ts", "10 minutes")
      .select(window(col("ts"), "5 minutes").as("win"), col("user_id").as("v"))
    (0 until d).map { r =>
      keyed.select(
        col("win"), lit(r.toLong).as("r"), CountMin.bucket(col("v"), r, w).as("b"))
    }.reduce(_ union _)
      .groupBy("win", "r", "b").agg(count(lit(1)).as("c"))
      .select(col("win.start").as("window_start"), col("r"), col("b"), col("c"))
  }

  /** Per-window estimates for a probe-key relation `(v)` against the
    * counter relation: min over the d cells of each (window, key) —
    * absent cells estimate 0 (the key never appeared in that window).
    *
    * PRECONDITION (r11 ADVICE): `probe` must be SMALL — it is
    * force-broadcast (windows × probe × d grid), which is the right
    * plan for the heavy-hitter use (a handful of watch keys) but a
    * driver-memory hazard for an unbounded probe relation. Guarded by
    * [[MaxProbeKeys]]: a larger probe set fails loudly at plan time —
    * callers with a genuinely large probe side should join the
    * counters directly (shuffle on (window, r, b)) instead of
    * sketch-probing, because at that cardinality the exact windowed
    * count IS the cheaper query.
    */
  val MaxProbeKeys = 10000

  /** True when the probe plan PROVES ≤ [[MaxProbeKeys]] rows without
    * running anything: a LIMIT ≤ cap above a chain of
    * row-non-increasing unary nodes, or (r12 ADVICE) a bounded LEAF —
    * a LocalRelation's row count is known driver-side and a Range's
    * numElements is a literal, so trivially small in-memory probes
    * skip the counting job. The walk descends ONLY through
    * row-non-increasing unary nodes — a limit/leaf found anywhere
    * (collectFirst over the whole tree) would wrongly bless
    * limit(k).join(expander), whose output is unbounded (r12 review).
    */
  private[graft] def staticallyBounded(probe: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.catalyst.expressions.Literal
    @scala.annotation.tailrec
    def bounded(p: LogicalPlan): Boolean = p match {
      case GlobalLimit(Literal(n: Int, _), _) => n <= MaxProbeKeys
      case l: LocalRelation => l.data.size <= MaxProbeKeys
      case r: Range => r.numElements <= MaxProbeKeys
      case _: Project | _: Filter | _: SubqueryAlias | _: LocalLimit |
          _: Distinct | _: Deduplicate =>
        bounded(p.children.head)
      case _ => false
    }
    bounded(probe.queryExecution.analyzed)
  }

  def estimateWindowed(
      probe: DataFrame, counters: DataFrame, d: Int, w: Int): DataFrame = {
    // plan-provably-small probes skip the counting job — the rules
    // live on [[staticallyBounded]]
    if (!staticallyBounded(probe)) {
      val nProbe = probe.limit(MaxProbeKeys + 1).count()
      require(nProbe <= MaxProbeKeys,
        s"estimateWindowed: probe relation exceeds $MaxProbeKeys keys — " +
          "too large to broadcast as a windows-cross-probe grid; join the " +
          "counter relation on (window, r, b) instead")
    }
    val buckets = (0 until d).map { r =>
      probe.select(col("v"), lit(r.toLong).as("r"), CountMin.bucket(col("v"), r, w).as("b"))
    }.reduce(_ union _)
    // full (window × key × r) grid, THEN left join: an absent cell is a
    // 0 count, and skipping it (inner join) would min over fewer cells
    // and overestimate exactly the sparse windows
    counters.select("window_start").distinct()
      .crossJoin(broadcast(buckets))
      .join(counters, Seq("window_start", "r", "b"), "left")
      .groupBy("window_start", "v")
      .agg(min(coalesce(col("c"), lit(0L))).as("n_cms"))
  }
}
