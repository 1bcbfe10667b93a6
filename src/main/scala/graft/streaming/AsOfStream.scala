package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming AS-OF join — the stateful twin of [[graft.operators.AsOfJoin]]
  * (E4): each left (probe) event is enriched with the MOST RECENT right
  * (reference) event at or before its time, per key.
  *
  * [[EnrichStream.intervalJoin]] is the built-in approximation (all rights
  * within a window, caller picks); this operator gives the exact as-of
  * semantics, which Spark's stream-stream joins cannot express (no
  * per-row argmax), via `flatMapGroupsWithState`:
  *
  *  - both sides are TAGGED and unioned (the streaming analogue of the
  *    batch operator's union + ordered carry-forward), watermarked once;
  *  - per key, lefts and rights buffer in state until the event-time
  *    watermark passes a left's timestamp — at that point every right ≤
  *    that time has arrived (same watermark bounds both sides), so the
  *    match is final and the row is emitted;
  *  - state is BOUNDED: emitted lefts leave the buffer; of the rights at
  *    or before the watermark only the newest is kept (it is the only one
  *    a future left can still match); idle keys time out after
  *    `idleTtlSeconds` and are removed.
  */
object AsOfStream {

  final case class Tick(key: Long, side: Int, ts: Timestamp, left_id: Long, value: Double)
  final case class Buf(lefts: List[(Long, Long)], rights: List[(Long, Double)])
  final case class Out(key: Long, left_id: Long, ts: Timestamp, asof_value: Option[Double])

  /** @param left   (key, left_id, ts) probe stream
    * @param right  (key, value, ts) reference stream
    * @param watermark  lateness bound applied to the unioned stream
    * @param idleTtlSeconds  event-time TTL after which an idle key's
    *                        state (the one retained right row) is dropped
    */
  def asOfStream(
      left: DataFrame,
      right: DataFrame,
      watermark: String,
      idleTtlSeconds: Long = 3600L): Dataset[Out] = {
    val spark = left.sparkSession
    import spark.implicits._
    val l = left.select(
      col("key"), lit(0).as("side"), col("ts"), col("left_id"), lit(0.0).as("value"))
    val r = right.select(
      col("key"), lit(1).as("side"), col("ts"), lit(0L).as("left_id"), col("value"))
    l.unionByName(r)
      .withWatermark("ts", watermark)
      .as[Tick]
      .groupByKey(_.key)
      .flatMapGroupsWithState[Buf, Out](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, batch: Iterator[Tick], state: GroupState[Buf]) =>
          val prev = state.getOption.getOrElse(Buf(Nil, Nil))
          val wm = state.getCurrentWatermarkMs()
          var lefts = prev.lefts
          var rights = prev.rights
          batch.foreach { t =>
            // standard late-data contract: a probe older than the current
            // watermark is DROPPED at ingest — the rights buffer is
            // already pruned to the single newest right ≤ wm, so a late
            // probe could only ever see a plausible-but-wrong (or absent)
            // match. Late RIGHTS are still accepted: one newer than the
            // retained row improves future matches, one older is pruned.
            if (t.side == 0) {
              if (t.ts.getTime > wm) lefts = (t.ts.getTime, t.left_id) :: lefts
            } else rights = (t.ts.getTime, t.value) :: rights
          }
          // lefts at or before the watermark have their final match now
          val (ripe, pending) = lefts.partition(_._1 <= wm)
          val out = ripe.sortBy(l0 => (l0._1, l0._2)).map { case (lt, id) =>
            val m = rights.filter(_._1 <= lt)
            val best = if (m.isEmpty) None else Some(m.maxBy(_._1)._2)
            Out(key, id, new Timestamp(lt), best)
          }
          // of the rights ≤ wm only the newest can still match a future
          // left (every future left is later than wm)
          val (old, future) = rights.partition(_._1 <= wm)
          val kept = (if (old.isEmpty) Nil else List(old.maxBy(_._1))) ::: future
          // idle-TTL expiry: the timeout fired with NO probes buffered —
          // nothing was waiting, so the retained right row is stale and
          // the key's state is dropped. (A timeout that fired to flush
          // ripe probes keeps the right row: future probes still match.)
          val idleExpiry = state.hasTimedOut && prev.lefts.isEmpty
          if (pending.isEmpty && (kept.isEmpty || idleExpiry)) {
            state.remove()
          } else {
            state.update(Buf(pending, kept))
            if (pending.nonEmpty)
              state.setTimeoutTimestamp(pending.map(_._1).min)
            else {
              // idle TTL anchored to EVENT time (newest retained right),
              // not the raw watermark — at the first trigger the watermark
              // is still 0, and `wm + ttl` would land in 1970 and expire
              // the key the moment the watermark initializes
              val newest = kept.map(_._1).max
              state.setTimeoutTimestamp(
                math.max(wm + 1, math.max(newest, wm) + idleTtlSeconds * 1000))
            }
          }
          out.iterator
      }
  }
}
