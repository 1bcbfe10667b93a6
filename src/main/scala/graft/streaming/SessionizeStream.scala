package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization over the events table —
  * `flatMapGroupsWithState` with event-time timeout (SURVEY §2.9
  * extension surface): per user, events within `gapSeconds` belong to one
  * session; a session is EMITTED when the watermark passes its gap (state
  * timeout), so state is bounded and the operator runs indefinitely.
  */
object SessionizeStream {

  /** Native `session_window` sessionization — the built-in alternative to
    * the [[sessionize]] `flatMapGroupsWithState` form: Spark merges
    * overlapping gap-windows per key in the state store. Prefer this when
    * per-session logic is pure aggregation (the custom-state form exists
    * for logic the merge model can't express, e.g. event-pattern
    * sequencing inside a session).
    */
  def sessionizeNative(
      stream: org.apache.spark.sql.DataFrame,
      gapSeconds: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    stream
      .withWatermark("ts", "30 minutes")
      .groupBy(
        col("user_id"),
        session_window(col("ts"), s"$gapSeconds seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
  }

  final case class Event(user_id: Long, event_id: Long, ts: Timestamp)
  final case class SessionState(
      start: Long, last: Long, n: Int)
  final case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp, n_events: Int)

  def sessionize(
      events: Dataset[Event],
      gapSeconds: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", s"$gapSeconds seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          val out = scala.collection.mutable.ListBuffer.empty[Session]
          if (state.hasTimedOut) {
            val s = state.get
            out += Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n)
            state.remove()
          } else {
            var cur = state.getOption
            batch.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapSeconds * 1000 =>
                  cur = Some(s.copy(last = math.max(s.last, t), n = s.n + 1))
                case Some(s) =>
                  out += Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapSeconds * 1000)
            }
          }
          out.iterator
      }
  }

  /** Drive the stateful sessionizer over a parquet directory; results
    * land in an in-memory table (local smoke path).
    */
  def runOnce(spark: SparkSession, path: String, gapSeconds: Long, sinkTable: String) = {
    import spark.implicits._
    val events = EventsStream.readStreamed(spark, path)
      .select("user_id", "event_id", "ts")
      .as[Event]
    val q = sessionize(events, gapSeconds)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(sinkTable)
      .start()
    q.processAllAvailable()
    q
  }
}
