package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming joins (SURVEY §2.9 extension surface):
  *
  *  - [[withDimension]]: stream × static dimension — the dimension is a
  *    plain broadcast per micro-batch, so the stream side never shuffles
  *    (the streaming face of J2).
  *  - [[intervalJoin]]: stream × stream within an event-time interval —
  *    the streaming face of the as-of join (E4): each left event pairs
  *    with right events at most `intervalSeconds` older. Watermarks on
  *    BOTH sides + the time-range predicate bound the join state; without
  *    them a stream-stream join buffers forever.
  */
object EnrichStream {

  /** Broadcast-enrich a stream with a static dimension on `key`. */
  def withDimension(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Inner stream-stream join: left row at time lt pairs with right rows
    * with rt ∈ [lt − intervalSeconds, lt]. `leftTime`/`rightTime` must be
    * timestamp columns; both inputs get `watermark` applied here.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      intervalSeconds: Long,
      watermark: String): DataFrame = {
    val l = left.withWatermark(leftTime, watermark)
    val r = right.withWatermark(rightTime, watermark)
    l.join(
      r,
      l(key) === r(key) &&
        r(rightTime) >= l(leftTime) - expr(s"INTERVAL $intervalSeconds SECONDS") &&
        r(rightTime) <= l(leftTime),
      "inner")
      .drop(r(key))
  }
}
