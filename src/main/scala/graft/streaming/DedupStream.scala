package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication — the streaming face of the training-pipeline
  * dedup surface (`operators.Dedup`): exact-id and content-fingerprint
  * dedup over an unbounded stream.
  *
  * State discipline at scale: `dropDuplicatesWithinWatermark` keeps one
  * state row per key only until the watermark passes it, so state is
  * bounded by (event-time horizon × key rate) — the unbounded-state
  * `dropDuplicates` variant is correct-but-dangerous on an infinite
  * stream and deliberately not used here. The dedup key for content
  * dedup is the same normalized fingerprint the batch path uses
  * ([[graft.functions.TextFunctions.fingerprint]]), so a corpus processed
  * incrementally and one processed in batch keep IDENTICAL survivors.
  */
object DedupStream {

  /** Keep the first occurrence of each `idCol` within the watermark
    * horizon. `stream` must already carry an event-time column named
    * `eventTimeCol`.
    */
  def dedupById(
      stream: DataFrame,
      idCol: String,
      eventTimeCol: String,
      watermark: String): DataFrame =
    stream
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(idCol)

  /** Content dedup: first document per normalized-text fingerprint within
    * the watermark horizon (batch twin: `Dedup.exactGroups` over
    * `TextFunctions.fingerprint`).
    */
  def dedupByContent(
      stream: DataFrame,
      textCol: String,
      eventTimeCol: String,
      watermark: String): DataFrame =
    stream
      .withColumn("__fp", graft.functions.TextFunctions.fingerprint(col(textCol)))
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
}
