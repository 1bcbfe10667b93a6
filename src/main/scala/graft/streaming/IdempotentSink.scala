package graft.streaming

import org.apache.spark.sql.DataFrame

/** Exactly-once foreachBatch file sink — the commit-protocol half of the
  * streaming recovery story ([[SessionizeStream]]/[[AsOfStream]] prove
  * STATE recovery; this proves SINK idempotence under the crash window
  * those recoveries create).
  *
  * Structured Streaming's contract: the offsets WAL is written BEFORE a
  * micro-batch runs, the commit log AFTER the sink returns. A crash
  * between sink-write and commit-log-write replays the batch on restart
  * with the SAME `batchId` and the same offset range — so a sink that
  * keys its output on the batch id and OVERWRITES is exactly-once, while
  * a blind append duplicates exactly that window
  * (ExactlyOnceSinkSpec drives both through a real commit-log rewind).
  *
  * At scale this is the standard pattern for non-transactional stores:
  * partition the output by batch id and make re-running a batch replace
  * its own partition, never touch any other.
  */
object IdempotentSink {

  /** `foreachBatch` function writing each micro-batch to
    * `outDir/batch=<id>` with overwrite — a replayed batch replaces its
    * own output instead of appending beside it.
    */
  def parquetByBatch(outDir: String)(df: DataFrame, batchId: Long): Unit =
    df.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")

  /** The NON-idempotent strawman: blind append into one directory. Used
    * by the spec to prove the crash window is real — under a commit-log
    * rewind this duplicates the replayed batch.
    */
  def appendBlind(outDir: String)(df: DataFrame, batchId: Long): Unit =
    df.write.mode("append").parquet(outDir)
}
