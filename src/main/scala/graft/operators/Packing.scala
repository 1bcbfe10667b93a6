package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions

/** Sequence packing for pretraining export — the batching step between a
  * cleaned corpus and a trainer: documents are tokenized, laid out in a
  * deterministic order, and cut into fixed-length training sequences.
  * (Extension surface: the reference pipeline has no trainer feed; this
  * is part of the driver-mandated LLM-data-pipeline family, next to
  * [[Splits.shuffled]] which fixes the order and [[Sampling]] which fixes
  * the mix.)
  *
  * Two tiers, same shard/order/token kernel:
  *
  *  - [[concatCut]] — GPT-style concatenate-and-cut: the shard's token
  *    stream is one long ribbon cut every `seqLen` tokens; documents may
  *    straddle a cut (the trainer masks or accepts cross-doc attention).
  *    Pure prefix-sum arithmetic → fully SQL-expressible → ORACLE tier.
  *  - [[greedyPack]] — boundary-respecting first-fit-in-order: a document
  *    never straddles; a sequence closes when the next document would
  *    overflow it. The running-fill recurrence is inherently sequential
  *    per shard (a bin boundary depends on every earlier boundary), so
  *    this tier is a per-shard `mapPartitions` pass — spec-verified
  *    (capacity / coverage / determinism-under-repartitioning), rows-only
  *    at the driver, with [[concatCut]] as the hash-exact twin of the
  *    shared shard + order + token-count kernel.
  *
  * Scale shape: ONE scan computes token counts; the only exchange is the
  * hash partition by `shard`. The per-shard window (prefix sum) and the
  * per-shard sequential fill are both bounded by the shard size, and the
  * shard count is the TRAINING-FILE unit chosen by the caller — at 100 TB
  * you size `nShards` so a shard is one dataloader file (hundreds of MB),
  * exactly the [[Splits.writeSharded]] discipline, so no window partition
  * ever sees more than one file's worth of rows. Packing is
  * embarrassingly parallel across shards by construction.
  */
object Packing {

  /** Concatenate-and-cut packing plan (oracle tier). For each document:
    * its shard (portable hash, [[Splits.shard]]), token count, the first
    * and last sequence index it touches within the shard, and its token
    * offset inside the first sequence.
    *
    * Output: `doc_id (as `id`), shard, n_tokens, seq_first, seq_last,
    * seq_offset` — enough for a writer to materialize sequence files
    * without re-reading text order. All arithmetic is exact BIGINT
    * (`div`/`%` on non-negative longs).
    */
  def concatCut(
      df: DataFrame,
      id: String,
      text: String,
      seqLen: Int,
      nShards: Int,
      seed: Int): DataFrame = {
    require(seqLen >= 1, s"seqLen $seqLen out of range")
    val toks = Splits
      .shard(
        df.select(col(id), TextFunctions.tokenCount(col(text)).cast(LongType).as("n_tokens")),
        id, nShards, seed)
    // exclusive per-shard prefix of token counts in doc-id order: the
    // window partition is one shard = one training file by construction
    // (see object scaladoc) — never a corpus-scale partition.
    val w = Window.partitionBy("shard").orderBy(id)
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      .withColumn("__pre", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(
        col(id),
        col("shard").cast(LongType).as("shard"),
        col("n_tokens"),
        expr(s"__pre div ${seqLen}L").as("seq_first"),
        expr(s"(__pre + n_tokens - 1) div ${seqLen}L").as("seq_last"),
        pmod(col("__pre"), lit(seqLen.toLong)).as("seq_offset"))
  }

  /** Boundary-respecting greedy packing (production tier): documents in
    * the same deterministic shard/doc-id order as [[concatCut]], but a
    * sequence closes when the next document would push its fill past
    * `seqLen`; a single document longer than `seqLen` gets a sequence of
    * its own (the trainer truncates — flagged by `oversize`).
    *
    * Output: `id, shard, n_tokens, seq_id (0-based within shard),
    * seq_pos (0-based within sequence), oversize`.
    *
    * Determinism: rows are hash-partitioned by `shard` (each shard lands
    * wholly inside one partition) and sorted `(shard, id)` within
    * partitions, so the sequential fill sees each shard as one contiguous
    * ordered run regardless of the upstream partitioning or core count —
    * pinned by PackingSpec's repartition-invariance case.
    */
  def greedyPack(
      df: DataFrame,
      id: String,
      text: String,
      seqLen: Int,
      nShards: Int,
      seed: Int): DataFrame = {
    require(seqLen >= 1, s"seqLen $seqLen out of range")
    val toks = Splits
      .shard(
        df.select(col(id), TextFunctions.tokenCount(col(text)).cast(LongType).as("n_tokens")),
        id, nShards, seed)
      .select(col(id).cast(LongType).as("__id"), col("shard").cast(LongType), col("n_tokens"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("__id"))
    val out = StructType(Seq(
      StructField("__id", LongType, nullable = false),
      StructField("shard", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("seq_id", LongType, nullable = false),
      StructField("seq_pos", LongType, nullable = false),
      StructField("oversize", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    val packed = toks.mapPartitions { rows =>
      var shard = Long.MinValue
      var seq = -1L; var fill = 0L; var pos = 0L
      rows.map { r =>
        val (i, s, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
        // fill = seqLen+1 forces the shard's first doc to open sequence 0
        // (never Long.MaxValue — `fill + n` must not overflow)
        if (s != shard) { shard = s; seq = -1L; fill = seqLen.toLong + 1; pos = 0L }
        if (fill + n > seqLen) { seq += 1; fill = 0L; pos = 0L }
        val p = pos
        fill += n; pos += 1
        Row(i, s, n, seq, p, n > seqLen)
      }
    }(enc)
    packed.withColumnRenamed("__id", id)
  }
}
