package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splits for training pipelines: every row's split
  * is a pure function of its id (Knuth multiplicative hash, plain BIGINT
  * arithmetic — reproducible on any engine, any partitioning, any day),
  * so train/val/test membership never shifts when the corpus is
  * re-processed, appended to, or re-partitioned. Stratification falls out
  * for free: hashing is independent of any grouping column, so per-group
  * proportions converge to the requested fractions.
  */
object Splits {

  /** Bucket in [0, 100) from an integer id. The id is reduced mod 1e5
    * before the multiply so the product stays well inside 64 bits (BIGINT
    * overflow is an ERROR in ANSI engines, silent wrap in Java — avoid
    * both). The mod-1e5 reduction makes this the engine-portable ORACLE
    * tier: ids that differ by a multiple of 100 000 share a bucket, so
    * whole residue classes move together. Fine for cross-engine
    * verification; for >100k-id corpora use [[bucket100Full]].
    */
  def bucket100(id: Column, seed: Int): Column =
    pmod((pmod(id + lit(seed), lit(100000L))) * lit(2654435761L), lit(4294967296L)) % 100

  /** Production tier of [[bucket100]]: hashes the FULL id with xxhash64
    * (no residue-class periodicity), so it stays uniform on 100 TB-scale
    * id spaces. Not DuckDB-expressible — verified by spec, not oracle.
    */
  def bucket100Full(id: Column, seed: Int): Column =
    pmod(xxhash64(id, lit(seed)), lit(100L))

  /** Adds a `split` column: train / val / test with the given percent
    * boundaries (train < trainPct ≤ val < trainPct+valPct ≤ test).
    */
  def trainValTest(
      df: DataFrame,
      id: String,
      trainPct: Int,
      valPct: Int,
      seed: Int): DataFrame = {
    val b = bucket100(col(id), seed)
    df.withColumn(
      "split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Adds a deterministic `shard` column in [0, n) — the dataloader-prep
    * step: shard membership is a pure function of the id (same portable
    * hash family as [[bucket100]]), so every re-run of the writer
    * produces identical shards and a training job can address shard k
    * without a manifest. Use [[writeSharded]] to land them as
    * partitioned parquet.
    */
  def shard(df: DataFrame, id: String, n: Int, seed: Int): DataFrame =
    df.withColumn(
      "shard",
      pmod(pmod(col(id) + lit(seed), lit(100000L)) * lit(2654435761L), lit(4294967296L)) % n)

  /** Leak-free grouped k-fold assignment — the cross-validation split
    * whose unit is a GROUP (all rows of an order / document / user land
    * in the same fold, so feature leakage across folds through shared
    * groups is structurally impossible): `fold` is the [[bucket100]]
    * portable hash of the GROUP key mod k, a pure function of the key —
    * stable under reprocessing, appends, and repartitioning.
    */
  def groupKFold(df: DataFrame, group: String, k: Int, seed: Int): DataFrame =
    df.withColumn(
      "fold",
      pmod(pmod(col(group) + lit(seed), lit(100000L)) * lit(2654435761L),
        lit(4294967296L)) % k)

  /** Land the corpus as `n` deterministic shards: parquet partitioned by
    * `shard`, so a dataloader reading shard k is partition-pruned to its
    * files before a row is read — the same storage discipline as
    * [[Ivf.writePartitioned]].
    */
  def writeSharded(df: DataFrame, id: String, n: Int, seed: Int, path: String): Unit =
    shard(df, id, n, seed)
      .write.partitionBy("shard").mode("overwrite").parquet(path)

  /** Seed-stable GLOBAL SHUFFLE for training export: every row gets its
    * [[shard]] plus a deterministic 1-based position WITHIN the shard
    * (ordered by an independently-seeded hash of the id, id tiebreak) —
    * the "shuffle the corpus once, then stream shard k in order"
    * contract a training run needs for reproducible batches and exact
    * mid-epoch resume. Same portable-hash family as [[bucket100]]
    * (oracle tier); [[shuffledFull]] is the xxhash64 production tier.
    *
    * The position window partitions by shard — choose `n` so a shard is
    * a file-sized unit (the same sizing the export files need anyway)
    * and the partitions stay bounded by design, never corpus-wide. The
    * ordering hash uses `seed + 13`, decorrelating order from shard
    * membership (both are affine in the same reduced id, so SHARING the
    * seed would make within-shard order id-monotone — not a shuffle).
    */
  def shuffled(df: DataFrame, id: String, n: Int, seed: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = pmod(
      pmod(col(id) + lit(seed.toLong + 13L), lit(100000L)) * lit(2654435761L),
      lit(4294967296L))
    shard(df, id, n, seed)
      .withColumn("__ord", ord)
      .withColumn(
        "pos",
        row_number().over(Window.partitionBy(col("shard")).orderBy(col("__ord"), col(id))))
      .drop("__ord")
  }

  /** Production tier of [[shuffled]]: full-id xxhash64 for both shard
    * and order (no residue-class periodicity on >100k-id spaces). Spec-
    * verified (determinism, shard agreement with [[bucket100Full]]'s
    * family), not oracle-expressible.
    */
  def shuffledFull(df: DataFrame, id: String, n: Int, seed: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("shard", pmod(xxhash64(col(id), lit(seed)), lit(n.toLong)))
      .withColumn("__ord", xxhash64(col(id), lit(seed + 13)))
      .withColumn(
        "pos",
        row_number().over(Window.partitionBy(col("shard")).orderBy(col("__ord"), col(id))))
      .drop("__ord")
  }
}
