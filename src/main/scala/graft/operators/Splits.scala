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

  /** Land the corpus as `n` deterministic shards: parquet partitioned by
    * `shard`, so a dataloader reading shard k is partition-pruned to its
    * files before a row is read — the same storage discipline as
    * [[Ivf.writePartitioned]].
    */
  def writeSharded(df: DataFrame, id: String, n: Int, seed: Int, path: String): Unit =
    shard(df, id, n, seed)
      .write.partitionBy("shard").mode("overwrite").parquet(path)
}
