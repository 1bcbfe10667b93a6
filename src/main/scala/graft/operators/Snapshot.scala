package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot maintenance for versioned corpora: diff two versions of a
  * keyed table into a change feed, and apply an upsert batch MERGE-style.
  * This is the table-maintenance surface a 100 TB training corpus needs
  * between crawls — "what changed since the last snapshot" drives
  * incremental dedup/decontam ([[Dedup.incremental]]), and the merge is
  * how the curated base advances without a full rewrite.
  *
  * Both operators are ONE hash join on the key (full outer), so at
  * cluster scale they cost a single co-partitioned shuffle of each side;
  * nothing is collected, nothing is windowed. Change detection compares
  * the declared columns directly (`<=>`-negation, null-safe) — the
  * engine-portable oracle tier; a 100 TB deployment would precompute an
  * `xxhash64(*)` row digest per side instead ([[Splits.bucket100Full]]
  * discipline: same semantics, one long compare per row, not
  * DuckDB-replayable).
  */
object Snapshot {

  /** Change feed between `old` and `neu` keyed by `key`: one row per key
    * in either version, classified `added` / `removed` / `changed` /
    * `unchanged` (change = any `compare` column differs null-safely),
    * carrying the CURRENT side's values (new when present, else old).
    */
  def diff(
      old: DataFrame,
      neu: DataFrame,
      key: Seq[String],
      compare: Seq[String]): DataFrame = {
    require(key.nonEmpty, "key columns required")
    require(compare.nonEmpty, "compare columns required")
    val o = old.select((key ++ compare).map(col): _*)
      .withColumn("__op", lit(true))
    val n = neu.select((key ++ compare).map(col): _*)
      .withColumn("__np", lit(true))
    val joined = o.as("o").join(n.as("n"),
      key.map(k => col(s"o.$k") <=> col(s"n.$k")).reduce(_ && _),
      "full_outer")
    val changed = compare
      .map(c => !(col(s"o.$c") <=> col(s"n.$c")))
      .reduce(_ || _)
    joined.select(
      key.map(k => coalesce(col(s"n.$k"), col(s"o.$k")).as(k)) ++
        compare.map(c => coalesce(col(s"n.$c"), col(s"o.$c")).as(c)) :+
        when(col("o.__op").isNull, "added")
          .when(col("n.__np").isNull, "removed")
          .when(changed, "changed")
          .otherwise("unchanged").as("change"): _*)
  }

  /** MERGE semantics: rows of `updates` REPLACE matching `base` rows
    * wholesale (matched → update, not matched → insert) — a presence
    * marker picks the side, not per-column coalesce, so an update that
    * nulls a column is honored. Both inputs must share the full schema.
    */
  def merge(base: DataFrame, updates: DataFrame, key: Seq[String]): DataFrame = {
    require(key.nonEmpty, "key columns required")
    val cols = base.columns.toSeq
    require(updates.columns.toSeq == cols,
      s"schema mismatch: ${updates.columns.toSeq} vs $cols")
    val b = base.withColumn("__bp", lit(true))
    val u = updates.withColumn("__up", lit(true))
    val joined = b.as("b").join(u.as("u"),
      key.map(k => col(s"b.$k") <=> col(s"u.$k")).reduce(_ && _),
      "full_outer")
    joined.select(cols.map(c =>
      when(col("u.__up").isNotNull, col(s"u.$c"))
        .otherwise(col(s"b.$c")).as(c)): _*)
  }

  /** Slowly-changing-dimension type-2 history build: each key's versions
    * become validity intervals — `valid_from` = the version's own event
    * time, `valid_to` = the NEXT version's time (open interval), and the
    * last version per key is flagged current with a null `valid_to`.
    * One `lead` window per key, ordered by (time, tiebreak) so ties are
    * deterministic. The window partitions on the ENTITY key, so state is
    * bounded by versions-per-entity (small by construction in any CDC
    * feed), never by corpus size — the partitioning that survives 100 TB
    * of history.
    */
  def scd2(
      df: DataFrame,
      key: Seq[String],
      time: Column,
      tiebreak: Column): DataFrame = {
    require(key.nonEmpty, "key columns required")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key.map(col): _*)
      .orderBy(time, tiebreak)
    df.withColumn("valid_from", time)
      .withColumn("valid_to", lead(time, 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
