package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{IncrementalAgg, MinMaxAgg}

/** The IVM family COMPOSED into one streaming maintained materialized
  * view (r13 verdict item 5): per-group COUNT/SUM/AVG
  * ([[graft.operators.IncrementalAgg]]), MIN/MAX
  * ([[graft.operators.MinMaxAgg]]'s bounded heaps), and exact
  * COUNT(DISTINCT) ([[graft.operators.IncrementalAgg.distinctPartials]])
  * maintained together under op-tagged delta batches (`op = 'I'`
  * inserts / `'D'` deletes), with PARQUET state between batches and an
  * exactly-once versioned-state protocol for Structured Streaming's
  * `foreachBatch` crash window.
  *
  * EXACTLY-ONCE PROTOCOL: Structured Streaming writes the offsets WAL
  * before a micro-batch and the commit log after the sink returns, so a
  * crash between sink-write and commit replays the SAME batchId over the
  * same rows ([[IdempotentSink]]). The state store is therefore
  * VERSIONED BY BATCH ID: processing batch B reads the newest state
  * version v < B and OVERWRITES version B — a replayed batch re-folds
  * from the same parent and replaces its own half-written output, never
  * compounds onto it. The raw delta log rides the same keying
  * (`log/batch=B`, overwrite), so the repair scan's survivor set is
  * exactly-once too.
  *
  * At 100 TB: each batch costs one aggregate over the DELTA plus a
  * group-bounded state merge (states are one row per group; the
  * distinct state is group×distinct-value bounded — inherent to EXACT
  * distinct counting); the log append is the batch itself; the MIN/MAX
  * repair rescans the log only for underflowed groups (semi-join
  * pruned), which is the documented price of extreme-retraction, paid
  * only when k-deep delete runs actually exhaust a heap.
  */
object MaintainedView {

  /** The three class states of one maintained view. */
  final case class State(agg: DataFrame, minmax: DataFrame, distinct: DataFrame)

  /** Fold one op-tagged delta batch into the state. `survivors` is the
    * current base multiset (only evaluated if a MIN/MAX heap underflows
    * — pass the delta log's insert∖delete view).
    */
  def fold(
      prev: Option[State],
      batch: DataFrame,
      keys: Seq[String],
      valueCol: String,
      distinctCol: String,
      survivors: => DataFrame,
      k: Int = MinMaxAgg.DefaultK): State = {
    val ins = batch.filter(col("op") === "I")
    val del = batch.filter(col("op") === "D")
    val agg = IncrementalAgg.merge(
      prev.map(_.agg).toSeq
        :+ IncrementalAgg.partials(ins, keys, valueCol)
        :+ IncrementalAgg.partials(del, keys, valueCol, sign = -1),
      keys)
    val mmAfter = MinMaxAgg.applyDeletes(
      MinMaxAgg.mergeInserts(
        prev.map(_.minmax).toSeq :+ MinMaxAgg.partials(ins, keys, valueCol, k),
        keys, k),
      del, keys, valueCol)
    val mm = MinMaxAgg.repair(mmAfter, survivors, keys, valueCol, k)
    val dist = IncrementalAgg.distinctMerge(
      prev.map(_.distinct).toSeq
        :+ IncrementalAgg.distinctPartials(ins, keys, distinctCol)
        :+ IncrementalAgg.distinctPartials(del, keys, distinctCol, sign = -1),
      keys)
    State(agg, mm, dist)
  }

  /** The composed view `(keys*, n, total, mean, min, max, n_distinct)` —
    * one row per surviving group, every column maintained, none
    * recomputed from history.
    */
  def view(st: State, keys: Seq[String]): DataFrame =
    IncrementalAgg.view(st.agg, keys)
      .join(
        MinMaxAgg.view(st.minmax, keys)
          .select(keys.map(col) :+ col("min") :+ col("max"): _*),
        keys)
      .join(IncrementalAgg.distinctView(st.distinct, keys), keys)

  // ---- parquet-state plumbing -------------------------------------------

  private val Classes = Seq("agg", "minmax", "distinct")

  private def versionsUnder(spark: SparkSession, dir: String): Seq[Long] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toLong)
  }

  /** Newest state version strictly below `batchId` (None before the
    * first commit) — the replay-safe parent of batch `batchId`.
    */
  def parentVersion(spark: SparkSession, stateDir: String, batchId: Long): Option[Long] = {
    val perClass = Classes.map(c => versionsUnder(spark, s"$stateDir/$c")
      .filter(_ < batchId).toSet)
    // a crash can leave a PARTIAL version (some classes written): only a
    // version present in ALL three classes is a committed parent
    val common = perClass.reduce(_ intersect _)
    if (common.isEmpty) None else Some(common.max)
  }

  def stateAt(spark: SparkSession, stateDir: String, v: Long): State =
    State(
      spark.read.parquet(s"$stateDir/agg/v=$v"),
      spark.read.parquet(s"$stateDir/minmax/v=$v"),
      spark.read.parquet(s"$stateDir/distinct/v=$v"))

  /** The delta log's surviving multiset: per id, `#inserts − #deletes`
    * live instances (deletes reference insert ids — the IncrementalAgg
    * real-rows contract made addressable; all instances of one id carry
    * the same payload by that contract). Counting, NOT an anti join: a
    * row deleted and later RE-INSERTED under the same id nets to one
    * live instance — an anti join on the id would drop it from the
    * repair's survivor set entirely while the fold-maintained states
    * (which process op-tagged deltas order-correctly) still count it
    * (r14 review finding).
    */
  def logSurvivors(spark: SparkSession, stateDir: String, idCol: String): DataFrame = {
    val log = spark.read.parquet(s"$stateDir/log")
    val net = log.groupBy(col(idCol)).agg(
      sum(when(col("op") === "I", 1).otherwise(-1)).as("__net"))
    log.filter(col("op") === "I")
      .dropDuplicates(idCol)
      .join(net.filter(col("__net") > 0), Seq(idCol))
      .withColumn("__i", explode(sequence(lit(1), col("__net"))))
      .drop("__net", "__i")
  }

  /** `foreachBatch` sink maintaining the three-class state under the
    * versioned exactly-once protocol. The batch must carry `idCol`,
    * `keys`, `valueCol`, `distinctCol`, and `op`.
    */
  def sink(
      stateDir: String,
      idCol: String,
      keys: Seq[String],
      valueCol: String,
      distinctCol: String,
      k: Int = MinMaxAgg.DefaultK)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    // 1. log first (overwrite = replay-safe): repair and audits read it
    batch.write.mode("overwrite").parquet(s"$stateDir/log/batch=$batchId")
    // 2. fold from the committed parent version
    val parentV = parentVersion(spark, stateDir, batchId)
    val prev = parentV.map(v => stateAt(spark, stateDir, v))
    val st = fold(
      prev, spark.read.parquet(s"$stateDir/log/batch=$batchId"),
      keys, valueCol, distinctCol,
      survivors = logSurvivors(spark, stateDir, idCol), k)
    // 3. commit version batchId (overwrite per class — a replay replaces
    // its own half-written output; parentVersion ignores partial commits)
    st.agg.write.mode("overwrite").parquet(s"$stateDir/agg/v=$batchId")
    st.minmax.write.mode("overwrite").parquet(s"$stateDir/minmax/v=$batchId")
    st.distinct.write.mode("overwrite").parquet(s"$stateDir/distinct/v=$batchId")
    // 4. prune versions OLDER than this batch's parent: the parent must
    // survive (a crash-replay of THIS batch re-reads it — `< batchId`
    // excludes the version just written), but anything older can never
    // be a parent again (parentVersion takes the newest), so state stays
    // two versions deep forever. The delta LOG is never pruned — it IS
    // the base relation the underflow repair rescans.
    val parent = parentV.getOrElse(-1L)
    val conf = spark.sparkContext.hadoopConfiguration
    for (c <- Classes; v <- versionsUnder(spark, s"$stateDir/$c") if v < parent) {
      val p = new org.apache.hadoop.fs.Path(s"$stateDir/$c/v=$v")
      p.getFileSystem(conf).delete(p, true)
    }
  }

  /** Read-side: the composed view of the newest committed state. */
  def latestView(spark: SparkSession, stateDir: String, keys: Seq[String]): DataFrame = {
    val v = parentVersion(spark, stateDir, Long.MaxValue)
      .getOrElse(throw new IllegalStateException(
        s"MaintainedView: no committed state under $stateDir"))
    view(stateAt(spark, stateDir, v), keys)
  }
}
