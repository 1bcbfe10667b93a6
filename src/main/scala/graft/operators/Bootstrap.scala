package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seeded, deterministic bootstrap resampling (SURVEY §2.5 A10 — reference
  * `groupby(...).sample(frac=1, replace=True)` at `scripts/utils.py:54-56`,
  * `scripts/time_resolution_beta_scan.py:21-30`; repeated N_BOOTSTRAP=33
  * times).
  *
  * The reference draws unseeded numpy samples in a driver loop — results
  * are irreproducible and the loop serializes. Here the replica index is a
  * DATA dimension: one lazy plan carries all replicas, every draw is a pure
  * function of (seed, replica, position) via xxhash64, so results are
  * identical across runs, partitionings, and cluster sizes.
  *
  * Two forms:
  *  - [[exactResample]]: true per-group multinomial (each group of size n
  *    draws exactly n rows with replacement) — matches pandas semantics;
  *    costs one extra shuffle to deal draws to rows.
  *  - [[poissonResample]]: per-row multiplicity ~ Poisson(1), the standard
  *    large-scale approximation (group size only approximately preserved)
  *    — no join, embarrassingly parallel, the 100 TB path.
  */
object Bootstrap {

  /** Exact multinomial bootstrap: for each group and each replica in
    * [0, replicas), draw |group| members with replacement.
    *
    * `orderBy` must totally order rows within a group (it fixes which row
    * owns which draw index, making the output multiset deterministic).
    * Output = input columns + `replica`.
    */
  def exactResample(
      df: DataFrame,
      groupCols: Seq[String],
      orderBy: Seq[Column],
      replicas: Int,
      seed: Long): DataFrame = {
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(orderBy: _*)
    val rows = df.withColumn("__rid", row_number().over(w))
    val sizes = df.groupBy(g: _*).agg(count(lit(1)).as("__n"))
    // one draw per (existing row, replica): each row owns draw index
    // __rid ∈ 1..n, so the draw table is generated FROM the distributed
    // rows (tiny replicas-length explode per row) rather than exploding a
    // sequence(1, n) array per group — a 10⁵-element array per
    // (group, replica) serializes on a handful of tasks; this form keeps
    // the original partitioning. The drawn index is still a pure function
    // of (group, replica, i, seed).
    val draws = rows
      .select((g :+ col("__rid").as("__i")): _*)
      .join(broadcast(sizes), groupCols)
      .withColumn("replica", explode(sequence(lit(0), lit(replicas - 1))))
      .withColumn(
        "__rid",
        (pmod(xxhash64(g :+ col("replica") :+ col("__i") :+ lit(seed): _*), col("__n")) + 1)
          .cast("int"))
      .select((g :+ col("replica") :+ col("__rid")): _*)
    draws
      .join(rows, groupCols :+ "__rid")
      .drop("__rid")
  }

  /** Poisson(1) inverse-CDF thresholds: P(X <= k) for k = 0..9. Rows with
    * multiplicity 0 drop out; >9 is truncated (P < 1e-10).
    */
  private val poissonCdf: Array[Double] = {
    var cdf = List.empty[Double]
    var p = math.exp(-1.0)
    var acc = p
    cdf ::= acc
    for (k <- 1 to 9) { p /= k; acc += p; cdf ::= acc }
    cdf.reverse.toArray
  }

  /** Shortest-roundtrip literals of [[poissonCdf]] — shared by the Column
    * form and the SQL mirror so both engines compare against bit-identical
    * thresholds.
    */
  private val cdfLits: Array[String] = poissonCdf.map(_.toString)

  /** Poisson(1) multiplicity from a Knuth multiplicative hash of an
    * integer key — every operation (mod, multiply, mod, exact
    * double-divide by 2³²) is plain ANSI arithmetic, so the SAME text runs
    * in DuckDB ([[Sql.portableMultiplicity]]) and resampled aggregates
    * become oracle-checkable. Mixing is weaker than xxhash64 (the key is
    * reduced mod 1e5 first); prefer [[poissonResample]] when portability
    * isn't needed. The caller composes replica/seed into `key`.
    */
  def portableMultiplicity(key: Column): Column = {
    val u = pmod(pmod(key, lit(100000L)) * lit(2654435761L), lit(4294967296L))
      .cast("double") / lit(4294967296.0)
    cdfLits.zipWithIndex.foldRight(lit(cdfLits.length): Column) {
      case ((t, k), acc) => when(u < lit(t.toDouble), k).otherwise(acc)
    }
  }

  /** The house (trigger, replica) → multiplicity key: two coprime odd
    * multipliers decorrelate replicas of the same trigger through the
    * mod-1e5 reduction inside [[portableMultiplicity]]. ONE definition
    * (plus its [[Sql.replicaKey]] text mirror) — the r13 review found
    * the literal string hand-copied across pipelines, the exact drift
    * the shared-text discipline exists to prevent.
    */
  def replicaKey(trigger: Column, replica: Column): Column =
    trigger * lit(131L) + replica * lit(104729L)

  /** SQL-text mirror of [[portableMultiplicity]] (DuckDB dialect = same
    * ANSI text), kept adjacent so the two can never drift. `key` must be
    * a non-negative integer expression (both engines' `%` agree there).
    */
  object Sql {
    def portableMultiplicity(key: String): String = {
      val u = s"(((($key) % 100000) * 2654435761) % 4294967296) / 4294967296.0"
      cdfLits.zipWithIndex.foldRight(cdfLits.length.toString) {
        case ((t, k), acc) => s"CASE WHEN $u < $t THEN $k ELSE $acc END"
      }
    }

    /** Text mirror of [[Bootstrap.replicaKey]]. */
    def replicaKey(trigger: String, replica: String): String =
      s"$trigger * 131 + $replica * 104729"
  }

  /** Poissonized bootstrap: each row appears m ~ Poisson(1) times per
    * replica, m a pure function of (hashCols, replica, seed). No shuffle,
    * no join — scales to any size. Output = input + `replica`.
    */
  def poissonResample(
      df: DataFrame,
      hashCols: Seq[Column],
      replicas: Int,
      seed: Long): DataFrame =
    poissonWeights(df, hashCols, replicas, seed)
      .withColumn("__dup", explode(array_repeat(lit(1), col("__m"))))
      .drop("__m", "__dup")

  /** [[poissonResample]] WITHOUT the physical row duplication: the same
    * draws, surfaced as a `__m` multiplicity column (rows with m = 0
    * dropped — they contribute nothing to any downstream aggregate).
    * Consumers fold the multiplicity into their aggregates (Σ w·m /
    * Σ m) instead of exploding m copies of every row — identical values
    * (an exact decimal sum of m copies of x equals the exact sum of
    * x·m), a fraction of the rows (guide §2.3: aggregate weighted,
    * don't replicate). This is the same weighted form the flagship's
    * binned pass and `a10_bootstrap_hash` already use.
    */
  def poissonWeights(
      df: DataFrame,
      hashCols: Seq[Column],
      replicas: Int,
      seed: Long): DataFrame = {
    val withReplica = df.withColumn("replica", explode(sequence(lit(0), lit(replicas - 1))))
    // xxhash64 → uniform double in [0, 1)
    val u = (xxhash64(hashCols :+ col("replica") :+ lit(seed): _*).cast("double")
      / lit(2.0 * Long.MaxValue)) + lit(0.5)
    val m = poissonCdf.zipWithIndex.foldRight(lit(poissonCdf.length): Column) {
      case ((t, k), acc) => when(u < t, k).otherwise(acc)
    }
    withReplica
      .withColumn("__m", m)
      .filter(col("__m") > 0)
  }
}
