package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over a table — the
  * deequ/Great-Expectations shape, ONE aggregation pass for the whole
  * suite: every check compiles to a conditional-sum/distinct-count
  * column of a single `agg`, so a 100-check suite over 100 TB costs one
  * scan with map-side partials, never a scan per check. The report
  * (check, column, metric, threshold, pass) is a ≤ |checks|-row unpivot
  * of that 1-row aggregate.
  *
  * Metrics are exact ratios of exact longs (one IEEE division each) —
  * deterministic under any partitioning and SQL-replayable, so the suite
  * itself is oracle-checkable, which is the property a data-quality gate
  * should have before anyone trusts its green.
  */
object Quality {

  sealed trait Check {
    def name: String
    def column: String
    def threshold: Double
    /** metric expression over the raw table (aggregate column). */
    private[Quality] def metric: Column
    /** pass iff metric >= threshold (all metrics oriented as "good ↑"). */
  }

  /** Fraction of non-null values. */
  final case class NotNull(column: String, threshold: Double = 1.0) extends Check {
    val name = "not_null"
    private[Quality] def metric: Column =
      count(col(column)).cast("double") / count(lit(1))
  }

  /** Fraction of DISTINCT values among non-null rows (1.0 = unique). */
  final case class Unique(column: String, threshold: Double = 1.0) extends Check {
    val name = "unique"
    private[Quality] def metric: Column =
      count_distinct(col(column)).cast("double") / count(col(column))
  }

  /** Fraction of non-null values inside [lo, hi]. */
  final case class InRange(column: String, lo: Double, hi: Double,
      threshold: Double = 1.0) extends Check {
    val name = "in_range"
    private[Quality] def metric: Column =
      sum(when(col(column).cast("double").between(lo, hi), 1L).otherwise(0L))
        .cast("double") / count(col(column))
  }

  /** Fraction of non-null values in the accepted set. */
  final case class InSet(column: String, accepted: Seq[String],
      threshold: Double = 1.0) extends Check {
    val name = "in_set"
    private[Quality] def metric: Column =
      sum(when(col(column).isInCollection(accepted), 1L).otherwise(0L))
        .cast("double") / count(col(column))
  }

  /** Fraction of non-null values matching an RE2-portable regex. */
  final case class MatchesRe(column: String, re: String,
      threshold: Double = 1.0) extends Check {
    val name = "matches_re"
    private[Quality] def metric: Column =
      sum(when(col(column).rlike(re), 1L).otherwise(0L))
        .cast("double") / count(col(column))
  }

  /** The matching DuckDB oracle text (the DetAgg.Sql discipline: kept
    * adjacent to the Column forms so they can never drift). One CTE with
    * every metric, then a ≤ |checks|-row unpivot.
    */
  def oracleSql(table: String, checks: Seq[Check]): String = {
    def metricSql(c: Check): String = c match {
      case NotNull(col, _) =>
        s"CAST(COUNT($col) AS DOUBLE) / COUNT(*)"
      case Unique(col, _) =>
        s"CAST(COUNT(DISTINCT $col) AS DOUBLE) / COUNT($col)"
      case InRange(col, lo, hi, _) =>
        s"CAST(SUM(CASE WHEN CAST($col AS DOUBLE) BETWEEN $lo AND $hi THEN 1 ELSE 0 END) AS DOUBLE) / COUNT($col)"
      case InSet(col, acc, _) =>
        val set = acc.map(a => s"'$a'").mkString(", ")
        s"CAST(SUM(CASE WHEN $col IN ($set) THEN 1 ELSE 0 END) AS DOUBLE) / COUNT($col)"
      case MatchesRe(col, re, _) =>
        s"CAST(SUM(CASE WHEN regexp_matches($col, '$re') THEN 1 ELSE 0 END) AS DOUBLE) / COUNT($col)"
    }
    val ms = checks.zipWithIndex
      .map { case (c, i) => s"${metricSql(c)} AS m$i" }.mkString(",\n  ")
    val rows = checks.zipWithIndex.map { case (c, i) =>
      s"""SELECT '${c.name}' AS "check", '${c.column}' AS "column", m$i AS metric,
         |  CAST(${c.threshold} AS DOUBLE) AS threshold,
         |  m$i >= CAST(${c.threshold} AS DOUBLE) AS pass FROM m""".stripMargin
    }.mkString("\nUNION ALL ")
    s"WITH m AS (SELECT\n  $ms\nFROM $table)\n$rows"
  }

  /** Run the whole suite in one aggregation pass. Output:
    * (check, column, metric double, threshold double, pass boolean),
    * one row per check, in suite order.
    */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty expectation suite")
    val agg = df.agg(
      checks.head.metric.as("__m0"),
      checks.zipWithIndex.tail.map { case (c, i) => c.metric.as(s"__m$i") }: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c.name).as("check"), lit(c.column).as("column"),
        col(s"__m$i").as("metric"), lit(c.threshold).as("threshold"),
        (col(s"__m$i") >= lit(c.threshold)).as("pass"))
    }
    agg.select(explode(array(rows: _*)).as("__r")).select(col("__r.*"))
  }
}
