package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (when SQL-expressible)
  * the equivalent ANSI SQL the driver runs in DuckDB. Queries without an
  * oracle get a weaker rows-only check (bootstrap / fits / LSH — anything
  * whose exact output is not expressible in portable SQL).
  *
  * Column names MUST match between the Spark result and the oracle SQL —
  * the driver sorts columns by name before hashing values.
  */
final case class Q(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

object Registry {
  /** All registered queries, in SURVEY §2 inventory order. */
  def all: Seq[Q] =
    CoreQueries.all ++ RelationalQueries.all ++ KernelQueries.all ++
      TextQueries.all ++ SimilarityQueries.all ++ FitQueries.all ++
      AnalysisQueries.all ++ MiscQueries.all ++ EventQueries.all ++
      FederationQueries.all ++ GroupingQueries.all ++ ProfileQueries.all ++
      MaintenanceQueries.all
}
