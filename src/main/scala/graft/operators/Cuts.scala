package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-driven cut application — the reference's only user-authored "query"
  * artifact (reference `scripts/clean_beta_scan.py:25-58`): a small table of
  * (variable, key, cut type ∈ {lower, higher}, cut value) rows interpreted
  * as a conjunction of range predicates, evaluated per group ("trigger"),
  * producing an `accepted` flag per group.
  */
final case class Cut(variable: String, key: String, cutType: String, cutValue: Double)

object Cuts {

  /** Fold a (small, driver-held) cuts table into one boolean Column: a row
    * passes when every cut whose `key` matches the row's key column holds.
    * Cuts are metadata-sized (tens of rows) so folding into the plan keeps
    * everything in whole-stage codegen — no join, no shuffle for the
    * predicate itself.
    */
  def rowPredicate(cuts: Seq[Cut], keyCol: Column): Column =
    cuts.foldLeft(lit(true)) { (acc, c) =>
      val bound = c.cutType match {
        case "lower"  => col(c.variable) >= lit(c.cutValue)
        case "higher" => col(c.variable) <= lit(c.cutValue)
        case other    => throw new IllegalArgumentException(s"cut type $other")
      }
      // rows of a different key are unconstrained by this cut
      acc && (keyCol =!= lit(c.key) || bound)
    }

  /** Group-level accepted flag: a group ("trigger") is accepted when ALL its
    * rows pass ALL applicable cuts (`bool_and` over the group). One hash
    * aggregate — scales to any number of groups.
    */
  def acceptedPerGroup(
      df: DataFrame,
      cuts: Seq[Cut],
      keyCol: String,
      groupCols: Seq[String]): DataFrame =
    df.withColumn("pass", rowPredicate(cuts, col(keyCol)))
      .groupBy(groupCols.map(col): _*)
      .agg(bool_and(col("pass")).as("accepted"))
}
