package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.plans.ScalarExpressions

/** Unicode NFC normalization ([[graft.plans.NfcNormalize]]) and the
  * composed cleanup ([[TextFunctions.normalizeText]]). The registered
  * `text_normalize` query hash-checks the whole chain against DuckDB's
  * `nfc_normalize`; these cases pin the pieces the oracle can't isolate -
  * real composition, the already-normalized fast path, and codegen /
  * interpreted parity. Inputs use explicit \\uXXXX escapes so no editor
  * or toolchain can silently pre-compose them.
  */
class NormalizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("nfc composes decomposed sequences; identity on normalized text") {
    import spark.implicits._
    // cafe+COMBINING ACUTE -> caf\u00e9; A+COMBINING RING -> \u00c5
    val got = Seq("cafe\u0301", "caf\u00e9", "abc", "A\u030a")
      .toDF("s")
      .select(ScalarExpressions.nfc(col("s")).as("n"))
      .as[String].collect().toSeq
    assert(got == Seq("caf\u00e9", "caf\u00e9", "abc", "\u00c5"))
  }

  test("nfc null propagates; empty survives") {
    import spark.implicits._
    val got = Seq(Some(""), None, Some("x"))
      .toDF("s")
      .select(ScalarExpressions.nfc(col("s")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(got.toSeq == Seq("", null, "x"))
  }

  test("normalizeText: NFC + control strip + space collapse + trim") {
    import spark.implicits._
    val got = Seq("  ab   cafe\u0301\u0007\ttail\u007f   ")
      .toDF("s")
      .select(TextFunctions.normalizeText(col("s")).as("n"))
      .as[String].collect().head
    // BEL/TAB/DEL stripped, space runs collapsed, e+0301 composed, ends trimmed
    assert(got == "ab caf\u00e9tail")
  }

  test("newlines survive the control strip") {
    import spark.implicits._
    val got = Seq("line1\nline2 ")
      .toDF("s")
      .select(TextFunctions.normalizeText(col("s")).as("n"))
      .as[String].collect().head
    assert(got == "line1\nline2")
  }

  test("codegen and interpreted paths agree (expression survives codegen)") {
    import spark.implicits._
    // append a non-foldable empty suffix so ConvertToLocalRelation /
    // ConstantFolding can't pre-evaluate the expression interpreted \u2014
    // the assert proves the GENERATED code path produced the bytes
    val df = spark.range(1)
      .select(concat(
        lit("cafe\u0301 A\u030a plain"),
        col("id").cast("string").substr(lit(1), lit(0))).as("s"))
      .select(ScalarExpressions.nfc(col("s")).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(1)" is simpleString's WholeStageCodegen marker: the projection
    // containing nfcnormalize compiles into the generated stage
    assert(plan.contains("*(1) Project [nfcnormalize"), plan.take(500))
    assert(df.as[String].collect().head == "caf\u00e9 \u00c5 plain")
  }
}
