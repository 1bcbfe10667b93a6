package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Quality
import graft.operators.Quality._

class QualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def frame = {
    import spark.implicits._
    Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "A", 10.0), (2L, "B", 20.0), (3L, "A", 30.0),
      (4L, "C", 200.0), (null, "A", null))
      .toDF("id", "cat", "v")
  }

  test("metrics are exact ratios and thresholds gate pass") {
    val out = Quality.run(frame, Seq(
      NotNull("id"),                                   // 4/5 = 0.8 -> fail at 1.0
      NotNull("id", threshold = 0.8),                  // pass exactly at threshold
      Unique("id"),                                    // 4 distinct / 4 non-null = 1.0
      InRange("v", 0.0, 100.0),                        // 3/4 non-null in range
      InSet("cat", Seq("A", "B")),                     // 4/5
      MatchesRe("cat", "^[AB]$")))                     // 4/5
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getBoolean(4)))
    assert(out(0) == ("not_null", 0.8, false))
    assert(out(1) == ("not_null", 0.8, true))
    assert(out(2) == ("unique", 1.0, true))
    assert(out(3) == ("in_range", 0.75, false))
    assert(out(4) == ("in_set", 0.8, false))
    assert(out(5) == ("matches_re", 0.8, false))
  }

  test("the whole suite is ONE aggregation pass over the table") {
    val plan = Quality.run(frame, Seq(
      NotNull("id"), InRange("v", 0.0, 100.0), InSet("cat", Seq("A"))))
      .queryExecution.optimizedPlan
    val aggs = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.size == 1, s"expected one Aggregate, got:\n$plan")
  }

  test("suite order is preserved in the report") {
    val out = Quality.run(frame, Seq(
      InSet("cat", Seq("A")), NotNull("id"), Unique("id")))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("in_set", "not_null", "unique"))
  }
}
