package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("asOf picks the latest right row at-or-before each left time, per key") {
    import spark.implicits._
    val left = Seq(
      ("u1", 10L, "a"), ("u1", 25L, "b"), ("u1", 5L, "c"),
      ("u2", 10L, "d")).toDF("k", "t", "tag")
    val right = Seq(
      ("u1", 10L, 1.0), ("u1", 20L, 2.0), ("u2", 50L, 9.0))
      .toDF("k", "t", "v")
    val got = AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("v"))
      .collect()
      .map(r => (r.getAs[String]("tag"),
        Option(r.getAs[java.lang.Double]("asof_v")).map(_.doubleValue())))
      .toMap
    assert(got("a").contains(1.0)) // exact-time match (≤ semantics)
    assert(got("b").contains(2.0)) // latest of the two earlier rows
    assert(got("c").isEmpty)       // nothing at or before t=5
    assert(got("d").isEmpty)       // u2's only right row is later
  }

  private def nearest(left: Seq[(String, Long, String)],
      right: Seq[(String, Long, Double)], tol: Long): Map[String, Option[Double]] = {
    import spark.implicits._
    AsOfJoin.asOfNearest(
        left.toDF("k", "t", "tag"), right.toDF("k", "t", "v"),
        Seq("k"), "t", "t", "v", tol)
      .collect()
      .map(r => (r.getAs[String]("tag"),
        Option(r.getAs[java.lang.Double]("asof_v")).map(_.doubleValue())))
      .toMap
  }

  test("asOfNearest picks the closer direction, ties backward") {
    val right = Seq(("u", 10L, 1.0), ("u", 20L, 2.0))
    val got = nearest(Seq(
      ("u", 13L, "back"),   // 3 behind vs 7 ahead → backward
      ("u", 18L, "fwd"),    // 8 behind vs 2 ahead → forward
      ("u", 15L, "tie"),    // 5 either way → pandas tie rule: backward
      ("u", 10L, "exact")), // Δ=0 backward
      right, tol = 100L)
    assert(got == Map(
      "back" -> Some(1.0), "fwd" -> Some(2.0),
      "tie" -> Some(1.0), "exact" -> Some(1.0)))
  }

  test("asOfNearest tolerance nulls matches beyond the bound") {
    val right = Seq(("u", 100L, 5.0))
    val got = nearest(Seq(
      ("u", 104L, "in"),     // |Δ|=4 ≤ 5
      ("u", 94L, "in_fwd"),  // |Δ|=6 > 5 backward side absent → forward 6 > 5
      ("u", 106L, "out")),   // |Δ|=6 > 5
      right, tol = 5L)
    assert(got == Map("in" -> Some(5.0), "in_fwd" -> None, "out" -> None))
  }

  test("asOfNearest with no reference rows for a key yields null") {
    val got = nearest(
      Seq(("lonely", 1L, "x")), Seq(("other", 1L, 9.0)), tol = 10L)
    assert(got == Map("x" -> None))
  }
}
