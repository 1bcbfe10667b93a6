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
}
