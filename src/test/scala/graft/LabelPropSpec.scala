package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LabelProp

class LabelPropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def clique(ids: Seq[Long]): Seq[(Long, Long)] =
    for (a <- ids; b <- ids if a < b) yield (a, b)

  test("two cliques joined by one bridge resolve to two communities") {
    import spark.implicits._
    val edges = (clique(1L to 5L) ++ clique(11L to 15L) :+ ((5L, 11L)))
      .toDF("u", "v")
    val labels = LabelProp.propagate(edges, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val left = (1L to 5L).map(labels)
    val right = (11L to 15L).map(labels)
    assert(left.distinct.size == 1, s"left clique split: $left")
    assert(right.distinct.size == 1, s"right clique split: $right")
    assert(left.head != right.head, "bridge merged the cliques")
  }

  test("hand computation: synchronous min-tie round on a triangle+tail") {
    import spark.implicits._
    // triangle 1-2-3 with tail 3-4. Round 1 (all labels = own id):
    //   node 1 sees {2,3}   -> min-tie 2
    //   node 2 sees {1,3}   -> 1
    //   node 3 sees {1,2,4} -> 1
    //   node 4 sees {3}     -> 3
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val got = LabelProp.propagate(edges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 3L), s"got $got")
  }

  test("labels are partitioning-invariant (deterministic tie-break)") {
    import spark.implicits._
    val edges = (0 until 300)
      .map(i => ((i % 60).toLong, ((i * 11 + 3) % 60).toLong))
      .collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("u", "v")
    val a = LabelProp.propagate(edges, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = LabelProp.propagate(edges.repartition(17, col("v")), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("every node gets exactly one label") {
    import spark.implicits._
    val edges = (clique(1L to 4L) ++ clique(21L to 24L)).toDF("u", "v")
    val out = LabelProp.propagate(edges, iters = 3)
    assert(out.count() == 8L)
    assert(out.select("node").distinct().count() == 8L)
  }
}
