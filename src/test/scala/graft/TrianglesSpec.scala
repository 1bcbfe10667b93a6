package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Triangles

class TrianglesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def stats(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
    import spark.implicits._
    val r = Triangles.triangleStats(edges.toDF("u", "v")).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("known shapes: K4, C5, shared-edge pair, star") {
    // K4: 4 triangles
    assert(stats(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
      == ((4L, 6L, 4L)))
    // 5-cycle: none
    assert(stats(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L)))
      == ((5L, 5L, 0L)))
    // two triangles sharing edge (1,2)
    assert(stats(Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L)))
      == ((4L, 5L, 2L)))
    // star: hub with 6 spokes, no closure
    assert(stats((2L to 7L).map(i => (1L, i))) == ((7L, 6L, 0L)))
  }

  test("input normalization: duplicates, reversals, self-loops") {
    val messy = Seq(
      (1L, 2L), (2L, 1L), (1L, 2L), // same edge three ways
      (2L, 3L), (3L, 1L),
      (4L, 4L)) // self-loop dropped — node 4 vanishes (degree 0)
    assert(stats(messy) == ((3L, 3L, 1L)))
  }

  test("a skew hub doesn't inflate the wedge set: triangles stay exact") {
    // hub 0 linked to 50 spokes; spokes form a single chain — triangles
    // are exactly the 49 (hub, i, i+1) wedges closed by chain edges
    val hub = (1L to 50L).map(i => (0L, i))
    val chain = (1L until 50L).map(i => (i, i + 1))
    assert(stats(hub ++ chain) == ((51L, 99L, 49L)))
  }
}
