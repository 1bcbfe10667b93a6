package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PageRank

class PageRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("star graph: the hub out-ranks every spoke") {
    import spark.implicits._
    // 10 spokes all linking to node 0; 0 links back to spoke 1. The
    // 0↔1 two-cycle oscillates with amplitude 0.85^k, so ranking
    // assertions need the converged regime — 40 iterations (~0.001)
    val edges = ((1L to 10L).map(i => (i, 0L)) :+ ((0L, 1L))).toDF("src", "dst")
    val r = PageRank.fixedPoint(edges, iters = 40)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(0L) > r(1L), s"hub ${r(0L)} vs back-linked spoke ${r(1L)}")
    assert((2L to 10L).forall(i => r(1L) > r(i)),
      "the spoke the hub links back to out-ranks the others")
    assert((2L to 10L).map(r).distinct.size == 1, "symmetric spokes tie exactly")
  }

  test("mass is conserved up to deterministic floor leak") {
    import spark.implicits._
    val edges = ((1L to 10L).map(i => (i, 0L)) :+ ((0L, 1L))).toDF("src", "dst")
    val total = PageRank.fixedPoint(edges, iters = 10)
      .agg(sum("rank")).collect().head.getLong(0)
    // each of the 11 nodes can lose < 100 units per iteration to the
    // three integer divisions; 10 iterations
    assert(total <= PageRank.Scale)
    assert(PageRank.Scale - total < 11L * 100L * 10L,
      s"leak ${PageRank.Scale - total}")
  }

  test("two-node hand computation is reproduced exactly") {
    import spark.implicits._
    // 1 -> 2 only: node 1 never receives link mass, node 2 receives all
    // of 1's; replay the exact integer recurrence in Scala
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val scale = PageRank.Scale
    var r1 = scale / 2; var r2 = scale / 2
    for (_ <- 1 to 5) {
      val dang = r2 // node 2 has no out-edges
      val base = (15 * scale / 100) / 2
      val n1 = base + 85 * (0L + dang / 2) / 100
      val n2 = base + 85 * (r1 / 1 + dang / 2) / 100
      r1 = n1; r2 = n2
    }
    val got = PageRank.fixedPoint(edges, iters = 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(got == Map(1L -> r1, 2L -> r2), s"got $got expected ($r1, $r2)")
  }

  test("personalized: mass cannot reach a disconnected component") {
    import spark.implicits._
    // component A: 1→2→1; component B: 10→11→10. Seed = {1}.
    val edges = Seq((1L, 2L), (2L, 1L), (10L, 11L), (11L, 10L)).toDF("src", "dst")
    val seeds = Seq(1L).map(Tuple1(_)).toDF("node")
    val r = PageRank.personalized(edges, seeds, iters = 8)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(10L) == 0L && r(11L) == 0L, s"leak into B: $r")
    assert(r(1L) > 0L && r(2L) > 0L)
    assert(r(1L) > r(2L), "the restart keeps the seed ahead of its neighbor")
  }

  test("personalized: uniform over seeds, zero elsewhere at iteration start") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val seeds = Seq(1L, 2L).map(Tuple1(_)).toDF("node")
    // after any number of rounds total mass stays ≤ Scale (floor leak only)
    val total = PageRank.personalized(edges, seeds, iters = 5)
      .agg(sum("rank")).collect().head.getLong(0)
    assert(total <= PageRank.Scale && PageRank.Scale - total < 3L * 100L * 5L)
  }

  test("personalized ranks are partitioning-invariant") {
    import spark.implicits._
    val edges = (0 until 200)
      .map(i => ((i % 40).toLong, ((i * 7) % 40).toLong))
      .filter { case (a, b) => a != b }
      .toDF("src", "dst").distinct()
    val seeds = Seq(3L, 17L).map(Tuple1(_)).toDF("node")
    val a = PageRank.personalized(edges, seeds, iters = 6)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val b = PageRank.personalized(edges.repartition(13, col("src")), seeds, iters = 6)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(a == b)
  }

  test("ranks are partitioning-invariant (pure integer arithmetic)") {
    import spark.implicits._
    val edges = (0 until 200)
      .map(i => ((i % 40).toLong, ((i * 7) % 40).toLong))
      .filter { case (a, b) => a != b }
      .toDF("src", "dst").distinct()
    val a = PageRank.fixedPoint(edges, iters = 6)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val b = PageRank.fixedPoint(edges.repartition(17, col("dst")), iters = 6)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(a == b)
  }
}
