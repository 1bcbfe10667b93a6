package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KCore

class KCoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def clique(ids: Seq[Long]): Seq[(Long, Long)] =
    for (a <- ids; b <- ids if a < b) yield (a, b)

  test("clique with pendant tail: 3-core is exactly the clique") {
    import spark.implicits._
    // K5 on 1..5, tail 5-6-7: 6 and 7 peel (degree ≤ 2), K5 survives k=3
    val edges = (clique(1L to 5L) ++ Seq((5L, 6L), (6L, 7L))).toDF("u", "v")
    val surv = KCore.core(edges, k = 3, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(surv == clique(1L to 5L).toSet)
  }

  test("peeling cascades: chain fully dissolves at k=2") {
    import spark.implicits._
    // path 1-2-3-4-5: endpoints peel first, then the cascade eats it all —
    // but only with enough rounds (one node pair per round)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("u", "v")
    val after1 = KCore.core(edges, k = 2, rounds = 1).count()
    assert(after1 == 2L, "one round peels only the endpoints' edges")
    val after3 = KCore.core(edges, k = 2, rounds = 3).count()
    assert(after3 == 0L, "cascade completes")
  }

  test("cycle is its own 2-core (stable fixed point)") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("u", "v")
    val s = KCore.stats(KCore.core(edges, k = 2, rounds = 5)).collect().head
    assert((s.getLong(0), s.getLong(1)) == ((4L, 4L)))
  }

  test("survivors are partitioning-invariant") {
    import spark.implicits._
    val edges = (0 until 400)
      .map(i => ((i % 70).toLong, ((i * 13 + 5) % 70).toLong))
      .collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("u", "v")
    val a = KCore.core(edges, k = 3, rounds = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = KCore.core(edges.repartition(11, col("u")), k = 3, rounds = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }
}
