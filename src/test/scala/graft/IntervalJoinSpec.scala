package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IntervalJoin

class IntervalJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def run(points: Seq[Long], ivs: Seq[(Long, Long, Long)], w: Long) = {
    import spark.implicits._
    IntervalJoin.pointInInterval(
        points.toDF("t"), ivs.toDF("id", "lo", "hi"), "t", "lo", "hi", w)
      .select("id", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("containment semantics: half-open [lo, hi), bucket edges included") {
    val ivs = Seq((1L, 10L, 30L)) // spans buckets 1, 2 at width 10
    assert(run(Seq(10L, 29L, 30L, 9L, 15L), ivs, 10L) ==
      Set((1L, 10L), (1L, 29L), (1L, 15L)))
  }

  test("no duplicates when an interval spans many buckets") {
    val ivs = Seq((7L, 0L, 1000L)) // 100 buckets at width 10
    val got = run(Seq(500L), ivs, 10L)
    assert(got == Set((7L, 500L)))
  }

  test("matches the naive range join on overlapping random intervals") {
    import spark.implicits._
    val points = (0L until 400L).map(i => (i * 7) % 1000)
    val ivs = (0 until 60).map { i =>
      val lo = (i * 131L) % 900
      (i.toLong, lo, lo + 1 + (i * 17) % 120)
    }
    val bucketed = run(points, ivs, 32L)
    val naive = points.toDF("t").join(ivs.toDF("id", "lo", "hi"),
        col("t") >= col("lo") && col("t") < col("hi"))
      .select("id", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == naive)
  }

  test("result is bucket-width invariant") {
    val points = (0L until 300L).map(i => (i * 13) % 700)
    val ivs = (0 until 40).map(i => (i.toLong, (i * 91L) % 600, (i * 91L) % 600 + 55))
    val a = run(points, ivs, 7L)
    val b = run(points, ivs, 64L)
    val c = run(points, ivs, 1000L) // single bucket: degenerates gracefully
    assert(a == b && b == c)
  }

  test("interval ending exactly on a bucket edge does not claim the next bucket") {
    // [0, 10) at width 10 covers only bucket 0; the point 10 (bucket 1)
    // must not even become a candidate
    assert(run(Seq(10L), Seq((1L, 0L, 10L)), 10L).isEmpty)
  }
}
