package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Anomaly, Sampling}

class PpsCusumSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("pps: hit counts sum to exactly k, always") {
    import spark.implicits._
    val docs = (1L to 337L).map(i => (i, 1L + (i * 7) % 23)).toDF("id", "w")
    for (k <- Seq(1, 10, 100)) {
      val total = Sampling.ppsSystematic(docs, "id", col("w"), k)
        .agg(sum("n_hits")).collect().head.getLong(0)
      assert(total == k.toLong, s"k=$k got $total")
    }
  }

  test("pps: uniform weights select an even systematic grid, one hit each") {
    import spark.implicits._
    val docs = (1L to 100L).map(i => (i, 5L)).toDF("id", "w")
    val sel = Sampling.ppsSystematic(docs, "id", col("w"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sel.values.forall(_ == 1L))
    // positions j·W/k = j·50 land at the end of every 10th row
    assert(sel.keySet == (10L to 100L by 10L).toSet, s"$sel")
  }

  test("pps: a row heavier than the stride is hit multiple times") {
    import spark.implicits._
    // total W = 1000, k = 10 → stride 100; row 2 holds 500 of it
    val docs = Seq((1L, 100L), (2L, 500L), (3L, 400L)).toDF("id", "w")
    val sel = Sampling.ppsSystematic(docs, "id", col("w"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sel(2L) == 5L, s"$sel")
    assert(sel(1L) == 1L && sel(3L) == 4L)
  }

  test("pps: zero-weight rows are never selected") {
    import spark.implicits._
    val docs = Seq((1L, 0L), (2L, 10L), (3L, 0L), (4L, 10L)).toDF("id", "w")
    val ids = Sampling.ppsSystematic(docs, "id", col("w"), k = 4)
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(2L, 4L))
  }

  test("pps: partitioning-invariant") {
    import spark.implicits._
    val docs = (1L to 500L).map(i => (i, 1L + (i * 13) % 37)).toDF("id", "w")
    val a = Sampling.ppsSystematic(docs, "id", col("w"), k = 50)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val b = Sampling.ppsSystematic(docs.repartition(11, col("id")), "id", col("w"), k = 50)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(a == b)
  }

  test("cusum: hand computation with a level shift") {
    import spark.implicits._
    // x = (5,5,5,15,15), target = 45 div 5 = 9, d = (−4,−4,−4,6,6)
    // P = (−4,−8,−12,−6,0), lo = (−4,−8,−12,−12,−12) → S = (0,0,0,6,12)
    val b = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 15L), (5L, 15L)).toDF("t", "x")
    val got = Anomaly.cusum(b, "t", "x")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 6L, 5L -> 12L), s"$got")
  }

  test("cusum: a flat series never leaves zero") {
    import spark.implicits._
    val b = (1L to 50L).map((_, 7L)).toDF("t", "x")
    val mx = Anomaly.cusum(b, "t", "x")
      .agg(max("cusum")).collect().head.getLong(0)
    assert(mx == 0L)
  }

  test("cusum: prefix-minus-running-min equals the textbook clamp recursion") {
    import spark.implicits._
    val xs = (1 to 120).map(i =>
      (i.toLong, (7 + (i * 13) % 11 + (if (i % 29 == 0) 40 else 0)).toLong))
    val target = xs.map(_._2).sum / xs.length // integer division, as the operator
    var s = 0L
    val want = xs.map { case (t, x) =>
      s = math.max(0L, s + (x - target)); t -> s
    }.toMap
    val got = Anomaly.cusum(xs.toDF("t", "x"), "t", "x")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == want)
  }
}
