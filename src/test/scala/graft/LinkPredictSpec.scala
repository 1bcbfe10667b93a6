package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LinkPredict

class LinkPredictSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("path a-w-b predicts (a,b) with score 1/ln(2)") {
    import spark.implicits._
    // 1-2-3 path plus a spectator edge (4,5): only (1,3) shares a
    // neighbor; center 2 has degree 2
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("u", "v")
    val got = LinkPredict.adamicAdar(edges).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1L, 3L, 1L)))
    val expected = BigDecimal(1.0 / math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(3) == expected, s"got ${r.getDouble(3)}")
  }

  test("existing edges are never predicted") {
    import spark.implicits._
    // triangle: every pair shares a neighbor but all pairs are edges
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("u", "v")
    assert(LinkPredict.adamicAdar(edges).count() == 0L)
  }

  test("exact tier: wedge-volume guard fails loudly, capped tier succeeds") {
    import spark.implicits._
    // star hub 10 with 6 spokes: wedge volume Σ deg² = 6² + 6·1 = 42
    val edges = (1L to 6L).map(i => (i, 10L)).toDF("u", "v")
    val e = intercept[Exception] {
      LinkPredict.adamicAdar(edges, k = 20, maxWedgeVolume = 40L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("adamicAdarCapped")), e.getMessage)
    // same graph clears a loose bound
    assert(LinkPredict.adamicAdar(edges, k = 20, maxWedgeVolume = 50L).count() > 0)
  }

  test("capped tier: truncation keeps smallest-id neighbors and rescores") {
    import spark.implicits._
    // hub 10 adjacent to 1..5; cap 3 keeps neighbors {1,2,3}, so only
    // pairs among those survive, scored with the CAPPED degree 3
    val edges = (1L to 5L).map(i => (i, 10L)).toDF("u", "v")
    val got = LinkPredict.adamicAdarCapped(edges, k = 20, maxDeg = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(got.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)), s"$got")
    val expected = BigDecimal(1.0 / math.log(3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.values.forall(_ == expected), s"$got")
  }

  test("capped tier equals exact tier when no node exceeds the cap") {
    import spark.implicits._
    val edges = Seq(
      (1L, 10L), (2L, 10L), (1L, 11L), (2L, 11L),
      (3L, 12L), (4L, 12L), (5L, 10L), (6L, 10L)).toDF("u", "v")
    val exact = LinkPredict.adamicAdar(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val capped = LinkPredict.adamicAdarCapped(edges, maxDeg = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(exact == capped)
  }

  test("more common neighbors outrank fewer; hub neighbors weigh less") {
    import spark.implicits._
    // (1,2) share centers 10 and 11; (3,4) share only 12. Also make 10
    // a hub (degree 4) so its term shrinks but still adds.
    val edges = Seq(
      (1L, 10L), (2L, 10L), (1L, 11L), (2L, 11L),
      (3L, 12L), (4L, 12L), (5L, 10L), (6L, 10L)).toDF("u", "v")
    val got = LinkPredict.adamicAdar(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(got((1L, 2L)) > got((3L, 4L)), s"$got")
  }
}
