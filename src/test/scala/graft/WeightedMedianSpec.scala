package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Stats

class WeightedMedianSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def wmed(rows: Seq[(String, Double, Long)], bits: Int = 12) = {
    import spark.implicits._
    Stats.weightedMedian(rows.toDF("g", "v", "w"), "g", "v", col("w"), bits)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("hand case: weight mass decides, not value count") {
    // group a: values 1..4, weight 10 on value 4 → half of 13 is 6.5,
    // cum reaches ≥ 6.5 only at v=4
    val rows = Seq(("a", 1.0, 1L), ("a", 2.0, 1L), ("a", 3.0, 1L), ("a", 4.0, 10L),
      ("b", 5.0, 2L), ("b", 7.0, 2L))
    val got = wmed(rows)
    assert(got("a") == 4.0)
    assert(got("b") == 5.0) // 2·cum(5)=4 ≥ 4 = W: type-1 takes the lower value
  }

  test("uniform weights reduce to the type-1 plain median") {
    val rows = (1 to 101).map(i => ("g", i.toDouble, 1L))
    assert(wmed(rows) == Map("g" -> 51.0))
  }

  test("duplicated values merge their weights") {
    val rows = Seq(("g", 1.0, 3L), ("g", 1.0, 3L), ("g", 9.0, 5L))
    // merged: w(1)=6, w(9)=5, W=11 → 2·6 ≥ 11 at v=1
    assert(wmed(rows) == Map("g" -> 1.0))
  }

  test("quartile grid: q=0.5 equals the weighted median; grid is monotone") {
    import spark.implicits._
    val rows = (0 until 600).map(i =>
      (s"g${i % 3}", ((i * 37) % 101).toDouble, 1L + (i * 11) % 7))
    val med = wmed(rows)
    val q = Stats.weightedQuartiles(rows.toDF("g", "v", "w"), "g", "v", col("w"))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    med.foreach { case (g, m) => assert(q((g, 0.5)) == m, s"group $g") }
    Seq("g0", "g1", "g2").foreach { g =>
      assert(q((g, 0.25)) <= q((g, 0.5)) && q((g, 0.5)) <= q((g, 0.75)), s"$g")
    }
  }

  test("sharded cumulative bit-equal across shardBits 1 / 4 / 12 and partitionings") {
    import spark.implicits._
    val rows = (0 until 1000).map(i =>
      (s"g${i % 5}", ((i * 131) % 257).toDouble + 0.25 * (i % 4), 1L + (i * 7) % 13))
    val rs = Seq(1, 4, 12).map(b => wmed(rows, b))
    assert(rs.distinct.size == 1)
    val shuffled = Stats.weightedMedian(
        rows.toDF("g", "v", "w").repartition(17, col("v")), "g", "v", col("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(shuffled == rs.head)
  }
}
