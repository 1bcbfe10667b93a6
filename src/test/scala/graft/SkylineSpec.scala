package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skyline

class SkylineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def frontier(pts: Seq[(Double, Double)], bits: Int = 12) = {
    import spark.implicits._
    Skyline.skyline2d(pts.toDF("x", "y"), "x", "y", shardBits = bits)
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
  }

  /** Brute-force dominance definition — the textbook check. */
  private def brute(pts: Seq[(Double, Double)]): Set[(Double, Double)] = {
    val d = pts.distinct
    d.filter { case (px, py) =>
      !d.exists { case (qx, qy) =>
        qx <= px && qy <= py && (qx < px || qy < py)
      }
    }.toSet
  }

  test("hand case: staircase frontier with interior points dropped") {
    val pts = Seq((1.0, 9.0), (2.0, 5.0), (3.0, 7.0), (4.0, 4.0),
      (5.0, 5.0), (2.5, 5.0), (6.0, 1.0))
    assert(frontier(pts) == Set((1.0, 9.0), (2.0, 5.0), (4.0, 4.0), (6.0, 1.0)))
    assert(frontier(pts) == brute(pts))
  }

  test("matches the brute NOT-EXISTS definition on random points") {
    val pts = (0 until 500).map(i =>
      (((i * 131) % 97).toDouble, ((i * 31) % 89).toDouble))
    assert(frontier(pts) == brute(pts))
  }

  test("frontier ties are dominated (strict inequality)") {
    // (2, 5) dominates (3, 5): same y, larger x
    val pts = Seq((2.0, 5.0), (3.0, 5.0), (1.0, 8.0))
    assert(frontier(pts) == Set((1.0, 8.0), (2.0, 5.0)))
  }

  test("duplicates collapse; a single point is its own frontier") {
    val pts = Seq((4.0, 4.0), (4.0, 4.0))
    assert(frontier(pts) == Set((4.0, 4.0)))
  }

  test("sharded prefix-min is bit-equal across shardBits 1 / 4 / 12") {
    val pts = (0 until 800).map(i =>
      ((i % 211).toDouble + 0.5 * (i % 3), ((i * 17) % 173).toDouble))
    val rs = Seq(1, 4, 12).map(b => frontier(pts, b))
    assert(rs.distinct.size == 1)
    assert(rs.head == brute(pts))
  }
}
