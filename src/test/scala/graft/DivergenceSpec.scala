package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Stats

class DivergenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def jsd(a: Seq[Double], b: Seq[Double]) = {
    import spark.implicits._
    val df = (a.map((_, "a")) ++ b.map((_, "b"))).toDF("v", "g")
    Stats.jsd(df, "v", col("g") === "a").collect().head.getDouble(0)
  }

  test("identical slices diverge by exactly zero") {
    val x = (1 to 100).map(_.toDouble)
    assert(jsd(x, x) == 0.0)
  }

  test("disjoint slices saturate at ln 2") {
    // slices occupy disjoint bucket ranges → every term is p·ln(2)
    val a = (1 to 100).map(_.toDouble)          // buckets low
    val b = (1 to 100).map(_.toDouble + 5000.0) // buckets high
    assert(math.abs(jsd(a, b) - math.log(2.0)) < 1e-6)
  }

  test("JSD is symmetric") {
    import spark.implicits._
    val a = (1 to 300).map(i => (i % 17).toDouble)
    val b = (1 to 200).map(i => ((i * 3) % 23).toDouble)
    val df = (a.map((_, "a")) ++ b.map((_, "b"))).toDF("v", "g")
    val x = Stats.jsd(df, "v", col("g") === "a").collect().head.getDouble(0)
    val y = Stats.jsd(df, "v", col("g") === "b").collect().head.getDouble(0)
    assert(x == y)
  }

  test("a one-sided empty bucket stays finite (no eps floor needed)") {
    val a = Seq(1.0, 2.0, 3.0, 100.0)
    val b = Seq(1.0, 2.0, 3.0) // nothing near 100 → bucket empty on b's side
    val d = jsd(a, b)
    assert(d > 0.0 && d < math.log(2.0) + 1e-9, s"jsd $d")
  }
}
