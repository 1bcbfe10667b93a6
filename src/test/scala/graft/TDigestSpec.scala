package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TDigest

class TDigestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def rankError(data: Array[Double], est: Double, q: Double): Double = {
    val below = data.count(_ <= est).toDouble / data.length
    math.abs(below - q)
  }

  test("quantile estimates land within 1% rank error, tails tighter") {
    import spark.implicits._
    // deterministic skewed data (exp-shaped via hash-uniform)
    val n = 200000
    val data = (0 until n).map { i =>
      val u = ((i * 2654435761L) % 1000003L).toDouble / 1000003.0
      -math.log(1.0 - 0.999998 * u)
    }.toArray
    val df = data.toSeq.toDF("x").repartition(32) // force many partial sketches
    val qs = Seq(0.01, 0.25, 0.5, 0.75, 0.99)
    val est = df.agg(TDigest.quantilesAgg(col("x"), qs).as("q"))
      .collect().head.getSeq[Double](0)
    qs.zip(est).foreach { case (q, e) =>
      val err = rankError(data, e, q)
      assert(err < 0.01, s"q=$q est=$e rankErr=$err")
    }
    // tail quantiles: rank error under 0.2% (the t-digest selling point)
    Seq(0 -> 0.01, 4 -> 0.99).foreach { case (i, q) =>
      val err = rankError(data, est(i), q)
      assert(err < 0.002, s"tail q=$q est=${est(i)} rankErr=$err")
    }
  }

  test("sketch merge is partition-independent (1 vs 32 partitions agree)") {
    import spark.implicits._
    val data = (0 until 50000).map(i => (i * 7919 % 104729).toDouble)
    val one = data.toDF("x").coalesce(1)
      .agg(TDigest.quantilesAgg(col("x"), Seq(0.5)).as("q"))
      .collect().head.getSeq[Double](0).head
    val many = data.toDF("x").repartition(32)
      .agg(TDigest.quantilesAgg(col("x"), Seq(0.5)).as("q"))
      .collect().head.getSeq[Double](0).head
    val trueMed = 104729 / 2.0
    assert(math.abs(one - trueMed) / trueMed < 0.01)
    assert(math.abs(many - trueMed) / trueMed < 0.01)
  }

  test("grouped digests: per-group quantiles with empty/NaN handling") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", Double.NaN), ("b", 10.0))
      .toDF("g", "x")
    val got = df.groupBy("g")
      .agg(TDigest.quantilesAgg(col("x"), Seq(0.5)).as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).head).toMap
    assert(math.abs(got("a") - 2.0) < 1e-9)
    assert(got("b") == 10.0) // NaN dropped, single value
  }
}
