package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Hll

class HllSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("rho ladder matches leading-zero rank over the 24-bit window") {
    import spark.implicits._
    val cases = Seq(
      0L -> 25, 1L -> 24, 2L -> 23, 3L -> 23,
      (1L << 23) -> 1, ((1L << 23) - 1) -> 2, ((1L << 24) - 1) -> 1)
    val got = cases.map(_._1).toDF("w")
      .select(col("w"), Hll.rho(col("w")).as("rho"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    cases.foreach { case (w, want) => assert(got(w) == want, s"w=$w") }
  }

  test("estimate is within ~3 sigma of exact for 10k distinct values") {
    import spark.implicits._
    val n = 10000
    // duplicates included: HLL must be insensitive to multiplicity
    val vals = ((1L to n.toLong) ++ (1L to 2000L)).toDF("v")
    val est = Hll.estimate(Hll.registers(vals)).collect().head.getDouble(0)
    val relErr = math.abs(est - n) / n
    assert(relErr < 0.20, s"est $est vs $n (relErr $relErr)") // 3σ ≈ 0.195 at m=256
  }

  test("small range takes the linear-counting branch and stays accurate") {
    import spark.implicits._
    val vals = (1L to 50L).toDF("v")
    val est = Hll.estimate(Hll.registers(vals)).collect().head.getDouble(0)
    assert(math.abs(est - 50.0) / 50.0 < 0.25, s"est $est")
  }

  test("sketches merge by cell-wise MAX") {
    import spark.implicits._
    val a = (1L to 3000L).toDF("v")
    val b = (2000L to 6000L).toDF("v")
    val whole = Hll.registers(a.union(b))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val merged = Hll.registers(a).union(Hll.registers(b))
      .groupBy("bucket").agg(max("reg").as("reg"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(whole == merged)
  }

  test("registers are partitioning-invariant") {
    import spark.implicits._
    val vals = (1L to 5000L).toDF("v")
    val x = Hll.registers(vals)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val y = Hll.registers(vals.repartition(13, col("v")))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(x == y)
  }
}
