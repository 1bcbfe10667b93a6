package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Stats

class MannWhitneySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def mw(a: Seq[Double], b: Seq[Double], bits: Int = 12) = {
    import spark.implicits._
    val df = (a.map((_, "a")) ++ b.map((_, "b"))).toDF("v", "g")
    Stats.mannWhitneyU(df, "v", col("g") === "a", shardBits = bits)
      .collect().head
  }

  test("hand computation with ties: A=[1,2,3] vs B=[2,3,4]") {
    // ranks: 1→1, ties 2,2→2.5, ties 3,3→4.5, 4→6; R_A = 8, U_A = 2
    val r = mw(Seq(1, 2, 3), Seq(2, 3, 4))
    assert(r.getAs[Long]("n1") == 3L && r.getAs[Long]("n2") == 3L)
    assert(r.getAs[Double]("u") == 2.0)
  }

  test("identical samples give U = n1*n2/2 and z = 0") {
    val x = Seq(1.0, 2.0, 3.0, 4.0, 5.0)
    val r = mw(x, x)
    assert(r.getAs[Double]("u") == 12.5)
    assert(r.getAs[Double]("z") == 0.0)
  }

  test("swapping the samples reflects U and negates z") {
    val a = Seq(1.0, 3.0, 5.0, 7.0, 7.0, 9.0)
    val b = Seq(2.0, 4.0, 4.0, 6.0, 8.0)
    val r1 = mw(a, b)
    import spark.implicits._
    val df = (a.map((_, "a")) ++ b.map((_, "b"))).toDF("v", "g")
    val r2 = Stats.mannWhitneyU(df, "v", col("g") === "b").collect().head
    assert(r1.getAs[Double]("u") + r2.getAs[Double]("u") ==
      r1.getAs[Long]("n1").toDouble * r1.getAs[Long]("n2"))
    assert(r1.getAs[Double]("z") == -r2.getAs[Double]("z"))
  }

  test("sharded ranks are bit-equal across shardBits 1 / 4 / 12") {
    val a = (1 to 400).map(i => (i % 37).toDouble)
    val b = (1 to 300).map(i => ((i * 3) % 41).toDouble + 0.5)
    val rs = Seq(1, 4, 12).map(bits => mw(a, b, bits))
    assert(rs.map(_.getAs[Double]("u")).distinct.size == 1)
    assert(rs.map(_.getAs[Double]("z")).distinct.size == 1)
  }

  test("a clearly shifted sample yields a large |z|") {
    val a = (1 to 200).map(_.toDouble)
    val b = (1 to 200).map(_.toDouble + 150.0)
    val z = mw(a, b).getAs[Double]("z")
    assert(z < -8.0, s"z $z")
  }

  private def rho(pairs: Seq[(Double, Double)], bits: Int = 12): Double = {
    import spark.implicits._
    Stats.spearman(pairs.toDF("x", "y"), "x", "y", shardBits = bits)
      .collect().head.getAs[Double]("rho")
  }

  test("spearman: any monotone relation scores exactly ±1") {
    // sqrt(D·D) can sit an ulp off D once D² passes 2^53, so ±1 exact
    // is not guaranteed by IEEE — assert to 1e-12
    val xs = (1 to 100).map(_.toDouble)
    assert(math.abs(rho(xs.map(x => (x, x * x))) - 1.0) < 1e-12)
    assert(math.abs(rho(xs.map(x => (x, -math.exp(x / 20)))) + 1.0) < 1e-12)
  }

  test("spearman: matches the textbook tie-averaged hand computation") {
    // x = (1,2,3,4), y = (10,10,20,30): y-ranks (1.5, 1.5, 3, 4)
    // d = (−0.5, 0.5, 0, 0) but ties ⇒ use Pearson-on-ranks form:
    // r_x=(1,2,3,4), r_y=(1.5,1.5,3,4) → ρ = 0.9486832980505138
    val got = rho(Seq((1.0, 10.0), (2.0, 10.0), (3.0, 20.0), (4.0, 30.0)))
    assert(math.abs(got - 0.9486832980505138) < 1e-15, s"rho $got")
  }

  test("spearman: sharded ranks bit-equal across shardBits 1 / 4 / 12") {
    val pairs = (1 to 500).map(i =>
      ((i % 37).toDouble, ((i * 13) % 41 + (i % 3) * 0.25)))
    val rs = Seq(1, 4, 12).map(b => rho(pairs, b))
    assert(rs.distinct.size == 1, s"$rs")
  }

  test("spearman: second moments past Long.MaxValue (the sf1 overflow pin)") {
    // Σ(ax²) is Θ(n³): with 2.3M distinct doubled ranks it reaches
    // ~1.5e19 > Long.MaxValue — the exact failure the r15 sf1 drive hit
    // (ANSI long-sum overflow at 6M lineitem). The decimal(38,0) second
    // moments must survive and still score a perfect monotone relation.
    import org.apache.spark.sql.functions.col
    val n = 2300000L
    val df = spark.range(n).select(
      col("id").cast("double").as("x"), col("id").cast("double").as("y"))
    val r = Stats.spearman(df, "x", "y").collect().head
    assert(r.getAs[Long]("n") == n)
    assert(math.abs(r.getAs[Double]("rho") - 1.0) < 1e-12,
      s"rho ${r.getAs[Double]("rho")}")
  }
}
