package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Stats

/** Wave-15: Kendall τ-b on the joint distinct relation. The other wave
  * members (Cramér's V, Brown–Forsythe, assortativity, seasonal
  * decomposition, IVF recall) compose already-spec'd kernels and are
  * verified end-to-end by their hash-exact oracles.
  */
class WaveFifteenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("kendallTau: perfect concordance is 1, perfect reversal is -1") {
    import spark.implicits._
    val up = (1 to 20).map(i => (i.toDouble, i * 2.0)).toDF("x", "y")
    assert(Stats.kendallTau(up, "x", "y").collect().head.getDouble(3) == 1.0)
    val down = (1 to 20).map(i => (i.toDouble, -i * 2.0)).toDF("x", "y")
    assert(Stats.kendallTau(down, "x", "y").collect().head.getDouble(3) == -1.0)
  }

  test("kendallTau: hand-computed tie case") {
    import spark.implicits._
    // pairs: (1,1),(1,2),(2,1),(2,2) one each.
    // C: {(1,1),(2,2)} concordant = 1; D: {(1,2),(2,1)} = 1; rest tied.
    // conc = disc = 1 → tau = 0
    val df = Seq((1.0, 1.0), (1.0, 2.0), (2.0, 1.0), (2.0, 2.0)).toDF("x", "y")
    val r = Stats.kendallTau(df, "x", "y").collect().head
    assert(r.getLong(0) == 4L)
    assert(r.getLong(1) == 1L && r.getLong(2) == 1L)
    assert(r.getDouble(3) == 0.0)
    // hand-enumerated: x=[1,1,2,2,3], y=[1,2,1,3,3] → C=5, D=1,
    // n1·2=4, n2·2=4 → τb = 4 / (√8·√8) = 0.5
    val df2 = Seq((1.0, 1.0), (1.0, 2.0), (2.0, 1.0), (2.0, 3.0), (3.0, 3.0))
      .toDF("x", "y")
    val r2 = Stats.kendallTau(df2, "x", "y").collect().head
    assert(r2.getLong(1) == 5L && r2.getLong(2) == 1L)
    // the fixed √a·√b tree (not √(a·b)) gives 4/8.000000000000002
    assert(math.abs(r2.getDouble(3) - 0.5) < 1e-15, r2.getDouble(3).toString)
  }

  test("kendallTau: multiplicity-weighted — duplicated rows change nothing") {
    import spark.implicits._
    val base = Seq((1.0, 2.0), (2.0, 1.0), (3.0, 3.0), (2.0, 2.0))
    val once = Stats.kendallTau(base.toDF("x", "y"), "x", "y")
      .collect().head.getDouble(3)
    // τ of tripled data differs (n changes) but must equal the direct
    // computation on the tripled rows, regardless of partitioning
    val tripled = (base ++ base ++ base).toDF("x", "y")
    val a = Stats.kendallTau(tripled.repartition(1), "x", "y").collect().head
    val b = Stats.kendallTau(tripled.repartition(7), "x", "y").collect().head
    assert(a == b)
    assert(!once.isNaN && !a.getDouble(3).isNaN)
  }
}
