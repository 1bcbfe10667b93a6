package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LogReg

class LogRegSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Linearly separable data: y = 1 iff x > 0.5, with a deterministic
    * interleaved grid so there is no sampling noise.
    */
  private def separable = {
    import spark.implicits._
    (0 until 400).map { i =>
      val x = (i % 100) / 100.0
      (1.0, x, if (x > 0.5) 1.0 else 0.0)
    }.toDF("intercept", "x", "y")
  }

  test("GD learns the separating direction and classifies the training set") {
    val coefs = LogReg.train(separable, Seq("intercept", "x"), col("y"),
      iters = 50, lr = 2.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val (b0, b1) = (coefs("intercept"), coefs("x"))
    assert(b1 > 0, s"slope must be positive toward y=1: $b1")
    // decision boundary -b0/b1 sits inside the gap around x = 0.5
    val boundary = -b0 / b1
    assert(boundary > 0.45 && boundary < 0.56, s"boundary $boundary")
    // training accuracy: every grid point on the correct side
    val acc = separable
      .withColumn("p", lit(b0) + lit(b1) * col("x"))
      .filter((col("p") > 0) === (col("y") === 1.0)).count()
    assert(acc >= 390, s"train accuracy $acc/400") // grid rows at the gap edge
  }

  test("coefficients are partitioning-invariant (scale-12 gradient sums)") {
    val base = LogReg.train(separable, Seq("intercept", "x"), col("y"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val shuffled = LogReg.train(separable.repartition(13, col("x")),
      Seq("intercept", "x"), col("y"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(shuffled == base)
  }

  test("one iteration from zero is the closed-form first step") {
    import spark.implicits._
    // at beta = 0, sigma = 0.5 exactly: grad_j = sum((0.5 - y) * x_j),
    // beta_j = -lr * grad_j / n — checkable by hand
    val df = Seq(
      (1.0, 2.0, 1.0), (1.0, 4.0, 1.0), (1.0, 1.0, 0.0), (1.0, 3.0, 0.0))
      .toDF("intercept", "x", "y")
    val coefs = LogReg.train(df, Seq("intercept", "x"), col("y"),
      iters = 1, lr = 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // grad_int = (0.5-1)+(0.5-1)+(0.5-0)+(0.5-0) = 0 → b0 = 0
    // grad_x = -0.5*2 -0.5*4 +0.5*1 +0.5*3 = -1 → b1 = 0.5*1/4 = 0.125
    assert(coefs("intercept") == 0.0)
    assert(coefs("x") == 0.125)
  }
}
