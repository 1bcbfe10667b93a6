package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Anomaly

class AnomalySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("a planted spike flags; the robust baseline ignores it") {
    import spark.implicits._
    // steady series 98..102 with one 500-spike: mean/std would be pulled
    // ~4 up / blown ~40x wide by the spike; median/MAD are not
    val rows = (0 until 50).map(b => ("clicks", b.toLong, 98L + (b % 5))) :+
      (("clicks", 50L, 500L))
    val out = Anomaly.robustFlags(rows.toDF("k", "bucket", "n"), Seq("k"), "n")
      .collect().map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("med"), r.getAs[Long]("mad"), r.getAs[Boolean]("is_anomaly")))
      .toMap
    val (med, mad, _) = out(0L)
    assert(med == 100L && mad == 1L, s"baseline med=$med mad=$mad")
    assert(out(50L)._3, "spike must flag")
    assert(out.filter(_._1 != 50L).values.forall(!_._3), "steady points must not flag")
  }

  test("constant series: only true deviations flag when MAD is zero") {
    import spark.implicits._
    val rows = (0 until 20).map(b => ("k", b.toLong, 7L)) :+ (("k", 20L, 8L))
    val out = Anomaly.robustFlags(rows.toDF("k", "bucket", "n"), Seq("k"), "n")
      .collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Boolean]("is_anomaly"))
      .toMap
    assert(out(20L), "any deviation off a zero-MAD baseline flags")
    assert((0 until 20).forall(b => !out(b.toLong)))
  }

  test("keys are independent: one key's outliers don't leak into another") {
    import spark.implicits._
    val rows = (0 until 30).map(b => ("a", b.toLong, 10L)) ++
      (0 until 30).map(b => ("b", b.toLong, 1000L + b % 3))
    val out = Anomaly.robustFlags(rows.toDF("k", "bucket", "n"), Seq("k"), "n")
      .collect()
    assert(out.forall(!_.getAs[Boolean]("is_anomaly")))
  }
}
