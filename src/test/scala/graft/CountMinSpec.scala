package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CountMin

class CountMinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def skewed(n: Int) = {
    import spark.implicits._
    // Zipf-ish: value v appears roughly n/v times
    (1 to n).flatMap(i => Seq.fill(math.max(1, 60 / i))(i.toLong))
      .toDF("v")
  }

  test("estimates never undercount (one-sided CMS guarantee)") {
    val vals = skewed(200)
    val cnt = CountMin.counters(vals, d = 4, w = 64)
    val exact = vals.groupBy("v").agg(count(lit(1)).as("n_exact"))
    val bad = CountMin.estimate(exact.select("v"), cnt, d = 4, w = 64)
      .join(exact, "v")
      .filter(col("n_cms") < col("n_exact"))
    assert(bad.count() == 0L)
  }

  test("no-collision regime is exact") {
    import spark.implicits._
    val vals = (1L to 10L).flatMap(v => Seq.fill(v.toInt)(v)).toDF("v")
    val cnt = CountMin.counters(vals, d = 4, w = 4096)
    val got = CountMin.estimate(vals.distinct(), cnt, d = 4, w = 4096)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1L to 10L).map(v => v -> v).toMap)
  }

  test("counters merge by cell-wise addition (shardable sketch)") {
    import spark.implicits._
    val a = skewed(50)
    val b = skewed(120)
    val whole = CountMin.counters(a.union(b), d = 3, w = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = CountMin.counters(a, d = 3, w = 32)
      .union(CountMin.counters(b, d = 3, w = 32))
      .groupBy("r", "b").agg(sum("c").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(whole == merged)
  }

  test("unseen values estimate zero") {
    import spark.implicits._
    val cnt = CountMin.counters(Seq(1L, 2L, 3L).toDF("v"), d = 4, w = 4096)
    val got = CountMin.estimate(Seq(99999L).toDF("v"), cnt, d = 4, w = 4096)
      .collect().head.getLong(1)
    assert(got == 0L)
  }

  test("counters are partitioning-invariant") {
    val vals = skewed(150)
    val a = CountMin.counters(vals, d = 4, w = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val b = CountMin.counters(vals.repartition(13, col("v")), d = 4, w = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(a == b)
  }
}
