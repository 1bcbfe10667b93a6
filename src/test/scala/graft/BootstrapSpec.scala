package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bootstrap

class BootstrapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def sample() = {
    import spark.implicits._
    (1 to 100).map(i => (if (i <= 60) "a" else "b", i, i * 1.5)).toDF("g", "i", "v")
  }

  test("exactResample preserves group sizes in every replica") {
    val r = Bootstrap.exactResample(sample(), Seq("g"), Seq(col("i")), replicas = 3, seed = 1L)
    val sizes = r.groupBy("replica", "g").count()
      .collect().map(x => (x.getInt(0), x.getString(1), x.getLong(2))).toSet
    val want = (0 to 2).flatMap(rep => Seq((rep, "a", 60L), (rep, "b", 40L))).toSet
    assert(sizes == want)
  }

  test("exactResample is seed-deterministic and seed-sensitive") {
    def run(seed: Long) =
      Bootstrap.exactResample(sample(), Seq("g"), Seq(col("i")), 2, seed)
        .groupBy("replica", "g").agg(sum("i").as("s"))
        .collect().map(x => (x.getInt(0), x.getString(1), x.getLong(2))).toSet
    assert(run(5L) == run(5L))
    assert(run(5L) != run(6L))
  }

  test("poissonResample total draw count is ~ n*replicas") {
    val n = Bootstrap.poissonResample(sample(), Seq(col("g"), col("i")), replicas = 50, seed = 2L).count()
    // 100 rows * 50 replicas = 5000 expected, sd = sqrt(5000) ~ 71
    assert(math.abs(n - 5000L) < 400, s"got $n")
  }

  test("poissonResample is deterministic") {
    def run() = Bootstrap.poissonResample(sample(), Seq(col("i")), 4, 9L)
      .groupBy("replica").count().collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(run() == run())
  }

  test("poissonWeights weighted mean is BIT-identical to the exploded davg") {
    // pins the r15 optimization: a10_bootstrap_err's weighted aggregate
    // must equal the physical-duplication form it replaced, bit for bit
    import graft.functions.DetAgg
    val hash = Seq(col("g"), col("i"), col("v"))
    val exploded = Bootstrap.poissonResample(sample(), hash, replicas = 6, seed = 7L)
      .groupBy("replica", "g").agg(DetAgg.davg(col("v")).as("m"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSet
    val weighted = Bootstrap.poissonWeights(sample(), hash, replicas = 6, seed = 7L)
      .groupBy("replica", "g").agg(DetAgg.davgW(col("v"), col("__m")).as("m"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSet
    assert(exploded == weighted)
    // and null values stay excluded from the weighted denominator
    val withNull = sample().withColumn("v",
      when(col("i") % 7 === 0, lit(null).cast("double")).otherwise(col("v")))
    val e2 = Bootstrap.poissonResample(withNull, Seq(col("i")), 3, 11L)
      .groupBy("replica").agg(DetAgg.davg(col("v")).as("m"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSet
    val w2 = Bootstrap.poissonWeights(withNull, Seq(col("i")), 3, 11L)
      .groupBy("replica").agg(DetAgg.davgW(col("v"), col("__m")).as("m"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSet
    assert(e2 == w2)
  }
}
