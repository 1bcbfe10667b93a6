package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Stats
import graft.operators.LabelProp

/** Wave-16: modularity, Theil–Sen, Wilson interval. Cramér's V, lexical
  * diversity, and the diagonal Mahalanobis screen are verified
  * end-to-end by their hash-exact oracles.
  */
class WaveSixteenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("modularity: two disjoint triangles under the perfect partition = 0.5") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L))
      .toDF("u", "v")
    val labels = LabelProp.propagate(edges, iters = 5)
    val r = LabelProp.modularity(edges, labels).collect().head
    assert(r.getLong(0) == 6L)   // m
    assert(r.getLong(1) == 2L)   // two communities found
    // each c: e_c/m = 3/6, (d_c/2m)² = (6/12)² → Q = 2·(0.5 − 0.25) = 0.5
    assert(r.getDouble(2) == 0.5)
  }

  test("modularity: everything in one community scores 0") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v")
    val one = edges.select(col("u").as("node")).union(edges.select(col("v").as("node")))
      .distinct().withColumn("lbl", lit(1L))
    val r = LabelProp.modularity(edges, one).collect().head
    // e_c/m = 1, (d_c/2m)² = 1 → Q = 0
    assert(r.getDouble(2) == 0.0)
  }

  test("theilSen: exact line recovers the slope, outlier cannot move it") {
    import spark.implicits._
    val line = (1 to 10).map(i => (i.toDouble, 3.0 * i + 1)).toDF("x", "y")
    val s1 = Stats.theilSen(line, "x", "y").collect().head
    assert(s1.getDouble(1) == 3.0)
    // one wild outlier: most pairwise slopes still 3 → median stays 3
    val poisoned = ((1 to 10).map(i => (i.toDouble, 3.0 * i + 1)) :+ ((11.0, 1e6)))
      .toDF("x", "y")
    val s2 = Stats.theilSen(poisoned, "x", "y").collect().head
    assert(s2.getDouble(1) == 3.0)
  }

  test("theilSen: multiplicity-weighted and partitioning-invariant") {
    import spark.implicits._
    val rows = (1L to 300L).map(i => ((i % 7).toDouble, ((i * i) % 11).toDouble))
    val a = Stats.theilSen(rows.toDF("x", "y").repartition(1), "x", "y").collect().head
    val b = Stats.theilSen(rows.toDF("x", "y").repartition(13), "x", "y").collect().head
    assert(a == b)
  }

  test("wilson interval: textbook value at p-hat 0.5, n 100") {
    // the exact formula text the query uses, evaluated in Scala
    val n = 100.0; val k = 50.0; val z = 1.96
    val ph = k / n
    val den = 1.0 + z * z / n
    val ctr = ph + z * z / (2.0 * n)
    val hw = z * math.sqrt(ph * (1.0 - ph) / n + z * z / (4.0 * n * n))
    val lo = (ctr - hw) / den
    val hi = (ctr + hw) / den
    // published Wilson 95% CI for 50/100: (0.404, 0.596) at 3 decimals
    assert(math.abs(lo - 0.404) < 5e-4, lo.toString)
    assert(math.abs(hi - 0.596) < 5e-4, hi.toString)
  }
}
