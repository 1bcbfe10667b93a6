package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Stats

/** Wave-13 statistics: Gini on the sharded cumulative kernel, plus the
  * runs-test / Markov / Grubbs determinism contracts.
  */
class WaveThirteenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("gini: perfectly equal distribution scores zero") {
    import spark.implicits._
    val df = (1L to 100L).map(i => ("g", 5.0)).toDF("grp", "v")
    val g = Stats.gini(df, "grp", "v").collect().head
    assert(g.getLong(1) == 100L)
    assert(math.abs(g.getDouble(2)) < 1e-12, g.getDouble(2).toString)
  }

  test("gini: total concentration scores (n-1)/n") {
    import spark.implicits._
    // 99 holders of ~nothing (cents=0 after rounding would degenerate —
    // use 0.01) and one holder of everything
    val rows = (1L to 99L).map(_ => ("g", 0.00)) :+ (("g", 1000.00))
    val g = Stats.gini(rows.toDF("grp", "v"), "grp", "v").collect().head
    // x_i = 0 except the top: G = 2·n·x/(n·x) ... closed form (n-1)/n
    assert(math.abs(g.getDouble(2) - 0.99) < 1e-12, g.getDouble(2).toString)
  }

  test("gini: matches the textbook rank formula on a known small set") {
    import spark.implicits._
    // values 1,2,3,4 (in dollars): G = 2·(1·1+2·2+3·3+4·4)/(4·10) − 5/4 = 0.25
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0)).toDF("grp", "v")
    val g = Stats.gini(df, "grp", "v").collect().head
    assert(math.abs(g.getDouble(2) - 0.25) < 1e-12, g.getDouble(2).toString)
  }

  test("gini: sharded kernel is partitioning-invariant and tie-correct") {
    import spark.implicits._
    val rows = (1L to 500L).map(i => (if (i % 2 == 0) "a" else "b", ((i * i) % 97).toDouble))
    val one = Stats.gini(rows.toDF("grp", "v").repartition(1), "grp", "v", shardBits = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val many = Stats.gini(rows.toDF("grp", "v").repartition(17), "grp", "v", shardBits = 12)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(one == many) // bit-equal across shard counts AND partitionings
  }

  test("runs-test z formula: alternating signs maximize runs") {
    // pure Scala check of the fixed tree the query uses: n1=n2=10, R=20
    val n1 = 10.0; val n2 = 10.0; val n = 20.0; val runs = 20.0
    val mu = 2.0 * n1 * n2 / n + 1.0
    val sig = math.sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n * n * (n - 1.0)))
    val z = (runs - mu) / sig
    assert(z > 4.0) // far more runs than chance → strongly positive z
    assert(math.abs(mu - 11.0) < 1e-12)
  }

  test("markov transitions: deterministic lead pairs and row-normalized p") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // user 1: a,b,a,b ; user 2: a,a
    val df = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
      (2L, 5L, "a"), (2L, 6L, "a"))
      .toDF("user_id", "event_id", "event_type")
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val t = df.withColumn("next", lead(col("event_type"), 1).over(w))
      .filter(col("next").isNotNull)
      .groupBy("event_type", "next").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(t == Map(("a", "b") -> 2L, ("b", "a") -> 1L, ("a", "a") -> 1L))
  }
}
