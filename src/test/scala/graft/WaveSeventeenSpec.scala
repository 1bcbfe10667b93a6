package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Stats
import graft.operators.Splits

/** Wave-17: one-sample KS (+ the shared erf text), grouped k-fold,
  * band join.
  */
class WaveSeventeenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("erf text: matches known values within the A&S 1.5e-7 bound") {
    import spark.implicits._
    val cases = Seq(
      (0.0, 0.0), (0.5, 0.5204998778), (1.0, 0.8427007929),
      (2.0, 0.9953222650), (-1.0, -0.8427007929))
    val df = cases.map(_._1).toDF("x")
    val got = df.select(expr(graft.fit.ClosedForm.erfText("x")).as("e"))
      .collect().map(_.getDouble(0))
    cases.map(_._2).zip(got).foreach { case (want, g) =>
      assert(math.abs(g - want) < 1.5e-7, s"$g vs $want")
    }
  }

  test("ks1Samp: a near-normal sample scores small, a uniform one large") {
    import spark.implicits._
    // deterministic probit-transformed grid ~ N(0,1): D should be tiny
    val ps = (1 to 2000).map(i => (i - 0.5) / 2000.0)
    val normal = ps.toDF("p")
      .select(expr(graft.fit.ClosedForm.probitText("p")).as("v"))
    val dN = Stats.ks1Samp(normal, "v").collect().head.getDouble(3)
    assert(dN < 0.01, dN.toString)
    // uniform [0,1] against its own fitted normal: D ≈ 0.06 (known shape)
    val uni = ps.toDF("v")
    val dU = Stats.ks1Samp(uni, "v").collect().head.getDouble(3)
    assert(dU > 0.04, dU.toString)
    assert(dN < dU)
  }

  test("ks1Samp: partitioning- and shardBits-invariant") {
    import spark.implicits._
    val rows = (1L to 1000L).map(i => ((i * i) % 977).toDouble)
    val a = Stats.ks1Samp(rows.toDF("v").repartition(1), "v", shardBits = 1)
      .collect().head
    val b = Stats.ks1Samp(rows.toDF("v").repartition(17), "v", shardBits = 12)
      .collect().head
    assert(a == b)
  }

  test("groupKFold: leak-free — every row of a group lands in one fold") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i % 97, i)).toDF("grp", "row_id")
    val folds = Splits.groupKFold(df, "grp", k = 5, seed = 13)
    val perGroup = folds.groupBy("grp")
      .agg(countDistinct("fold").as("nf")).collect()
    assert(perGroup.forall(_.getLong(1) == 1L))
    // all 5 folds are populated and the assignment is deterministic
    val used = folds.select("fold").distinct().collect().map(_.getLong(0)).toSet
    assert(used == (0L to 4L).toSet)
    val again = Splits.groupKFold(df.repartition(7), "grp", k = 5, seed = 13)
      .groupBy("grp").agg(max("fold").as("f")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val first = folds.groupBy("grp").agg(max("fold").as("f")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == first)
  }

  test("band join bucketing: boundary pairs kept once, outside dropped") {
    import spark.implicits._
    // replicate the e12 kernel on a hand fixture: δ = 120
    val l = Seq((1L, 10L, 1000L), (1L, 11L, 5000L)).toDF("user_id", "click_id", "tl")
    val r = Seq(
      (1L, 20L, 1120L),  // exactly +120 from click 10 → kept
      (1L, 21L, 1121L),  // +121 → dropped
      (1L, 22L, 4999L))  // -1 from click 11 → kept
      .toDF("ur", "purchase_id", "tr")
      .withColumn("br", floor(col("tr") / 120).cast("long"))
    val probe = l.withColumn("pb",
      explode(array(
        floor(col("tl") / 120).cast("long") - 1,
        floor(col("tl") / 120).cast("long"),
        floor(col("tl") / 120).cast("long") + 1)))
    val pairs = probe
      .join(r, col("user_id") === col("ur") && col("pb") === col("br"))
      .filter(abs(col("tl") - col("tr")) <= 120)
      .select("click_id", "purchase_id")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(pairs == Set((10L, 20L), (11L, 22L)))
  }
}
