package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Completeness, Cut, Cuts, Reshape, Windows}

class OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("cuts: docstring example semantics (clean_beta_scan.py:27-40)") {
    import spark.implicits._
    // events: (trigger, device, amplitude); cuts bound amplitude per device
    val events = Seq(
      (1, "d1", 5.0), (1, "d2", 5.0),  // all within bounds → accepted
      (2, "d1", 0.5), (2, "d2", 5.0),  // d1 below lower → rejected
      (3, "d1", 5.0), (3, "d2", 99.0)  // d2 above upper → rejected
    ).toDF("n_trigger", "device_name", "amplitude")
    val cuts = Seq(
      Cut("amplitude", "d1", "lower", 1.0),
      Cut("amplitude", "d2", "higher", 10.0))
    val got = Cuts.acceptedPerGroup(events, cuts, "device_name", Seq("n_trigger"))
      .orderBy("n_trigger").collect().map(r => (r.getInt(0), r.getBoolean(1)))
    assert(got.toSeq == Seq((1, true), (2, false), (3, false)))
  }

  test("completeness drops any group containing a null (utils.py:9-21)") {
    import spark.implicits._
    val df = Seq(
      (1, Some(1.0)), (1, Some(2.0)),
      (2, Some(1.0)), (2, None),
      (3, None)).toDF("g", "v")
    val got = Completeness.filterComplete(df, Seq("g"), Seq("v"))
      .select("g").distinct().as[Int].collect().sorted
    assert(got.toSeq == Seq(1))
  }

  test("pivot∘unpivot = identity on complete data (SURVEY §5 property)") {
    import spark.implicits._
    val long = Seq((1, "a", 10.0), (1, "b", 20.0), (2, "a", 30.0), (2, "b", 40.0))
      .toDF("k", "dev", "v")
    val wide = Reshape.pivotWide(long, Seq("k"), "dev", Seq("a", "b"), first(col("v")))
    val back = Reshape.unpivotLong(wide, Seq("k"), Seq("a", "b"), "dev", "v")
      .orderBy("k", "dev").collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    assert(back.toSeq == Seq((1, "a", 10.0), (1, "b", 20.0), (2, "a", 30.0), (2, "b", 40.0)))
  }

  test("firstHalf keeps floor(n/2) rows per group in order") {
    import spark.implicits._
    val df = Seq((1, 1), (1, 2), (1, 3), (2, 1), (2, 2), (2, 3), (2, 4), (3, 1))
      .toDF("g", "i")
    val got = Windows.firstHalf(df, Seq("g"), Seq(col("i")))
      .orderBy("g", "i").collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(got.toSeq == Seq((1, 1), (2, 1), (2, 2)))
  }

  test("argMinPerGroup returns the tie-broken minimum row") {
    import spark.implicits._
    val df = Seq((1, 5.0, "x"), (1, 3.0, "y"), (1, 3.0, "a"), (2, 7.0, "z"))
      .toDF("g", "v", "tag")
    val got = Windows.argMinPerGroup(df, Seq("g"), Seq(col("v"), col("tag")))
      .orderBy("g").collect().map(r => (r.getInt(0), r.getDouble(1), r.getString(2)))
    assert(got.toSeq == Seq((1, 3.0, "a"), (2, 7.0, "z")))
  }

  test("stratified split is deterministic and roughly proportioned") {
    import spark.implicits._
    val df = (0L until 2000L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "lang")
    val s1 = graft.operators.Splits.trainValTest(df, "id", 80, 10, seed = 7)
    val s2 = graft.operators.Splits.trainValTest(df, "id", 80, 10, seed = 7)
    assert(s1.collect().map(_.toString).sorted.sameElements(s2.collect().map(_.toString).sorted))
    val frac = s1.filter(col("split") === "train").count().toDouble / 2000
    assert(math.abs(frac - 0.8) < 0.05, s"train frac $frac")
    // per-stratum proportions hold too
    val fa = s1.filter(col("lang") === "a" && col("split") === "train").count().toDouble / 1000
    assert(math.abs(fa - 0.8) < 0.07, s"stratum frac $fa")
  }

  test("shuffled export order: deterministic, dense per-shard positions, actually shuffled") {
    import spark.implicits._
    val df = (0L until 1000L).toDF("id")
    def run(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("shard"), r.getAs[Int]("pos")))
        .sortBy(_._1)
    val a = run(graft.operators.Splits.shuffled(df, "id", n = 8, seed = 7))
    val b = run(graft.operators.Splits.shuffled(df.repartition(13), "id", n = 8, seed = 7))
    assert(a.sameElements(b)) // partitioning-invariant
    // positions are dense 1..size within every shard
    a.groupBy(_._2).foreach { case (sh, rows) =>
      assert(rows.map(_._3).sorted.sameElements(1 to rows.length), s"shard $sh")
    }
    // actually shuffled: within some shard, position order must not be
    // id order (an id-monotone "shuffle" means the order seed collapsed)
    val monotone = a.groupBy(_._2).values.forall { rows =>
      val byPos = rows.sortBy(_._3).map(_._1)
      byPos.sameElements(byPos.sorted)
    }
    assert(!monotone, "within-shard order is id-monotone — not a shuffle")
    // production tier: same contracts, full-id hashing
    val f1 = run(graft.operators.Splits.shuffledFull(df, "id", n = 8, seed = 7))
    val f2 = run(graft.operators.Splits.shuffledFull(df.repartition(11), "id", n = 8, seed = 7))
    assert(f1.sameElements(f2))
    f1.groupBy(_._2).foreach { case (sh, rows) =>
      assert(rows.map(_._3).sorted.sameElements(1 to rows.length), s"full shard $sh")
    }
  }
}
