package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-18: mutual information, Cohen's d / Hedges' g, Hill tail index,
  * normal QQ table, elbow inertia ladder. Each test drives the REGISTRY
  * query (not a private twin) against a fixture directory whose tables
  * are constructed so the closed-form answer is known.
  */
class WaveEighteenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Write a minimal lineitem fixture and run `name` against its dir. */
  private def onLineitem(rows: org.apache.spark.sql.DataFrame, name: String) = {
    val dir = Files.createTempDirectory("graft_w18")
    rows.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    SparkEntry.queries(name)(spark, dir.toString)
  }

  test("mutual_info: independent uniform cells score exactly 0") {
    import spark.implicits._
    val rows = for {
      x <- Seq(1.0, 2.0); y <- Seq(0.0, 0.1); _ <- 1 to 5
    } yield (x, y)
    val got = onLineitem(
      rows.toDF("l_quantity", "l_discount"), "stat_mutual_info")
      .collect().head
    assert(got.getLong(0) == 20L)
    assert(got.getDouble(1) == 0.0)
  }

  test("mutual_info: a deterministic map scores ln 2") {
    import spark.implicits._
    val rows = for { x <- Seq(1.0, 2.0); _ <- 1 to 7 } yield (x, x / 100)
    val got = onLineitem(
      rows.toDF("l_quantity", "l_discount"), "stat_mutual_info")
      .collect().head
    assert(math.abs(got.getDouble(1) - math.log(2.0)) < 1e-6)
  }

  test("cohens_d: textbook two-group fixture, off-flag rows ignored") {
    import spark.implicits._
    val rows = Seq(("A", 2.0), ("A", 4.0), ("R", 1.0), ("R", 3.0),
      ("N", 1000.0))
    val got = onLineitem(
      rows.toDF("l_returnflag", "l_quantity"), "stat_cohens_d")
      .collect().head
    assert(got.getLong(0) == 2L && got.getLong(1) == 2L)
    assert(got.getDouble(2) == 3.0 && got.getDouble(3) == 2.0)
    val d = 1.0 / math.sqrt(2.0)
    assert(math.abs(got.getDouble(4) - d) < 1e-12)
    assert(math.abs(got.getDouble(5) - d * (1.0 - 3.0 / 7.0)) < 1e-12)
  }

  test("hill_tail: exact Pareto(α=2) grid recovers α within bias") {
    import spark.implicits._
    val n = 2000
    // v_i = xm·(n/i)^(1/α): the exact quantile grid of a Pareto tail
    val vs = (1 to n).map(i => 100.0 * math.sqrt(n.toDouble / i))
    val got = onLineitem(vs.toDF("l_extendedprice"), "stat_hill_tail")
      .collect().head
    val xmin = 100.0 * math.sqrt(2.0) // the 1000th order statistic
    assert(math.abs(got.getDouble(1) - xmin) < 1e-9)
    val sl = BigDecimal(vs.take(1000).map(v => math.log(v / xmin)).sum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got.getDouble(2) - 1000.0 / sl) < 1e-4)
    assert(math.abs(got.getDouble(2) - 2.0) < 0.02) // Hill bias at this k
  }

  test("qq_normal: a probit grid sits on its own fitted normal line") {
    import spark.implicits._
    val ps = (1 to 2000).map(i => (i - 0.5) / 2000.0)
    val li = ps.toDF("p")
      .select((lit(100.0) + lit(10.0)
        * expr(graft.fit.ClosedForm.probitText("p"))).as("l_extendedprice"))
    val rows = onLineitem(li, "stat_qq_normal").collect()
    assert(rows.length == 19)
    assert(rows.map(_.getDouble(0)).toSeq == (1 to 19).map(_ / 20.0))
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 0.2,
        s"q=${r.getDouble(0)}: obs ${r.getDouble(1)} vs theo ${r.getDouble(2)}")
    }
  }

  test("elbow inertia: bounded, populated, and partitioning-invariant") {
    import spark.implicits._
    val vecs = (0 until 200).map { i =>
      (i.toLong, (0 until 64).map(j => ((i * 31 + j * 7) % 13 - 6) / 6.0f),
        i % 3)
    }
    val df = vecs.toDF("vec_id", "embedding", "label")
    val d1 = Files.createTempDirectory("graft_w18e1")
    val d2 = Files.createTempDirectory("graft_w18e2")
    df.coalesce(1).write.mode("overwrite").parquet(s"$d1/embeddings.parquet")
    df.repartition(7).write.mode("overwrite").parquet(s"$d2/embeddings.parquet")
    val run = (d: String) =>
      SparkEntry.queries("emb_elbow_inertia")(spark, d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          .sortBy(_._1).toSeq
    val a = run(d1.toString)
    assert(a.map(_._1) == Seq(2L, 4L, 8L))
    assert(a.forall(_._2 == 200L))
    // 1 − best_cos per vector lies in [0, 2] ⇒ inertia in [0, 2n]
    assert(a.forall(r => r._3 >= 0.0 && r._3 <= 400.0))
    assert(run(d2.toString) == a)
  }
}
