package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Stats

/** Wave-19: Kruskal–Wallis, Jarque–Bera, Cohen's κ, clustering
  * coefficient, cross-correlation, linear attribution. Each test drives
  * the REGISTRY query against a fixture dir with a known closed-form
  * answer, or checks the new kernel against an independent driver-side
  * computation.
  */
class WaveNineteenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixtureDir(
      table: String, rows: org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory("graft_w19")
    rows.write.mode("overwrite").parquet(s"$dir/$table.parquet")
    dir.toString
  }

  test("kruskal_wallis: identical group distributions score H = 0") {
    import spark.implicits._
    val rows = for {
      f <- Seq("A", "N", "R"); v <- 1 to 10; _ <- 1 to 2
    } yield (f, v.toDouble)
    val got = SparkEntry.queries("stat_kruskal_wallis")(
      spark, fixtureDir("lineitem", rows.toDF("l_returnflag", "l_quantity")))
      .collect().head
    assert(got.getLong(0) == 60L)
    assert(math.abs(got.getDouble(2)) < 1e-9)
    assert(math.abs(got.getDouble(3)) < 1e-9)
  }

  test("kruskal_wallis: separated groups match a driver-side midrank replay") {
    import spark.implicits._
    // A: 1..10, N: 11..20, R: 21..30 with a few deliberate ties
    val vals =
      (1 to 10).map(v => "A" -> v.toDouble) ++
        (11 to 20).map(v => "N" -> v.toDouble) ++
        (21 to 30).map(v => "R" -> v.toDouble) ++
        Seq("A" -> 10.0, "N" -> 11.0) // cross-boundary tie mass
    val got = SparkEntry.queries("stat_kruskal_wallis")(
      spark, fixtureDir("lineitem", vals.toDF("l_returnflag", "l_quantity")))
      .collect().head
    // independent replay: sort, midranks, textbook H
    val n = vals.size
    val byV = vals.groupBy(_._2).view.mapValues(_.size).toSeq.sortBy(_._1)
    val ranks = scala.collection.mutable.Map[Double, Double]()
    var cum = 0L
    byV.foreach { case (v, c) =>
      ranks(v) = cum + (c + 1) / 2.0; cum += c
    }
    val groups = vals.groupBy(_._1).view
      .mapValues(g => (g.size, g.map(x => ranks(x._2)).sum)).toMap
    val h = 12.0 / (n * (n + 1.0)) *
      groups.values.map { case (ng, rg) => rg * rg / ng }.sum - 3 * (n + 1.0)
    val tt = byV.map { case (_, c) => c.toLong * c * c - c }.sum
    val hAdj = h / (1.0 - tt.toDouble / (n.toDouble * n * n - n))
    assert(math.abs(got.getDouble(2) - h) < 1e-9, s"${got.getDouble(2)} vs $h")
    assert(math.abs(got.getDouble(3) - hAdj) < 1e-9)
    assert(got.getDouble(3) > got.getDouble(2)) // tie correction inflates
  }

  test("rankedCells: midrank identity and partitioning invariance") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (s"g${i % 4}", ((i * i) % 37).toDouble))
      .toDF("g", "v")
    val cells = Stats.rankedCells(df, "g", "v")
    // Σ c·(2r − ct + 1) over ALL cells = 2·Σ ranks = N(N+1)
    val s = cells.agg(
      sum(col("__c") * (lit(2) * col("__r") - col("__ct") + lit(1))).as("s"),
      sum("__c").as("n")).collect().head
    assert(s.getLong(0) == s.getLong(1) * (s.getLong(1) + 1))
    val a = cells.orderBy("__g", "__v").collect().toSeq
    val b = Stats.rankedCells(df.repartition(17), "g", "v", shardBits = 3)
      .orderBy("__g", "__v").collect().toSeq
    assert(a == b)
  }

  test("jarque_bera: uniform grid has zero skew and −1.2 kurtosis") {
    import spark.implicits._
    val n = 2000
    val got = SparkEntry.queries("stat_jarque_bera")(
      spark, fixtureDir(
        "lineitem", (1 to n).map(_.toDouble).toDF("l_quantity")))
      .collect().head
    assert(got.getLong(0) == n.toLong)
    assert(math.abs(got.getDouble(1)) < 1e-9) // symmetric ⇒ g1 = 0
    // discrete uniform excess kurtosis → −1.2 + O(1/n²)
    assert(math.abs(got.getDouble(2) + 1.2) < 1e-5)
    assert(math.abs(got.getDouble(3) - n / 6.0 *
      (math.pow(got.getDouble(1), 2) + math.pow(got.getDouble(2), 2) / 4)) < 1e-9)
  }

  test("cohen_kappa: perfect agreement = 1, independence = 0") {
    import spark.implicits._
    val perfect = Seq.fill(5)((0.06, 0.05)) ++ Seq.fill(5)((0.0, 0.0))
    val k1 = SparkEntry.queries("stat_cohen_kappa")(
      spark, fixtureDir("lineitem", perfect.toDF("l_discount", "l_tax")))
      .collect().head
    assert(k1.getDouble(1) == 1.0 && k1.getDouble(3) == 1.0)
    val indep = for {
      d <- Seq(0.06, 0.0); t <- Seq(0.05, 0.0); _ <- 1 to 3
    } yield (d, t)
    val k0 = SparkEntry.queries("stat_cohen_kappa")(
      spark, fixtureDir("lineitem", indep.toDF("l_discount", "l_tax")))
      .collect().head
    assert(k0.getDouble(3) == 0.0)
  }

  test("clustering_coeff: triangle + pendant = 3/5") {
    import spark.implicits._
    // edges via two-line co-occurrence: (1,2),(2,3),(1,3),(3,4)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val li = edges.zipWithIndex.flatMap { case ((u, v), o) =>
      Seq((o.toLong, 1, u), (o.toLong, 2, v))
    }.toDF("l_orderkey", "l_linenumber", "l_suppkey")
    val got = SparkEntry.queries("graph_clustering_coeff")(
      spark, fixtureDir("lineitem", li)).collect().head
    assert(got.getLong(0) == 4L)   // nodes
    assert(got.getLong(1) == 4L)   // edges
    assert(got.getLong(2) == 1L)   // triangles
    assert(got.getLong(3) == 5L)   // wedges: deg 2,2,3,1 → 1+1+3+0
    assert(got.getDouble(4) == 0.6)
  }

  test("cross_correlation: a +2h shifted copy peaks at lag 2 with r = 1") {
    import spark.implicits._
    val t0 = 1700000000L
    // period-11 count pattern: no other lag in the ±3 grid can align
    val clicks = (0 until 48).flatMap { h =>
      (0 until (h * 37) % 11 + 1).map(i =>
        (h.toLong * 100 + i, new Timestamp((t0 + h * 3600L) * 1000L),
          1L, "click", 1.0, "{}"))
    }
    val purchases = (0 until 48).flatMap { h =>
      (0 until (h * 37) % 11 + 1).map(i =>
        (100000 + h.toLong * 100 + i,
          new Timestamp((t0 + (h + 2) * 3600L) * 1000L),
          1L, "purchase", 1.0, "{}"))
    }
    val ev = (clicks ++ purchases)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = SparkEntry.queries("ts_cross_correlation")(
      spark, fixtureDir("events", ev))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(rows(2L) - 1.0) < 1e-12)
    assert(rows.filter(_._1 != 2L).values.forall(_ < 0.999))
  }

  test("attribution: credit splits 1/k per purchase and conserves mass") {
    import spark.implicits._
    val t0 = 1700000000L
    // user 1: purchase P at t0 with clicks C1 (t0−60) and C2 (t0+60) →
    // each gets credit 1/2; user 2: one click, one purchase → credit 1;
    // user 3: click with no purchase in band → absent from the ledger
    val ev = Seq(
      (1L, new Timestamp((t0 - 60) * 1000L), 1L, "click", 1.0, "{}"),
      (2L, new Timestamp((t0 + 60) * 1000L), 1L, "click", 1.0, "{}"),
      (3L, new Timestamp(t0 * 1000L), 1L, "purchase", 1.0, "{}"),
      (4L, new Timestamp(t0 * 1000L), 2L, "click", 1.0, "{}"),
      (5L, new Timestamp((t0 + 119) * 1000L), 2L, "purchase", 1.0, "{}"),
      (6L, new Timestamp(t0 * 1000L), 3L, "click", 1.0, "{}"),
      (7L, new Timestamp((t0 + 121) * 1000L), 3L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = SparkEntry.queries("e13_attribution_linear")(
      spark, fixtureDir("events", ev))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == Set((1L, 1L), (1L, 2L), (2L, 4L)))
    assert(got((1L, 1L)) == ((1L, 0.5)) && got((1L, 2L)) == ((1L, 0.5)))
    assert(got((2L, 4L)) == ((1L, 1.0)))
    assert(math.abs(got.values.map(_._2).sum - 2.0) < 1e-6) // 2 purchases
  }
}
