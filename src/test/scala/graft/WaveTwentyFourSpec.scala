package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-24: user streaks, Markov stationary distribution, degree
  * distribution, referential integrity, Theil index, intrinsic dimension.
  */
class WaveTwentyFourSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixtureDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = Files.createTempDirectory("graft_w24")
    tables.foreach { case (t, rows) =>
      rows.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir.toString
  }

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("streaks: islands split exactly at gap days") {
    import spark.implicits._
    val d0 = 1704067200L
    def at(day: Int, u: Long) = (u * 100 + day, ts(d0 + day * 86400L + 60), u)
    val rows = Seq(0, 1, 2, 5, 6).map(at(_, 1L)) ++ Seq(0, 2, 4).map(at(_, 2L))
    val got = SparkEntry.queries("e17_user_streaks")(
      spark,
      fixtureDir("events" -> rows.toDF("event_id", "ts", "user_id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(3L -> 1L, 1L -> 1L)) // user 1 max 3, user 2 max 1
  }

  test("markov stationary: a 2-cycle splits mass evenly; a sink absorbs it") {
    import spark.implicits._
    val base = 1704067200L
    def chain(u: Long, types: Seq[String]) = types.zipWithIndex.map {
      case (t, i) => (u * 1000 + i, ts(base + i * 60L), u, t)
    }
    // A→B→A→B… : stationary (1/2, 1/2)
    val cyc = chain(1L, Seq.fill(10)(Seq("A", "B")).flatten)
    val got = SparkEntry.queries("e18_markov_stationary")(
      spark,
      fixtureDir("events" -> cyc.toDF("event_id", "ts", "user_id", "event_type")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val half = 500000000000L
    assert(math.abs(got("A") - half) < 1000000L && math.abs(got("B") - half) < 1000000L)
    // A→B, then B→B forever: B absorbs everything
    val sink = chain(2L, "A" +: Seq.fill(12)("B"))
    val got2 = SparkEntry.queries("e18_markov_stationary")(
      spark,
      fixtureDir("events" -> sink.toDF("event_id", "ts", "user_id", "event_type")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got2("A") < 10000000000L, s"A should drain: ${got2("A")}")
    assert(got2("B") > 900000000000L, s"B should absorb: ${got2("B")}")
  }

  test("degree distribution: hand bipartite graph") {
    import spark.implicits._
    val orders = Seq((100L, 1L), (101L, 2L)).toDF("o_orderkey", "o_custkey")
    val li = Seq((100L, 1L), (100L, 2L), (101L, 1L))
      .toDF("l_orderkey", "l_suppkey")
    val got = SparkEntry.queries("graph_degree_dist")(
      spark, fixtureDir("orders" -> orders, "lineitem" -> li))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // cust1 deg2, cust2 deg1, supp1 deg2, supp2 deg1
    assert(got == Map(1L -> 2L, 2L -> 2L))
  }

  test("referential integrity: a planted orphan is counted on exactly its edge") {
    import spark.implicits._
    val nation = Seq((0, "DE")).toDF("n_nationkey", "n_name")
    val customer = Seq((1L, 0)).toDF("c_custkey", "c_nationkey")
    val orders = Seq((100L, 1L), (101L, 1L)).toDF("o_orderkey", "o_custkey")
    val supplier = Seq((10L, 0)).toDF("s_suppkey", "s_nationkey")
    val part = Seq((20L, "p")).toDF("p_partkey", "p_name")
    val li = Seq(
      (100L, 10L, 20L), (999L, 10L, 20L)) // 999 → orphan order key
      .toDF("l_orderkey", "l_suppkey", "l_partkey")
    val got = SparkEntry.queries("dq_referential")(
      spark, fixtureDir("nation" -> nation, "customer" -> customer,
        "orders" -> orders, "supplier" -> supplier, "part" -> part,
        "lineitem" -> li))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got("lineitem.l_orderkey->orders") == 1L)
    assert(got.filterKeys(_ != "lineitem.l_orderkey->orders").values.forall(_ == 0L))
  }

  test("theil index: equal values score exactly zero; hand case replays") {
    import spark.implicits._
    val eq = SparkEntry.queries("stat_theil_index")(
      spark,
      fixtureDir("lineitem" -> Seq.fill(10)(42.0).toDF("l_extendedprice")))
      .collect().head
    assert(eq.getAs[Double]("theil_t") == 0.0)
    val vals = Seq(1.0, 2.0, 3.0, 10.0)
    val got = SparkEntry.queries("stat_theil_index")(
      spark, fixtureDir("lineitem" -> vals.toDF("l_extendedprice")))
      .collect().head
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val mu = vals.sum / vals.size
    val want = vals.map(x => r6(x / mu * math.log(x / mu))).sum / vals.size
    assert(math.abs(got.getAs[Double]("theil_t") - want) < 1e-12)
  }

  test("intrinsic dim: matches an independent driver-side TwoNN replay") {
    import spark.implicits._
    // four near-parallel 64-dim vectors — one quantizer cell, no duplicates
    def vec(eps1: Float, eps2: Float): Array[Float] = {
      val a = Array.fill(64)(0.0f); a(0) = 1.0f; a(1) = eps1; a(2) = eps2; a
    }
    val raw = Seq(
      0L -> vec(0.01f, 0.0f), 1L -> vec(0.0f, 0.03f),
      2L -> vec(0.05f, 0.02f), 3L -> vec(0.02f, 0.08f))
    val got = SparkEntry.queries("emb_intrinsic_dim")(
      spark, fixtureDir("embeddings" -> raw.toDF("vec_id", "embedding")))
      .collect().head
    // driver-side replay: exact pairwise cosines, rank (cos desc, id),
    // round-6, same term formula
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vs = raw.map { case (i, a) => i -> a.map(_.toDouble) }
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val terms = vs.map { case (i, v) =>
      val nn = vs.filter(_._1 != i)
        .map { case (j, u) => (r6(cos(v, u)), j) }
        .sortBy { case (c, j) => (-c, j) }.take(2)
      (nn(0)._1, nn(1)._1)
    }.filter { case (c1, c2) => c1 < 1.0 }
      .map { case (c1, c2) => r6(0.5 * math.log((1.0 - c2) / (1.0 - c1))) }
    val want = terms.size / terms.sum
    assert(got.getAs[Long]("n_used") == terms.size.toLong)
    assert(math.abs(got.getAs[Double]("intrinsic_dim") - want) < 1e-9)
  }
}
