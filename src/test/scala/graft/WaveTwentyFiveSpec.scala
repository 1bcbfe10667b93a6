package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-25: rolling slope, KS-vs-exponential, time holdout, MoM change,
  * partial correlation, decile report.
  */
class WaveTwentyFiveSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixtureDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = Files.createTempDirectory("graft_w25")
    tables.foreach { case (t, rows) =>
      rows.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir.toString
  }

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("rolling slope: a perfect hourly ramp scores slope exactly 1") {
    import spark.implicits._
    val base = 1704067200L
    val rows = for { h <- 0 until 30; i <- 0 to h }
      yield (h.toLong * 1000 + i, ts(base + h * 3600L + i))
    val got = SparkEntry.queries("ts_rolling_slope")(
      spark, fixtureDir("events" -> rows.toDF("event_id", "ts")))
      .collect()
    assert(got.length == 7) // 30 buckets − 23 warmup
    got.foreach(r => assert(r.getAs[Double]("slope") == 1.0))
  }

  test("ks exp: constant gaps score the closed-form D = 1 − e^-1") {
    import spark.implicits._
    val base = 1704067200L
    val rows = (0 until 20).map(i => (i.toLong, ts(base + i * 100L), 1L))
    val got = SparkEntry.queries("stat_ks_exp")(
      spark, fixtureDir("events" -> rows.toDF("event_id", "ts", "user_id")))
      .collect().head
    assert(got.getAs[Double]("mean") == 100.0)
    val want = BigDecimal(1.0 - math.exp(-1.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getAs[Double]("ks_d") == want)
  }

  test("time holdout: exact type-1 p80 cutoff splits 8/2") {
    import spark.implicits._
    val base = 1704067200L
    val rows = (1 to 10).map(i => (i.toLong, ts(base + i), 1L))
    val got = SparkEntry.queries("split_time_holdout")(
      spark, fixtureDir("events" -> rows.toDF("event_id", "ts", "user_id")))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(got == Map("train" -> 8L, "eval" -> 2L))
  }

  test("mom change: hand two-month revenue pair") {
    import spark.implicits._
    val nation = Seq((0, "DE", 0)).toDF("n_nationkey", "n_name", "n_regionkey")
    val supplier = Seq((10L, 0)).toDF("s_suppkey", "s_nationkey")
    val orders = Seq(
      (100L, Timestamp.valueOf("1996-01-15 00:00:00")),
      (101L, Timestamp.valueOf("1996-02-15 00:00:00")))
      .toDF("o_orderkey", "o_orderdate")
    val li = Seq((100L, 10L, 100.0, 0.0), (101L, 10L, 150.0, 0.0))
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val got = SparkEntry.queries("olap_mom_change")(
      spark, fixtureDir("nation" -> nation, "supplier" -> supplier,
        "orders" -> orders, "lineitem" -> li)).collect()
    assert(got.length == 1)
    assert(got.head.getAs[Double]("revenue") == 150.0)
    assert(got.head.getAs[Double]("prev_revenue") == 100.0)
    assert(got.head.getAs[Double]("mom_pct") == 0.5)
  }

  test("partial correlation: matches an independent driver-side replay") {
    import spark.implicits._
    // x tracks z, y tracks z with an independent wiggle
    val rows = (1 to 40).map { i =>
      val z = i.toDouble
      (z + (if (i % 3 == 0) 2.0 else 0.0), 3 * z + (if (i % 7 == 0) 5.0 else -1.0), z)
    }
    val got = SparkEntry.queries("stat_partial_corr")(
      spark, fixtureDir("lineitem" ->
        rows.toDF("l_quantity", "l_extendedprice", "l_discount")))
      .collect().head
    def pearson(a: Seq[Double], b: Seq[Double]) = {
      val n = a.size.toDouble
      val (sa, sb) = (a.sum, b.sum)
      val (saa, sbb) = (a.map(x => x * x).sum, b.map(x => x * x).sum)
      val sab = a.zip(b).map { case (x, y) => x * y }.sum
      (n * sab - sa * sb) / (math.sqrt(n * saa - sa * sa) * math.sqrt(n * sbb - sb * sb))
    }
    val (xs, ys, zs) = (rows.map(_._1), rows.map(_._2), rows.map(_._3))
    val (rxy, rxz, ryz) = (pearson(xs, ys), pearson(xs, zs), pearson(ys, zs))
    val want = (rxy - rxz * ryz) / math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))
    assert(math.abs(got.getAs[Double]("partial_r") - want) < 1e-9)
    assert(got.getAs[Double]("partial_r") < got.getAs[Double]("r_xy"),
      "controlling for z must weaken the x-y association here")
  }

  test("decile report: 1..100 splits into exact tens with exact shares") {
    import spark.implicits._
    val got = graft.functions.Stats.decileReport(
      (1 to 100).map(_.toDouble).toDF("v"), "v")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getAs[Double]("sum_value"), r.getAs[Double]("share")))
      .toMap
    (1 to 10).foreach { d =>
      val sum = ((d - 1) * 10 + 1 to d * 10).sum.toDouble
      val (n, sv, sh) = got(d.toLong)
      assert(n == 10L && sv == sum && sh == sum / 5050.0)
    }
  }
}
