package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-26: Tukey fences, Cochran's Q, Ljung–Box, ABC classification,
  * HHI concentration, Heaps' law.
  */
class WaveTwentySixSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixtureDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = Files.createTempDirectory("graft_w26")
    tables.foreach { case (t, rows) =>
      rows.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir.toString
  }

  test("tukey fences: hand quartiles and exactly one outlier per side") {
    import spark.implicits._
    val vals = Seq(-100.0) ++ (1 to 10).map(_.toDouble) ++ Seq(100.0)
    val rows = vals.map(("A", _))
    val got = SparkEntry.queries("stat_tukey_fences")(
      spark,
      fixtureDir("lineitem" -> rows.toDF("l_returnflag", "l_extendedprice")))
      .collect().head
    assert(got.getAs[Double]("q1") == 2.0 && got.getAs[Double]("q3") == 8.0)
    assert(got.getAs[Long]("n_low") == 1L && got.getAs[Long]("n_high") == 1L)
  }

  test("cochran q: perfectly agreeing gates score zero; hand case replays") {
    import spark.implicits._
    // all-fire and none-fire rows only → NO discordance: Q is undefined
    // (0/0) and both engines contract to NULL
    val agree = Seq.fill(5)((0.06, 0.05, 30.0)) ++ Seq.fill(7)((0.01, 0.01, 10.0))
    val got0 = SparkEntry.queries("stat_cochran_q")(
      spark, fixtureDir("lineitem" ->
        agree.toDF("l_discount", "l_tax", "l_quantity"))).collect().head
    assert(got0.isNullAt(got0.fieldIndex("cochran_q")))
    // mixed pattern vs driver-side formula
    val rows = Seq(
      (0.06, 0.01, 10.0), (0.06, 0.05, 10.0), (0.01, 0.05, 30.0),
      (0.06, 0.01, 30.0), (0.01, 0.01, 10.0), (0.06, 0.05, 30.0))
    val got = SparkEntry.queries("stat_cochran_q")(
      spark, fixtureDir("lineitem" ->
        rows.toDF("l_discount", "l_tax", "l_quantity"))).collect().head
    val g = rows.map { case (d, t, q) =>
      Seq(if (d >= 0.05) 1 else 0, if (t >= 0.04) 1 else 0, if (q > 25) 1 else 0)
    }
    val k = 3
    val c = (0 until k).map(j => g.map(_(j)).sum.toDouble)
    val tTot = c.sum
    val r2 = g.map(r => { val s = r.sum; s * s }).sum.toDouble
    val want = k * (k - 1) * c.map(cj => math.pow(cj - tTot / k, 2)).sum /
      (k * tTot - r2)
    assert(math.abs(got.getAs[Double]("cochran_q") - want) < 1e-12)
  }

  test("ljung box: composes the verified per-lag autocorrelations exactly") {
    import spark.implicits._
    val base = 1704067200L
    // periodic 5-min bucket values with period 11 — strong autocorrelation
    val rows = (0 until 200).map { i =>
      (i.toLong, new Timestamp((base + i * 300L) * 1000L),
        1.0 + (i % 11).toDouble)
    }
    val dir = fixtureDir("events" -> rows.toDF("event_id", "ts", "value"))
    val acs = SparkEntry.queries("stat_autocorr")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("autocorr")).toMap
    val got = SparkEntry.queries("stat_ljung_box")(spark, dir).collect().head
    val nb = got.getAs[Long]("n_buckets").toDouble
    val want = nb * (nb + 2.0) * (1 to 3)
      .map(kk => acs(kk.toLong) * acs(kk.toLong) / (nb - kk)).sum
    assert(math.abs(got.getAs[Double]("ljung_box_q") - want) < 1e-9)
    assert(got.getAs[Double]("ljung_box_q") > 10.0, "periodic series must reject")
  }

  test("abc: boundary blocks go to the higher class") {
    import spark.implicits._
    val li = Seq((1L, 80.0), (2L, 15.0), (3L, 5.0))
      .toDF("l_partkey", "l_extendedprice").withColumn("l_discount", lit(0.0))
    val got = SparkEntry.queries("olap_abc_classification")(
      spark, fixtureDir("lineitem" -> li))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getAs[Double]("revenue"))).toMap
    assert(got("A") == ((1L, 80.0)))
    assert(got("B") == ((1L, 15.0)))
    assert(got("C") == ((1L, 5.0)))
  }

  test("hhi: monopoly scores 1, an even split 1/k") {
    import spark.implicits._
    val nation = Seq((0, "DE", 0), (1, "FR", 0))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val supplier = Seq((10L, 0), (11L, 1), (12L, 1))
      .toDF("s_suppkey", "s_nationkey")
    val li = Seq((10L, 50.0), (11L, 30.0), (12L, 30.0))
      .toDF("l_suppkey", "l_extendedprice").withColumn("l_discount", lit(0.0))
    val got = SparkEntry.queries("agg_hhi_concentration")(
      spark, fixtureDir("nation" -> nation, "supplier" -> supplier,
        "lineitem" -> li))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("hhi")).toMap
    assert(got("DE") == 1.0)
    assert(math.abs(got("FR") - 0.5) < 1e-9)
  }

  test("heaps: an all-unique-token corpus fits beta = 1, K = 1 exactly") {
    import spark.implicits._
    val rows = (0 until 30).map { d =>
      (d.toLong, (0 until 10).map(i => s"tok_${d}_$i").mkString(" "))
    }
    val got = SparkEntry.queries("text_heaps_law")(
      spark, fixtureDir("documents" -> rows.toDF("doc_id", "text")))
      .collect().head
    assert(got.getAs[Double]("heaps_beta") == 1.0)
    assert(got.getAs[Double]("heaps_k") == 1.0)
  }
}
