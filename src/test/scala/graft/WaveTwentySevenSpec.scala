package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-27: TPC-H Q14/Q19 shapes, Gumbel block maxima, SRM check,
  * partition-skew diagnostic, code detection.
  */
class WaveTwentySevenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixtureDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = Files.createTempDirectory("graft_w27")
    tables.foreach { case (t, rows) =>
      rows.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir.toString
  }

  private def knuth(key: Long, mod: Long): Long =
    (key + 7) % 100000 * 2654435761L % 4294967296L % mod

  test("q14: promo share with an out-of-window row excluded") {
    import spark.implicits._
    val part = Seq((1L, "PROMO"), (2L, "STANDARD")).toDF("p_partkey", "p_type")
    val li = Seq(
      (1L, 30.0, 0.0, Timestamp.valueOf("1996-03-10 00:00:00")),
      (2L, 70.0, 0.0, Timestamp.valueOf("1996-03-20 00:00:00")),
      (1L, 999.0, 0.0, Timestamp.valueOf("1996-05-01 00:00:00"))) // outside
      .toDF("l_partkey", "l_extendedprice", "l_discount", "l_shipdate")
    val got = SparkEntry.queries("q14_promo_effect")(
      spark, fixtureDir("part" -> part, "lineitem" -> li)).collect().head
    assert(got.getAs[Long]("n") == 2L)
    assert(got.getAs[Double]("promo_revenue_pct") == 30.0)
  }

  test("q19: each disjunct admits its rows, nothing else") {
    import spark.implicits._
    val part = Seq((1L, "Brand#1"), (2L, "Brand#2"), (3L, "Brand#3"), (4L, "Brand#9"))
      .toDF("p_partkey", "p_brand")
    val li = Seq(
      (1L, 5.0, 10.0, 0.0),   // Brand#1, qty 5 ∈ [1,11] ✓
      (1L, 50.0, 999.0, 0.0), // Brand#1, qty 50 ✗
      (2L, 15.0, 20.0, 0.0),  // Brand#2, qty 15 ∈ [10,20] ✓
      (3L, 25.0, 30.0, 0.0),  // Brand#3, qty 25 ∈ [20,30] ✓
      (4L, 25.0, 999.0, 0.0)) // wrong brand ✗
      .toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val got = SparkEntry.queries("q19_discount_revenue")(
      spark, fixtureDir("part" -> part, "lineitem" -> li)).collect().head
    assert(got.getAs[Long]("n") == 3L)
    assert(got.getAs[Double]("revenue") == 60.0)
  }

  test("gumbel: constant block maxima fit beta 0, mu at the constant") {
    import spark.implicits._
    val rows = for (d <- 0 until 10; i <- 0 until 3)
      yield (Timestamp.valueOf(f"1996-01-${d + 1}%02d 00:00:00"),
        if (i == 2) 500.0 else 100.0 + i)
    val got = SparkEntry.queries("stat_gumbel_maxima")(
      spark,
      fixtureDir("lineitem" -> rows.toDF("l_shipdate", "l_extendedprice")))
      .collect().head
    assert(got.getAs[Long]("n_blocks") == 10L)
    assert(got.getAs[Double]("gumbel_beta") == 0.0)
    assert(got.getAs[Double]("gumbel_mu") == 500.0)
  }

  test("srm: counts match a driver-side replay of the portable hash") {
    import spark.implicits._
    val keys = (1L to 200L)
    val got = SparkEntry.queries("stat_srm_check")(
      spark, fixtureDir("lineitem" -> keys.toDF("l_orderkey"))).collect().head
    val n0 = keys.count(k => knuth(k, 2) == 0).toLong
    assert(got.getAs[Long]("n0") == n0)
    assert(got.getAs[Long]("n1") == 200L - n0)
    val chi2 = math.pow(n0.toDouble - (200 - n0), 2) / 200.0
    assert(math.abs(got.getAs[Double]("chi2") - chi2) < 1e-12)
  }

  test("partition skew: a planted hot key dominates its bucket") {
    import spark.implicits._
    val rows = Seq.fill(90)(1L) ++ (2L to 11L) // hot key + 10 singletons
    val got = SparkEntry.queries("maint_partition_skew")(
      spark, fixtureDir("lineitem" -> rows.toDF("l_suppkey"))).collect().head
    val byBucket = rows.groupBy(k => knuth(k, 32)).view.mapValues(_.size).toMap
    assert(got.getAs[Long]("n_buckets") == byBucket.size.toLong)
    assert(got.getAs[Long]("max_rows") == byBucket.values.max.toLong)
    assert(got.getAs[Double]("skew") ==
      byBucket.values.max / (100.0 / byBucket.size))
  }

  test("code detect: the planted block trips the gate, prose does not") {
    import spark.implicits._
    val rows = Seq((0L, "plain prose here"), (1L, "more plain prose"))
    val got = SparkEntry.queries("text_code_detect")(
      spark, fixtureDir("documents" -> rows.toDF("doc_id", "text")))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getAs[Boolean]("is_code"))).toMap
    assert(got(0L) == ((4L, 3L, true))) // 1 prose + 3 appended code lines
    assert(got(1L) == ((1L, 0L, false)))
  }
}
