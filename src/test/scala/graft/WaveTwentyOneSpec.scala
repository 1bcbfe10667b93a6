package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-21: Friedman test, Poisson rate test, RFM segmentation,
  * cumulative users, Holt linear smoothing, PQ distortion certificate.
  */
class WaveTwentyOneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixtureDir(
      table: String, rows: org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory("graft_w21")
    rows.write.mode("overwrite").parquet(s"$dir/$table.parquet")
    dir.toString
  }

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("friedman: perfectly consistent block ranking scores the textbook 8.0") {
    import spark.implicits._
    // 4 blocks × 3 treatments; R always above N above A in every block
    val rows = for {
      b <- 1 to 4; (f, v) <- Seq(("A", 1.0), ("N", 2.0), ("R", 3.0))
    } yield (b, f, v + b * 10.0) // block offsets change means, not ranks
    val got = SparkEntry.queries("stat_friedman")(
      spark,
      fixtureDir("lineitem",
        rows.toDF("l_linenumber", "l_returnflag", "l_quantity")))
      .collect().head
    assert(got.getAs[Long]("n_blocks") == 4L)
    assert(got.getAs[Long]("df") == 2L)
    assert(got.getAs[Double]("chi2_f") == 8.0) // 12/(nk(k+1))·ΣR² − 3n(k+1)
  }

  test("friedman: incomplete blocks are excluded") {
    import spark.implicits._
    val rows = Seq(
      (1, "A", 1.0), (1, "N", 2.0), (1, "R", 3.0),
      (2, "A", 3.0), (2, "N", 2.0), (2, "R", 1.0),
      (3, "A", 1.0), (3, "N", 2.0)) // block 3 misses R → dropped
    val got = SparkEntry.queries("stat_friedman")(
      spark,
      fixtureDir("lineitem",
        rows.toDF("l_linenumber", "l_returnflag", "l_quantity")))
      .collect().head
    assert(got.getAs[Long]("n_blocks") == 2L)
    assert(got.getAs[Double]("chi2_f") == 0.0) // opposite rankings cancel
  }

  test("poisson rate: flat rate scores z = 0, a planted shift its exact z") {
    import spark.implicits._
    val base = 1704067200L
    val span = 1000L // es in [base, base+1000], midpoint base+500
    val flat = (0 until 10).map(i => ("flat", ts(base + i * 100L + 50L)))
    // shifted: 16 in the first half, 4 in the second
    val shifted = (0 until 16).map(i => ("shifted", ts(base + i * 30L))) ++
      (0 until 4).map(i => ("shifted", ts(base + 501L + i * 100L)))
    val all = (flat ++ shifted :+ (("flat", ts(base + span)))).zipWithIndex
      .map { case ((t, x), i) => (i.toLong, x, t) }
    val got = SparkEntry.queries("stat_poisson_rate")(
      spark, fixtureDir("events", all.toDF("event_id", "ts", "event_type")))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("k1"), r.getAs[Long]("k2"), r.getAs[Double]("z"))).toMap
    val (k1, k2, z) = got("shifted")
    assert(k1 == 16L && k2 == 4L)
    assert(math.abs(z - 12.0 / math.sqrt(20.0)) < 1e-12)
    val (f1, f2, _) = got("flat")
    assert(f1 + f2 == 11L)
  }

  test("rfm: totally ordered users land on the diagonal segments") {
    import spark.implicits._
    val base = 1704067200L
    // user i: i events, later last-seen, higher value — all three metrics
    // strictly ordered the same way
    val rows = for {
      u <- 1 to 5; i <- 1 to u
    } yield (u.toLong * 100 + i, ts(base + u * 3600L + i), u.toLong, u * 10.0)
    val got = SparkEntry.queries("e14_rfm_segmentation")(
      spark,
      fixtureDir("events", rows.toDF("event_id", "ts", "user_id", "value")))
      .collect()
    assert(got.length == 5)
    got.foreach { r =>
      assert(r.getAs[Long]("r_score") == r.getAs[Long]("f_score"))
      assert(r.getAs[Long]("f_score") == r.getAs[Long]("m_score"))
      assert(r.getAs[Long]("n_users") == 1L)
    }
    assert(got.map(_.getAs[Long]("r_score")).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("cumulative users: first-seen accounting over gap days") {
    import spark.implicits._
    val d0 = 1704067200L // day boundary
    val rows = Seq(
      (1L, ts(d0 + 10), 1L), (2L, ts(d0 + 20), 2L), (3L, ts(d0 + 30), 3L),
      (4L, ts(d0 + 86400 + 10), 1L), // user 1 returns — not new
      (5L, ts(d0 + 86400 + 20), 4L),
      (6L, ts(d0 + 3 * 86400 + 5), 5L))
    val got = SparkEntry.queries("e15_cumulative_users")(
      spark, fixtureDir("events", rows.toDF("event_id", "ts", "user_id")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val day0 = d0 / 86400
    assert(got.toSeq == Seq(
      (day0, 3L, 3L), (day0 + 1, 1L, 4L), (day0 + 3, 1L, 5L)))
  }

  test("holt linear: tracks a linear ramp within truncation error") {
    import spark.implicits._
    val base = 1704067200L
    // ramp: hour h has h+1 events, 60 hours
    val rows = for {
      h <- 0 until 60; i <- 0 to h
    } yield (h.toLong * 1000 + i, ts(base + h * 3600L + i * 10L))
    val got = SparkEntry.queries("ts_holt_linear")(
      spark, fixtureDir("events", rows.toDF("event_id", "ts")))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got.size == 41) // 60 buckets − 19 warmup
    // exact Holt recursion on the same ramp (no truncation)
    var l = 1.0; var b = 0.0; var exactL = 0.0; var exactB = 0.0
    for (t <- 0 until 60) {
      val x = (t + 1).toDouble
      if (t == 0) { l = x; b = 0.0 }
      else {
        val lp = l
        l = 0.5 * x + 0.5 * (l + b)
        b = 0.5 * (l - lp) + 0.5 * b
      }
      if (t == 59) { exactL = l; exactB = b }
    }
    val (gl, gb) = got(base / 3600 + 59)
    // truncating the filter at 20 lags drops ~2^-20 of the weight mass,
    // which a ramp integrates to ~5e-4 relative level bias — the
    // documented price of the exact-portable FIR form
    assert(math.abs(gl - exactL) / exactL < 1e-3, s"level $gl vs $exactL")
    assert(math.abs(gb - exactB) < 5e-2, s"trend $gb vs $exactB")
  }

  test("pq distortion: exact codewords score zero, off-axis the closed form") {
    import spark.implicits._
    val books: Array[Array[Array[Double]]] =
      Array(Array(Array(1.0, 0.0), Array(0.0, 1.0)))
    val vecs = Seq(
      0L -> Array(2.0f, 0.0f), // normalizes onto codeword 0 → err 0
      1L -> Array(0.0f, 3.0f), // codeword 1 → err 0
      2L -> Array(1.0f, 1.0f)) // 45° → err 2 − √2
    val got = graft.operators.Pq.distortion(
      vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
      graft.operators.Pq.Model(books)).collect().head
    assert(got.getAs[Long]("n_vecs") == 3L)
    val off = 2.0 - math.sqrt(2.0)
    assert(math.abs(got.getAs[Double]("max_sq_err") - off) < 1e-8)
    assert(math.abs(got.getAs[Double]("avg_sq_err") - off / 3.0) < 1e-6)
  }
}
