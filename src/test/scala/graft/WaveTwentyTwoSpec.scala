package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-22: McNemar, odds ratio, term burstiness, centroid drift,
  * time-to-convert quantiles, Benjamini–Hochberg FDR.
  */
class WaveTwentyTwoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixtureDir(
      table: String, rows: org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory("graft_w22")
    rows.write.mode("overwrite").parquet(s"$dir/$table.parquet")
    dir.toString
  }

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // discount ≥ 0.05 fires rater 1; tax ≥ 0.04 fires rater 2
  private def cell(r1: Boolean, r2: Boolean, n: Int): Seq[(Double, Double)] =
    Seq.fill(n)((if (r1) 0.06 else 0.01, if (r2) 0.05 else 0.01))

  test("mcnemar: hand 2x2 discordant cells score the textbook chi2") {
    import spark.implicits._
    val rows = cell(true, true, 5) ++ cell(true, false, 6) ++
      cell(false, true, 2) ++ cell(false, false, 7)
    val got = SparkEntry.queries("stat_mcnemar")(
      spark, fixtureDir("lineitem", rows.toDF("l_discount", "l_tax")))
      .collect().head
    assert(got.getAs[Long]("b") == 6L && got.getAs[Long]("c") == 2L)
    assert(got.getAs[Double]("chi2") == 16.0 / 8.0)
    assert(got.getAs[Double]("chi2_cc") == 9.0 / 8.0)
  }

  test("odds ratio: hand 2x2 matches the closed form and Woolf CI") {
    import spark.implicits._
    val rows = cell(true, true, 4) ++ cell(true, false, 2) ++
      cell(false, true, 1) ++ cell(false, false, 8)
    val got = SparkEntry.queries("stat_odds_ratio")(
      spark, fixtureDir("lineitem", rows.toDF("l_discount", "l_tax")))
      .collect().head
    assert(got.getAs[Double]("odds_ratio") == 16.0) // 4·8 / (2·1)
    val logOr = BigDecimal(math.log(16.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getAs[Double]("log_or") == logOr)
    val se = math.sqrt(1.0 / 4 + 1.0 / 2 + 1.0 / 1 + 1.0 / 8)
    assert(math.abs(got.getAs[Double]("ci_lo") - math.exp(logOr - 1.96 * se)) < 1e-5)
    assert(math.abs(got.getAs[Double]("ci_hi") - math.exp(logOr + 1.96 * se)) < 1e-5)
  }

  test("burstiness: uniform term scores VMR 0, concentrated term its exact ratio") {
    import spark.implicits._
    // 4 docs; "even" once per doc; "bursty" 4 times in doc 0 only
    val rows = Seq(
      (0L, "even bursty bursty bursty bursty"),
      (1L, "even"), (2L, "even"), (3L, "even"))
    val got = SparkEntry.queries("text_burstiness")(
      spark, fixtureDir("documents", rows.toDF("doc_id", "text")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got("even") == (4L, 0.0))
    // s1=4, s2=16, N=4: var = (16 − 4)/3, mean = 1 → VMR = 4
    assert(got("bursty")._1 == 1L)
    assert(math.abs(got("bursty")._2 - 4.0) < 1e-12)
  }

  test("centroid drift: identical halves cos 1, orthogonal halves cos 0") {
    import spark.implicits._
    val rows = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(2.0f, 0.0f), 0), // same direction
      (2L, Array(1.0f, 0.0f), 1), (3L, Array(0.0f, 1.0f), 1)) // orthogonal
    val got = SparkEntry.queries("emb_centroid_drift")(
      spark, fixtureDir("embeddings", rows.toDF("vec_id", "embedding", "label")))
      .collect().map(r => r.getInt(0) -> r.getAs[Double]("cos_drift")).toMap
    assert(math.abs(got(0) - 1.0) < 1e-9)
    assert(got(1) == 0.0)
  }

  test("time to convert: nearest-purchase delays at exact type-1 quantiles") {
    import spark.implicits._
    val base = 1704067200L
    val rows = Seq(
      (1L, ts(base), 1L, "click"), (2L, ts(base + 50), 1L, "purchase"),
      (3L, ts(base + 400), 1L, "purchase"), // 400 s — outside the window
      (4L, ts(base + 1000), 2L, "click"), (5L, ts(base + 1100), 2L, "purchase"),
      (6L, ts(base + 2000), 3L, "click")) // never converts
    val got = SparkEntry.queries("e16_time_to_convert")(
      spark, fixtureDir("events", rows.toDF("event_id", "ts", "user_id", "event_type")))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(got(0.5) == 50.0 && got(0.9) == 100.0 && got(0.99) == 100.0)
  }

  test("fdr: a planted rate collapse is rejected, a flat rate is not") {
    import spark.implicits._
    val base = 1704067200L
    // window [base, base+1000]: "crash" 40 events all in the first half,
    // "flat" 5+5 balanced, plus endpoints to pin the midpoint
    val rows =
      (0 until 40).map(i => ("crash", ts(base + i * 10L))) ++
        (0 until 5).map(i => ("flat", ts(base + 100 + i * 50L))) ++
        (0 until 5).map(i => ("flat", ts(base + 600 + i * 50L))) ++
        Seq(("flat", ts(base + 1000L)))
    val evs = rows.zipWithIndex.map { case ((t, x), i) => (i.toLong, x, t) }
    val got = SparkEntry.queries("stat_fdr_bh")(
      spark, fixtureDir("events", evs.toDF("event_id", "ts", "event_type")))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("p_value"), r.getAs[Boolean]("rejected"))).toMap
    assert(got("crash")._2, s"crash should be rejected: ${got("crash")}")
    assert(!got("flat")._2, s"flat should survive: ${got("flat")}")
    assert(got("crash")._1 < 1e-4 && got("flat")._1 > 0.3)
  }
}
