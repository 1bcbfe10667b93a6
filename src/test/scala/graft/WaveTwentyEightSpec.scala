package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Wave-28: TPC-H Q4/Q6/Q12/Q13/Q17/Q22 shapes — each test is a
  * hand-sized fixture where the admitted/excluded rows are enumerable
  * by eye (the proof-by-synthesis discipline).
  */
class WaveTwentyEightSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixtureDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = Files.createTempDirectory("graft_w28")
    tables.foreach { case (t, rows) =>
      rows.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir.toString
  }

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  test("q4: only in-window orders with a matching line are counted") {
    import spark.implicits._
    val orders = Seq(
      (1L, ts("1996-08-01"), "1-URGENT"), // in window, has R line ✓
      (2L, ts("1996-08-01"), "1-URGENT"), // in window, no R line ✗
      (3L, ts("1997-08-01"), "1-URGENT")) // out of window ✗
      .toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Seq((1L, "R"), (2L, "N"), (3L, "R"))
      .toDF("l_orderkey", "l_returnflag")
    val got = SparkEntry.queries("q4_order_priority")(
      spark, fixtureDir("orders" -> orders, "lineitem" -> li)).collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("1-URGENT", 1L)))
  }

  test("q6: every predicate excludes its violator") {
    import spark.implicits._
    val li = Seq(
      (ts("1996-06-01"), 0.06, 10.0, 100.0), // all pass → 6.0
      (ts("1997-06-01"), 0.06, 10.0, 100.0), // date ✗
      (ts("1996-06-01"), 0.04, 10.0, 100.0), // discount ✗
      (ts("1996-06-01"), 0.06, 30.0, 100.0)) // quantity ✗
      .toDF("l_shipdate", "l_discount", "l_quantity", "l_extendedprice")
    val got = SparkEntry.queries("q6_forecast_revenue")(
      spark, fixtureDir("lineitem" -> li)).collect().head
    assert(got.getAs[Long]("n") == 1L)
    assert(got.getAs[Double]("revenue") == 6.0)
  }

  test("q12: per-mode high/low priority split") {
    import spark.implicits._
    val orders = Seq((1L, "1-URGENT"), (2L, "5-LOW"))
      .toDF("o_orderkey", "o_orderpriority")
    val li = Seq(
      (1L, "A", ts("1996-02-01")), // A × high
      (2L, "A", ts("1996-02-01")), // A × low
      (1L, "R", ts("1996-02-01")), // R × high
      (1L, "N", ts("1996-02-01")), // mode excluded
      (2L, "A", ts("1997-02-01"))) // year excluded
      .toDF("l_orderkey", "l_returnflag", "l_shipdate")
    val got = SparkEntry.queries("q12_ship_priority")(
      spark, fixtureDir("orders" -> orders, "lineitem" -> li)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("A", 1L, 1L), ("R", 1L, 0L)))
  }

  test("q13: zero-order customers keep their 0 bucket") {
    import spark.implicits._
    val cust = Seq(1L, 2L, 3L).toDF("c_custkey")
    val orders = Seq(
      (10L, 1L, "1-URGENT"), (11L, 1L, "2-HIGH"), // cust 1: 2 counted
      (12L, 1L, "5-LOW"),                         // filtered by join pred
      (13L, 2L, "5-LOW"))                         // cust 2 → 0 bucket
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val got = SparkEntry.queries("q13_custdist")(
      spark, fixtureDir("customer" -> cust, "orders" -> orders)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(0L -> 2L, 2L -> 1L))
  }

  test("q17: only lines under 20% of their part's average quantity") {
    import spark.implicits._
    val part = Seq((1L, "Brand#1"), (2L, "Brand#9")).toDF("p_partkey", "p_brand")
    val li = Seq(
      (1L, 1.0, 70.0),    // avg qty part1 = 7 → thresh 1.4 → admitted
      (1L, 10.0, 999.0),  // over thresh ✗
      (1L, 10.0, 999.0),  // over thresh ✗
      (2L, 0.1, 999.0))   // wrong brand ✗
      .toDF("l_partkey", "l_quantity", "l_extendedprice")
    val got = SparkEntry.queries("q17_small_qty_revenue")(
      spark, fixtureDir("part" -> part, "lineitem" -> li)).collect().head
    assert(got.getAs[Long]("n") == 1L)
    assert(got.getAs[Double]("avg_yearly") == 10.0)
  }

  test("q7: only the nation pair's rows, split by direction and year") {
    import spark.implicits._
    val nation = Seq((1, "NATION_1"), (2, "NATION_2"), (3, "NATION_3"))
      .toDF("n_nationkey", "n_name")
    val supplier = Seq((10L, 1), (11L, 2), (12L, 3))
      .toDF("s_suppkey", "s_nationkey")
    val customer = Seq((20L, 2), (21L, 1), (22L, 3))
      .toDF("c_custkey", "c_nationkey")
    val orders = Seq((100L, 20L), (101L, 21L), (102L, 22L))
      .toDF("o_orderkey", "o_custkey")
    val li = Seq(
      (100L, 10L, ts("1996-05-01"), 10.0, 0.0), // N1 → N2, 1996 ✓
      (101L, 11L, ts("1997-05-01"), 20.0, 0.0), // N2 → N1, 1997 ✓
      (102L, 10L, ts("1996-05-01"), 999.0, 0.0), // N1 → N3 ✗
      (100L, 10L, ts("1995-05-01"), 999.0, 0.0)) // date ✗
      .toDF("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    val got = SparkEntry.queries("q7_nation_volume")(
      spark, fixtureDir("nation" -> nation, "supplier" -> supplier,
        "customer" -> customer, "orders" -> orders, "lineitem" -> li))
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq(
      ("NATION_1", "NATION_2", 1996L, 10.0),
      ("NATION_2", "NATION_1", 1997L, 20.0)))
  }

  test("q15: argmax keeps ties, drops the rest") {
    import spark.implicits._
    val supplier = Seq((1L, "s1"), (2L, "s2"), (3L, "s3"))
      .toDF("s_suppkey", "s_name")
    val li = Seq(
      (1L, ts("1996-02-01"), 50.0, 0.0),
      (2L, ts("1996-02-01"), 30.0, 0.0),
      (2L, ts("1996-02-01"), 20.0, 0.0),  // supplier 2 also totals 50
      (3L, ts("1996-02-01"), 10.0, 0.0),  // below max
      (1L, ts("1997-02-01"), 999.0, 0.0)) // out of quarter
      .toDF("l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    val got = SparkEntry.queries("q15_top_supplier")(
      spark, fixtureDir("supplier" -> supplier, "lineitem" -> li))
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 50.0), (2L, 50.0)))
  }

  test("kaplan-meier: hand-computed curve with censoring at the horizon") {
    import spark.implicits._
    // 4 users, first event at epoch-hour 0. A purchases at hour 1,
    // B at hour 2, C at hour 100 (≥72 → censored at 72), D never
    // (censored at 72). Curve: t=1: n=4,d=1,S=3/4; t=2: n=3,d=1,S=1/2;
    // t=72: n=2,c=2,S unchanged.
    def e(u: Long, h: Long, t: String) =
      (u, Timestamp.from(java.time.Instant.ofEpochSecond(h * 3600)), t)
    val ev = Seq(
      e(1, 0, "view"), e(1, 1, "purchase"),
      e(2, 0, "view"), e(2, 2, "purchase"),
      e(3, 0, "view"), e(3, 100, "purchase"),
      e(4, 0, "view"), e(4, 110, "click"))
      .toDF("user_id", "ts", "event_type")
      .withColumn("event_id", col("user_id"))
    val got = SparkEntry.queries("e19_kaplan_meier")(
      spark, fixtureDir("events" -> ev)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == Seq(
      (1L, 4L, 1L, 0L, 0.75),
      (2L, 3L, 1L, 0L, 0.5),
      (72L, 2L, 0L, 2L, 0.5)), s"$got")
  }

  test("mann-kendall: strictly increasing series has S = all pairs, z > 0") {
    import spark.implicits._
    // 4 hourly buckets with counts 1,2,3,4 → S = 6 pairs, no ties:
    // var = 4*3*13/18 = 8.667, z = 5/sqrt(var)
    val rows = for (h <- 0 until 4; i <- 0 to h) yield
      (h.toLong * 10 + i,
        Timestamp.from(java.time.Instant.ofEpochSecond(h * 3600L + i)), "view")
    val ev = rows.toDF("event_id", "ts", "event_type")
      .withColumn("user_id", col("event_id"))
    val got = SparkEntry.queries("stat_mann_kendall")(
      spark, fixtureDir("events" -> ev)).collect().head
    assert(got.getAs[Long]("n_buckets") == 4L)
    assert(got.getAs[Long]("s_stat") == 6L)
    val varS = 4.0 * 3 * 13 / 18.0
    assert(got.getAs[Double]("var_s") == varS)
    assert(got.getAs[Double]("z") == 5.0 / math.sqrt(varS))
  }

  test("containment: embedded short doc scores ~1 where jaccard misses it") {
    import spark.implicits._
    // doc 2 is a verbatim slice of doc 1: containment(2→1) = 1.0 while
    // jaccard = |A∩B|/|A∪B| stays far below any high threshold
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val short = (11 to 16).map(i => s"w$i").mkString(" ")
    val docsDf = Seq((1L, long), (2L, short), (3L, "x y z q r s t u"))
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup
      .containmentPairs(docsDf, "doc_id", "text", k = 3, threshold = 0.8)
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1)) == ((1L, 2L)))
    assert(r.getDouble(4) == 1.0) // cont_b: all of doc 2's shingles in doc 1
    val jac = graft.operators.Dedup
      .jaccardPairs(docsDf, "doc_id", "text", k = 3, threshold = 0.8)
    assert(jac.count() == 0L, "jaccard at the same threshold must miss it")
  }

  test("page-hinkley: a step change raises ph; flat series stays at zero") {
    import spark.implicits._
    // 10 hours at 2 events, then 10 hours at 30: mean shifts up hard
    val rows = for {
      h <- 0 until 20
      i <- 0 until (if (h < 10) 2 else 30)
    } yield (h.toLong * 100 + i,
      Timestamp.from(java.time.Instant.ofEpochSecond(h * 3600L + i)), "view")
    val ev = rows.toDF("event_id", "ts", "event_type")
      .withColumn("user_id", col("event_id"))
    val got = SparkEntry.queries("stat_page_hinkley")(
      spark, fixtureDir("events" -> ev)).collect()
    val ph = got.map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got.length == 20)
    // during the flat prefix the statistic hovers near zero...
    assert(math.abs(ph(ph.keys.min + 5)) < 3.0, s"$ph")
    // ...and the final ph reflects the accumulated positive drift
    assert(ph(ph.keys.max) > 50.0, s"$ph")
    assert(got.last.getBoolean(4), "alarm must fire after the step")
  }

  test("dunn post-hoc: symmetric groups give symmetric z, equal groups z=0") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("stat_dunn_posthoc")(spark, dir).collect()
    assert(got.length == 3)
    // each pair's z is finite and the pair labels are ordered
    got.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(!r.getDouble(4).isNaN && !r.getDouble(4).isInfinite)
    }
  }

  test("benjamini-yekutieli is never less conservative than BH") {
    val dir = "/root/testdata/sf0.001"
    val bh = SparkEntry.queries("stat_fdr_bh")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getBoolean(4)).toMap
    val by = SparkEntry.queries("stat_fdr_by")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getBoolean(5)).toMap
    // BY's threshold divides by c(m) ≥ 1: anything BY rejects, BH must too
    by.foreach { case (t, rej) => if (rej) assert(bh(t), s"$t: BY rejected but BH did not") }
  }

  private def knuthArm(id: Long): Long =
    (id + 7) % 100000 * 2654435761L % 4294967296L % 2

  test("ab conversion z: hand split with full-vs-zero conversion") {
    import spark.implicits._
    // pick 2 ids per arm deterministically from the production hash
    val arm0 = (1L to 100L).filter(knuthArm(_) == 0).take(2)
    val arm1 = (1L to 100L).filter(knuthArm(_) == 1).take(2)
    def e(u: Long, h: Long, t: String, id: Long) =
      (id, u, Timestamp.from(java.time.Instant.ofEpochSecond(h * 3600)), t)
    // arm0 users purchase at hour 1 (< 24h); arm1 users never purchase
    val rows = arm0.zipWithIndex.flatMap { case (u, i) =>
      Seq(e(u, 0, "view", i * 10 + 1), e(u, 1, "purchase", i * 10 + 2))
    } ++ arm1.zipWithIndex.flatMap { case (u, i) =>
      Seq(e(u, 0, "view", 100 + i * 10 + 1), e(u, 5, "click", 100 + i * 10 + 2))
    }
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type")
    val got = SparkEntry.queries("ab_conversion_z")(
      spark, fixtureDir("events" -> ev)).collect().head
    assert(got.getAs[Long]("n0") == 2L && got.getAs[Long]("x0") == 2L)
    assert(got.getAs[Long]("n1") == 2L && got.getAs[Long]("x1") == 0L)
    // p = 1/2 → z = (1 − 0)/√(0.25·(1/2+1/2)·... ) = 1/√0.25 = 2
    assert(got.getAs[Double]("z") == 2.0, s"z=${got.getAs[Double]("z")}")
  }

  test("ab cuped: a perfect covariate equalizes the adjusted means") {
    import spark.implicits._
    // every user's pre mass equals their post mass exactly → θ = 1 and
    // mean_adj collapses to the global pre mean in BOTH arms
    val users = (1L to 200L).filter(knuthArm(_) == 0).take(3) ++
      (1L to 200L).filter(knuthArm(_) == 1).take(3)
    def e(u: Long, h: Long, v: Double, id: Long) =
      (id, u, Timestamp.from(java.time.Instant.ofEpochSecond(h * 3600)), "view", v)
    val rows = users.zipWithIndex.flatMap { case (u, i) =>
      val v = 10.0 + u % 7 // distinct masses so var(pre) > 0
      Seq(e(u, 0, v, i * 10 + 1), e(u, 10, v, i * 10 + 2))
    }
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = SparkEntry.queries("ab_cuped")(
      spark, fixtureDir("events" -> ev)).collect()
    assert(got.length == 2)
    val adj = got.map(r => r.getAs[Double]("mean_adj"))
    assert(math.abs(adj(0) - adj(1)) < 1e-9, s"adjusted means ${adj.toSeq}")
    // and the unadjusted post means differ (the adjustment did the work)
    val post = got.map(r => r.getAs[Double]("mean_post"))
    assert(math.abs(post(0) - post(1)) > 1e-9, s"post means ${post.toSeq}")
  }

  test("q8: market share is the target nation's fraction of in-scope volume") {
    import spark.implicits._
    val nation = Seq((1, "NATION_3", 2), (2, "NATION_5", 2), (3, "NATION_9", 0))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val region = Seq((2, "ASIA"), (0, "AFRICA")).toDF("r_regionkey", "r_name")
    val part = Seq((1L, "ECONOMY"), (2L, "PROMO")).toDF("p_partkey", "p_type")
    val supplier = Seq((10L, 1), (11L, 2)).toDF("s_suppkey", "s_nationkey")
    val customer = Seq((20L, 1), (21L, 3)).toDF("c_custkey", "c_nationkey")
    val orders = Seq(
      (100L, 20L, ts("1996-05-01")),  // ASIA customer
      (101L, 21L, ts("1996-05-01")))  // AFRICA customer — out of scope
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val li = Seq(
      (100L, 1L, 10L, 30.0, 0.0), // NATION_3 supplier → numerator + denom
      (100L, 1L, 11L, 70.0, 0.0), // NATION_5 supplier → denom only
      (100L, 2L, 10L, 999.0, 0.0), // wrong part type ✗
      (101L, 1L, 10L, 999.0, 0.0)) // AFRICA customer ✗
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    val got = SparkEntry.queries("q8_market_share")(
      spark, fixtureDir("nation" -> nation, "region" -> region, "part" -> part,
        "supplier" -> supplier, "customer" -> customer, "orders" -> orders,
        "lineitem" -> li)).collect()
    assert(got.length == 1)
    assert(got.head.getLong(0) == 1996L)
    assert(got.head.getDouble(1) == 0.3)
    assert(got.head.getLong(2) == 2L)
  }

  test("wilcoxon signed-rank: hand-ranked paired differences") {
    import spark.implicits._
    // users with (pre, post) masses via events at hour 0 (pre) and a
    // post-midpoint hour. Diffs: +1, +2, -3, +4 → |d| ranks 1,2,3,4 →
    // W+ = 1 + 2 + 4 = 7, n = 4
    def e(u: Long, h: Long, v: Double, id: Long) =
      (id, u, Timestamp.from(java.time.Instant.ofEpochSecond(h * 3600)), "view", v)
    val spec = Seq((1L, 10.0, 11.0), (2L, 10.0, 12.0), (3L, 10.0, 7.0), (4L, 10.0, 14.0))
    val rows = spec.zipWithIndex.flatMap { case ((u, pre, post), i) =>
      Seq(e(u, 0, pre, i * 10 + 1), e(u, 10, post, i * 10 + 2))
    }
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = SparkEntry.queries("stat_wilcoxon_signed_rank")(
      spark, fixtureDir("events" -> ev)).collect().head
    assert(got.getAs[Long]("n") == 4L)
    assert(got.getAs[Double]("w_plus") == 7.0)
    val mu = 4.0 * 5 / 4.0
    val sd = math.sqrt(4.0 * 5 * 9 / 24.0)
    assert(got.getAs[Double]("z") == (7.0 - mu) / sd)
  }

  test("cluster sizes: two planted dup pairs and a singleton tail") {
    import spark.implicits._
    val a = (1 to 20).map(i => s"a$i").mkString(" ")
    val b = (1 to 20).map(i => s"b$i").mkString(" ")
    val docsDf = Seq(
      (1L, a), (2L, a),          // pair cluster
      (3L, b), (4L, b),          // pair cluster
      (5L, "solo text one x y z q w"), (6L, "another lonely doc p r s t u"))
      .toDF("doc_id", "text")
    val got = SparkEntry.queries("dedup_cluster_sizes")(
      spark, fixtureDir("documents" -> docsDf)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L), s"$got")
  }

  test("basket lift: co-occurrence beyond solo frequency, dup lines collapse") {
    import spark.implicits._
    val part = Seq((1L, "BA"), (2L, "BB"), (3L, "BC"))
      .toDF("p_partkey", "p_brand")
    // orders: {BA,BB}, {BA,BB}, {BA,BC}, {BC} — BA+BB co-occur 2 of 4;
    // the duplicate BA line in order 100 must not double-count
    val li = Seq(
      (100L, 1L), (100L, 1L), (100L, 2L),
      (101L, 1L), (101L, 2L),
      (102L, 1L), (102L, 3L),
      (103L, 3L))
      .toDF("l_orderkey", "l_partkey")
    val got = SparkEntry.queries("olap_basket_lift")(
      spark, fixtureDir("part" -> part, "lineitem" -> li)).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // BA: 3 orders, BB: 2, BC: 2, n = 4
    assert(got(("BA", "BB")) == ((2L, 2.0 / 3.0, 2.0 * 4 / (3 * 2))))
    assert(got(("BA", "BC")) == ((1L, 1.0 / 3.0, 1.0 * 4 / (3 * 2))))
    assert(!got.contains(("BB", "BC")))
  }

  test("stream sessionize twin: session_window merges exactly at the gap rule") {
    import spark.implicits._
    // user 1: events at 0s and 100s merge (gap < 1800); 2000s starts a
    // new session (2000 − 100 ≥ 1800 fails the strict-overlap merge)
    val ev = Seq(
      (1L, 1L, Timestamp.from(java.time.Instant.ofEpochSecond(0))),
      (2L, 1L, Timestamp.from(java.time.Instant.ofEpochSecond(100))),
      (3L, 1L, Timestamp.from(java.time.Instant.ofEpochSecond(2000))),
      (4L, 2L, Timestamp.from(java.time.Instant.ofEpochSecond(50))))
      .toDF("event_id", "user_id", "ts")
      .withColumn("event_type", org.apache.spark.sql.functions.lit("view"))
    val got = SparkEntry.queries("stream_sessionize_monitor")(
      spark, fixtureDir("events" -> ev)).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toInstant.getEpochSecond,
        r.getTimestamp(2).toInstant.getEpochSecond, r.getLong(3))).toSet
    assert(got == Set(
      (1L, 0L, 1900L, 2L),     // [0,100] + 1800
      (1L, 2000L, 3800L, 1L),
      (2L, 50L, 1850L, 1L)), s"$got")
  }

  test("granger: a perfect one-hour lead dominates own history") {
    import spark.implicits._
    // views v_h lead purchases: p_h = v_{h-1}, with one +1 deviation so
    // the unrestricted RSS is positive but tiny → large F
    val v = Seq(1, 3, 2, 4, 1, 5, 2, 3, 4, 2)
    val rows = scala.collection.mutable.ListBuffer.empty[(Long, Long, Timestamp, String)]
    var id = 0L
    for (h <- v.indices; i <- 0 until v(h)) {
      id += 1
      rows += ((id, id, Timestamp.from(java.time.Instant.ofEpochSecond(h * 3600L + i)), "view"))
    }
    for (h <- 1 to v.length; i <- 0 until (v(h - 1) + (if (h == 4) 1 else 0))) {
      id += 1
      rows += ((id, id, Timestamp.from(java.time.Instant.ofEpochSecond(h * 3600L + 60 + i)), "purchase"))
    }
    val ev = rows.toSeq.toDF("event_id", "user_id", "ts", "event_type")
    val got = SparkEntry.queries("ts_granger")(
      spark, fixtureDir("events" -> ev)).collect().head
    assert(got.getAs[Double]("rss_u") < got.getAs[Double]("rss_r"))
    assert(got.getAs[Double]("f_stat") > 10.0,
      s"f=${got.getAs[Double]("f_stat")}")
  }

  test("stream quantile twin: exact envelope + in-range monotone sketch") {
    import spark.implicits._
    val ev = (1 to 10).map(i =>
      (i.toLong, 1L, Timestamp.from(java.time.Instant.ofEpochSecond(30L + i)),
        "view", i.toDouble))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = SparkEntry.queries("stream_quantile_monitor")(
      spark, fixtureDir("events" -> ev)).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Double]("vmin") == 1.0 && r.getAs[Double]("vmax") == 10.0)
    assert(r.getAs[Boolean]("sketch_ok"))
  }

  test("active users: trailing windows count distinct, stickiness = dau/mau") {
    import spark.implicits._
    // user 1 active days 0 and 8; user 2 active day 8 only
    def e(u: Long, day: Long, id: Long) =
      (id, u, Timestamp.from(java.time.Instant.ofEpochSecond(day * 86400 + 10)), "view")
    val ev = Seq(e(1, 0, 1), e(1, 8, 2), e(2, 8, 3))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = SparkEntry.queries("e20_active_users")(
      spark, fixtureDir("events" -> ev)).collect()
      .map(r => r.getLong(0) % 100000 -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val d0 = got.keys.min
    // day 0: dau 1, wau 1, mau 1; day 8: dau 2, wau 2 (day 0 out of the
    // 7-day window), mau 2 (day 0 user counted once)
    assert(got(d0) == ((1L, 1L, 1L)), s"$got")
    assert(got(d0 + 8) == ((2L, 2L, 2L)), s"$got")
  }

  test("holm: step-down stops at the first failure") {
    val dir = "/root/testdata/sf0.001"
    val holm = SparkEntry.queries("stat_holm")(spark, dir).collect()
      .map(r => r.getLong(3) -> r.getBoolean(4)).toMap
    // rejections must be a PREFIX of the rank order (the step-down law)
    val ranks = holm.keys.toSeq.sorted
    val firstAccept = ranks.find(r => !holm(r)).getOrElse(ranks.max + 1)
    ranks.foreach { r => assert(holm(r) == (r < firstAccept), s"$holm") }
  }

  test("q22: above-average lapsed customers only, avg over positive balances") {
    import spark.implicits._
    val cust = Seq(
      (1L, 1, 10.0),  // below avg ✗
      (2L, 1, 30.0),  // above avg, old order only ✓
      (3L, 1, 40.0),  // above avg but recent order ✗
      (4L, 1, -5.0),  // negative: excluded from avg and below it ✗
      (5L, 9, 99.0))  // nation outside the set ✗
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
    val orders = Seq(
      (20L, 2L, ts("1999-05-01")),  // old — cust 2 stays lapsed
      (21L, 3L, ts("2000-05-01")))  // recent — cust 3 excluded
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    // avg over positive balances in nations 1-5: (10+30+40)/3 = 26.67
    val got = SparkEntry.queries("q22_global_sales")(
      spark, fixtureDir("customer" -> cust, "orders" -> orders)).collect()
    assert(got.length == 1)
    assert(got.head.getInt(0) == 1)
    assert(got.head.getLong(1) == 1L)
    assert(got.head.getDouble(2) == 30.0)
  }
}
