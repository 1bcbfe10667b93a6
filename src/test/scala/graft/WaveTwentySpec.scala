package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Stats
import graft.operators.{Hits, Similarity}

/** Wave-20: Kuiper statistic, Welch's t-test, change-point detection,
  * HITS, truncation recall, TPC-H Q10. Each test drives the registry
  * query (or the kernel directly) against a fixture with a known
  * closed-form answer or an independent driver-side replay.
  */
class WaveTwentySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixtureDir(
      table: String, rows: org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory("graft_w20")
    rows.write.mode("overwrite").parquet(s"$dir/$table.parquet")
    dir.toString
  }

  test("kuiper: V = D+ + D- and dominates the single-sup KS D") {
    import spark.implicits._
    // asymmetric-tailed sample: normal fit misses both tails differently
    val vals = (1 to 50).map(v => v.toDouble) ++ (1 to 12).map(_ => 1.0) ++
      (1 to 3).map(_ => 300.0)
    val df = vals.toDF("l_extendedprice")
    val k = Stats.kuiper1Samp(df, "l_extendedprice").collect().head
    val dPlus = k.getAs[Double]("d_plus")
    val dMinus = k.getAs[Double]("d_minus")
    val v = k.getAs[Double]("kuiper_v")
    assert(math.abs(dPlus + dMinus - v) < 1e-12)
    val ks = Stats.ks1Samp(df, "l_extendedprice").collect().head
      .getAs[Double]("ks_d")
    assert(v >= ks - 1e-12, s"Kuiper V=$v must dominate KS D=$ks")
    assert(dPlus > 0 && dMinus > 0)
  }

  test("kuiper: shardBits and partitioning invariance (bit-equal)") {
    import spark.implicits._
    val vals = (1 to 400).map(v => math.sin(v.toDouble) * 100 + v * 0.37)
    val df = vals.toDF("l_extendedprice")
    val base = Stats.kuiper1Samp(df, "l_extendedprice", shardBits = 12)
      .collect().head
    for (bits <- Seq(1, 4); parts <- Seq(1, 7)) {
      val got = Stats
        .kuiper1Samp(df.repartition(parts), "l_extendedprice", shardBits = bits)
        .collect().head
      assert(got == base, s"shardBits=$bits parts=$parts diverged")
    }
  }

  test("welch: identical groups score t = 0 with zero mean difference") {
    import spark.implicits._
    val rows = for (f <- Seq("A", "R"); v <- 1 to 20)
      yield (f, v.toDouble * 3.5)
    val got = SparkEntry.queries("stat_welch_ttest")(
      spark,
      fixtureDir("lineitem", rows.toDF("l_returnflag", "l_extendedprice")))
      .collect().head
    assert(got.getAs[Long]("n1") == 20L && got.getAs[Long]("n2") == 20L)
    assert(math.abs(got.getAs[Double]("mean_diff")) < 1e-12)
    assert(math.abs(got.getAs[Double]("t_stat")) < 1e-12)
    assert(math.abs(got.getAs[Double]("df") - 38.0) < 1e-9) // equal vars → n1+n2−2
  }

  test("welch: hand fixture matches an independent driver-side replay") {
    import spark.implicits._
    val a = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 9.0)
    val r = Seq(2.0, 4.0, 6.0)
    val rows = a.map("A" -> _) ++ r.map("R" -> _)
    val got = SparkEntry.queries("stat_welch_ttest")(
      spark,
      fixtureDir("lineitem", rows.toDF("l_returnflag", "l_extendedprice")))
      .collect().head
    def mv(xs: Seq[Double]) = {
      val n = xs.size.toDouble
      val m = xs.sum / n
      (n, m, xs.map(x => (x - m) * (x - m)).sum / (n - 1))
    }
    val (n1, m1, v1) = mv(a); val (n2, m2, v2) = mv(r)
    val se = v1 / n1 + v2 / n2
    val t = (m1 - m2) / math.sqrt(se)
    val dfW = se * se / (math.pow(v1 / n1, 2) / (n1 - 1) +
      math.pow(v2 / n2, 2) / (n2 - 1))
    assert(math.abs(got.getAs[Double]("t_stat") - t) < 1e-9)
    assert(math.abs(got.getAs[Double]("df") - dfW) < 1e-9)
  }

  test("changepoint: planted level shift is found at the exact boundary") {
    import spark.implicits._
    // 24 hours at 5 events/hour, then 24 hours at 15/hour
    val base = 1704067200L // 2024-01-01T00:00:00Z
    val rows = for {
      h <- 0 until 48
      i <- 0 until (if (h < 24) 5 else 15)
    } yield new Timestamp((base + h * 3600L + i * 60L) * 1000L)
    val got = SparkEntry.queries("ts_changepoint")(
      spark, fixtureDir("events", rows.toDF("ts"))).collect().head
    assert(got.getAs[Long]("k_left") == 24L)
    assert(got.getAs[Long]("split_bucket") == base / 3600 + 23)
    assert(got.getAs[Long]("n_buckets") == 48L)
    assert(math.abs(got.getAs[Double]("mean_left") - 5.0) < 1e-12)
    assert(math.abs(got.getAs[Double]("mean_right") - 15.0) < 1e-12)
  }

  test("hits: shared authority outranks exclusive; pointing wider hubs higher") {
    import spark.implicits._
    // custs 1,2,3 all → supp 10; cust 1 additionally → supp 11
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 11L))
      .toDF("src", "dst")
    val got = Hits.fixedPoint(edges, iters = 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(10L)._1 > got(11L)._1, "supplier with 3 in-edges must out-auth")
    assert(got(1L)._2 > got(2L)._2, "the 2-edge hub must out-hub the 1-edge hubs")
    assert(got(2L)._2 == got(3L)._2, "symmetric hubs must tie exactly")
    assert(got(1L)._1 == 0L && got(10L)._2 == 0L, "pure roles carry zero cross-mass")
    // quotient renormalization bounds total mass in [Scale/2, 2·Scale):
    // q = total div Scale is 1 for anything under 2×Scale, so mass may sit
    // anywhere in that band — bounded, never runaway
    val totAuth = got.values.map(_._1).sum
    assert(totAuth < 2L * Hits.Scale && totAuth > Hits.Scale / 2)
  }

  test("hits: sparse iteration matches a hand-rolled dense replay exactly") {
    import spark.implicits._
    // path 1→2→3 plus 4→2: node 3 is a pure authority (its hub mass dies
    // to 0 after round 1) and nodes 1/4 are pure hubs (auth stays 0) —
    // mass leaves the sparse iteration's relations mid-run and must come
    // back in the output as exact zeros. The replay below is the
    // pre-sparse dense formulation (explicit zero rows every round).
    val es = Seq((1L, 2L), (2L, 3L), (4L, 2L))
    val iters = 5
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    val s = Hits.Scale
    var h = nodes.map(_ -> s / nodes.length).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 1 to iters) {
      val rawA = es.groupBy(_._2).map { case (d, g) => d -> g.map(e => h(e._1)).sum }
      val qA = math.max(rawA.values.sum / s, 1L)
      a = nodes.map(n => n -> rawA.getOrElse(n, 0L) / qA).toMap
      val rawH = es.groupBy(_._1).map { case (src, g) => src -> g.map(e => a(e._2)).sum }
      val qH = math.max(rawH.values.sum / s, 1L)
      h = nodes.map(n => n -> rawH.getOrElse(n, 0L) / qH).toMap
    }
    val got = Hits.fixedPoint(es.toDF("src", "dst"), iters = iters).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == nodes.toSet, "output must stay node-dense")
    nodes.foreach { n => assert(got(n) == ((a(n), h(n))), s"node $n diverged") }
  }

  test("hits: degree overflow guard fails loudly; passing graphs unaffected") {
    import spark.implicits._
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 11L))
      .toDF("src", "dst")
    // node 10 has (in+out) degree 3 — a bound of 2 must fail IN-PLAN
    val e = intercept[Exception] {
      Hits.fixedPoint(edges, iters = 2, maxDegree = 2L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("HITS overflow guard")), e.getMessage)
    // the same graph under the default bound computes normally
    assert(Hits.fixedPoint(edges, iters = 2).count() == 5L)
  }

  test("hits: complete bipartite graph ties all masses exactly") {
    import spark.implicits._
    val edges = (for (c <- 1L to 2L; s <- 10L to 11L) yield (c, s))
      .toDF("src", "dst")
    val got = Hits.fixedPoint(edges, iters = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(10L) == got(11L) && got(1L) == got(2L))
  }

  test("truncation recall: zero-padded tail makes the prefix cut lossless") {
    import spark.implicits._
    // info entirely in the first 2 dims; dims 3-4 are zero
    val vecs = Seq(
      0L -> Array(1.0f, 0.0f, 0.0f, 0.0f),
      1L -> Array(0.9f, 0.1f, 0.0f, 0.0f),
      2L -> Array(0.5f, 0.5f, 0.0f, 0.0f),
      3L -> Array(0.0f, 1.0f, 0.0f, 0.0f),
      4L -> Array(-1.0f, 0.0f, 0.0f, 0.0f),
      5L -> Array(0.7f, 0.3f, 0.0f, 0.0f))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity
      .truncationRecall(df, "vec_id", "embedding", Seq(0L, 3L), truncDims = 2, k = 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("recall")).toMap
    assert(got(0L) == 1.0 && got(3L) == 1.0)
  }

  test("truncation recall: discriminating tail degrades the prefix cut") {
    import spark.implicits._
    // prefix identical everywhere; only dims 3-4 discriminate
    val vecs = Seq(
      0L -> Array(1.0f, 1.0f, 1.0f, 0.0f),
      1L -> Array(1.0f, 1.0f, 0.9f, 0.1f),
      2L -> Array(1.0f, 1.0f, -1.0f, 0.3f),
      3L -> Array(1.0f, 1.0f, -0.9f, 0.5f),
      4L -> Array(1.0f, 1.0f, 0.8f, -0.2f),
      5L -> Array(1.0f, 1.0f, -0.5f, -0.9f))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity
      .truncationRecall(df, "vec_id", "embedding", Seq(0L), truncDims = 2, k = 3)
      .collect().head
    // truncated cosines all tie at 1.0 → id-order cut {0,1,2}; full top-3 is
    // {0,1,4} → exactly 2 survive
    assert(got.getAs[Long]("n_hits") == 2L)
  }
}
