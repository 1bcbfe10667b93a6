package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Stats

/** Wave-23: trimmed mean, Bartlett, share-of-parent, top-N-with-OTHERS,
  * class-balanced sampling, kNN label accuracy.
  */
class WaveTwentyThreeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixtureDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = Files.createTempDirectory("graft_w23")
    tables.foreach { case (t, rows) =>
      rows.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir.toString
  }

  test("trimmed mean: drops exactly k per end; straddling ties keep multiplicity") {
    import spark.implicits._
    val a = Stats.trimmedMean((1 to 10).map(_.toDouble).toDF("v"), "v", 0.1)
      .collect().head
    assert(a.getAs[Long]("k_trimmed") == 1L)
    assert(a.getAs[Double]("trimmed_mean") == 5.5) // mean of 2..9
    // [1,1,1,2,3] α=0.2: k=1 → keep {1,1,2} → 4/3
    val b = Stats.trimmedMean(
      Seq(1.0, 1.0, 1.0, 2.0, 3.0).toDF("v"), "v", 0.2).collect().head
    assert(math.abs(b.getAs[Double]("trimmed_mean") - 4.0 / 3.0) < 1e-12)
  }

  test("bartlett: identical group variances score exactly zero") {
    import spark.implicits._
    val rows = for (f <- Seq("A", "N", "R"); v <- 1 to 5) yield (f, v.toDouble)
    val got = SparkEntry.queries("stat_bartlett")(
      spark,
      fixtureDir("lineitem" -> rows.toDF("l_returnflag", "l_quantity")))
      .collect().head
    assert(got.getAs[Long]("n") == 15L)
    assert(got.getAs[Double]("bartlett_t") == 0.0)
  }

  test("bartlett: unequal variances match a driver-side formula replay") {
    import spark.implicits._
    val groups = Map(
      "A" -> Seq(1.0, 2.0, 3.0, 4.0, 5.0),
      "N" -> Seq(1.0, 1.0, 2.0, 2.0, 3.0, 3.0),
      "R" -> Seq(10.0, 20.0, 30.0, 40.0))
    val rows = groups.toSeq.flatMap { case (f, vs) => vs.map(f -> _) }
    val got = SparkEntry.queries("stat_bartlett")(
      spark,
      fixtureDir("lineitem" -> rows.toDF("l_returnflag", "l_quantity")))
      .collect().head
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val k = 3
    val stats = groups.values.map { vs =>
      val n = vs.size.toDouble
      val m = vs.sum / n
      (n, vs.map(x => (x - m) * (x - m)).sum / (n - 1))
    }.toSeq
    val nTot = stats.map(_._1).sum
    val sp2 = stats.map { case (n, v) => (n - 1) * v }.sum / (nTot - k)
    val tNum = (nTot - k) * r6(math.log(sp2)) -
      stats.map { case (n, v) => (n - 1) * r6(math.log(v)) }.sum
    val cFac = 1.0 + (stats.map { case (n, _) => 1.0 / (n - 1) }.sum
      - 1.0 / (nTot - k)) / (3.0 * (k - 1))
    assert(math.abs(got.getAs[Double]("bartlett_t") - tNum / cFac) < 1e-9)
  }

  test("share of parent: nation shares sum to one inside each region") {
    import spark.implicits._
    val region = Seq((0, "EU"), (1, "US")).toDF("r_regionkey", "r_name")
    val nation = Seq((0, "DE", 0), (1, "FR", 0), (2, "NY", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val supplier = Seq((10L, "s10", 0), (11L, "s11", 1), (12L, "s12", 2))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val li = Seq((10L, 30.0, 0.0), (11L, 10.0, 0.0), (12L, 50.0, 0.5))
      .toDF("l_suppkey", "l_extendedprice", "l_discount")
    val got = SparkEntry.queries("olap_share_of_parent")(
      spark, fixtureDir("region" -> region, "nation" -> nation,
        "supplier" -> supplier, "lineitem" -> li))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("revenue"), r.getAs[Double]("share"))).toMap
    assert(got("DE") == ((30.0, 0.75)) && got("FR") == ((10.0, 0.25)))
    assert(got("NY") == ((25.0, 1.0)))
  }

  test("top-N with OTHERS: tail suppliers fold into one exact bucket") {
    import spark.implicits._
    val nation = Seq((0, "DE", 0)).toDF("n_nationkey", "n_name", "n_regionkey")
    val supplier = (1 to 4)
      .map(i => (i.toLong, s"s$i", 0)).toDF("s_suppkey", "s_name", "s_nationkey")
    val li = Seq((1L, 40.0), (2L, 30.0), (3L, 20.0), (4L, 10.0))
      .toDF("l_suppkey", "l_extendedprice").withColumn("l_discount", lit(0.0))
    val got = SparkEntry.queries("olap_topn_others")(
      spark, fixtureDir("nation" -> nation, "supplier" -> supplier,
        "lineitem" -> li))
      .collect().map(r => r.getString(1) ->
        (r.getAs[Double]("revenue"), r.getAs[Long]("n_suppliers"))).toMap
    assert(got("s1") == ((40.0, 1L)) && got("s2") == ((30.0, 1L)))
    assert(got("OTHERS") == ((30.0, 2L)))
    assert(!got.contains("s3") && !got.contains("s4"))
  }

  test("balanced classes: every language keeps exactly the min class count") {
    import spark.implicits._
    val rows = (1 to 5).map(i => (i.toLong, "en")) ++
      (6 to 8).map(i => (i.toLong, "de")) ++
      (9 to 16).map(i => (i.toLong, "fr"))
    val got = SparkEntry.queries("sample_balanced_classes")(
      spark, fixtureDir("documents" -> rows.toDF("doc_id", "lang")))
      .collect()
    val byLang = got.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(byLang == Map("en" -> 3, "de" -> 3, "fr" -> 3))
    assert(got.forall(_.getAs[Long]("rank_in_stratum") <= 3L))
  }

  test("knn accuracy: separable clusters vote their own labels perfectly") {
    import spark.implicits._
    // two tight clusters along orthogonal axes, 64-dim (the registry
    // quantizer's dimensionality)
    def vec(axis: Int, eps: Float): Array[Float] = {
      val a = Array.fill(64)(0.0f); a(axis) = 1.0f; a((axis + 2) % 64) = eps; a
    }
    val rows = (0 until 4).map(i => (i.toLong, vec(0, 0.01f * (i + 1)), 7)) ++
      (4 until 8).map(i => (i.toLong, vec(1, 0.01f * (i + 1)), 9))
    val got = SparkEntry.queries("emb_knn_accuracy")(
      spark, fixtureDir("embeddings" -> rows.toDF("vec_id", "embedding", "label")))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("accuracy")).toMap
    assert(got(7L) == 1.0 && got(9L) == 1.0)
  }
}
