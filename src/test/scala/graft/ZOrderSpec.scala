package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Average per-file span of `c`, normalized by the global span — 1.0
    * means every file covers the whole value range (no pruning possible),
    * small means parquet min/max stats make files skippable.
    */
  private def avgSpan(path: String, c: String): Double = {
    val df = spark.read.parquet(path)
    val g = df.agg((max(col(c)) - min(col(c))).as("s")).collect().head.getDouble(0)
    val spans = df.groupBy(input_file_name())
      .agg((max(col(c)) - min(col(c))).as("s"))
      .collect().map(_.getDouble(1))
    spans.sum / spans.length / g
  }

  test("z-ordered layout keeps BOTH dimensions narrow per file") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder")
    val natural = dir.resolve("natural").toString
    val zord = dir.resolve("zorder").toString
    li.repartition(8).write.parquet(natural) // hash layout: no locality
    val zv = ZOrder.zValue(
      col("l_quantity"), 1, 51, col("l_extendedprice"), 900, 105000, bits = 12)
    ZOrder.clusterBy(li, zv, partitions = 8).write.parquet(zord)
    // same rows either way
    assert(spark.read.parquet(zord).count() == li.count())
    val (nq, np) = (avgSpan(natural, "l_quantity"), avgSpan(natural, "l_extendedprice"))
    val (zq, zp) = (avgSpan(zord, "l_quantity"), avgSpan(zord, "l_extendedprice"))
    // hash layout: every file spans ~the full range of both dims
    assert(nq > 0.9 && np > 0.9, s"natural spans q=$nq p=$np")
    // z-order: BOTH dims substantially narrower per file
    assert(zq < 0.6 && zp < 0.6, s"zorder spans q=$zq p=$zp")
  }

  // ---- r12: the layout_zorder maintenance pass (data-driven bounds,
  // dialect-shared texts) and its read-side pruning contract

  private val Bits = 8
  private val BucketBits = 4

  private def zBucketed = {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val b = li.agg(
      min("l_extendedprice").as("mnx"), max("l_extendedprice").as("mxx"),
      min("l_quantity").as("mny"), max("l_quantity").as("mxy"))
    li.select(col("l_extendedprice").as("x"), col("l_quantity").as("y"))
      .crossJoin(broadcast(b))
      .select(
        col("x"), col("y"),
        ZOrder.bucketize("x", "mnx", "mxx", Bits).as("bx"),
        ZOrder.bucketize("y", "mny", "mxy", Bits).as("by"))
      .select(
        col("x"), col("y"), col("bx"), col("by"),
        ZOrder.interleave("bx", "by", Bits).as("z"))
      .withColumn("zbucket", ZOrder.bucketOf("z", Bits, BucketBits))
  }

  test("interleave text round-trips: bucket of z recovers the top bits of both dims") {
    val rows = zBucketed.select("bx", "by", "zbucket").distinct().collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (bx, by, zb) = (r.getLong(0), r.getLong(1), r.getLong(2))
      var decodedX = 0L; var decodedY = 0L
      (0 until BucketBits).foreach { i =>
        decodedX |= ((zb >> (2 * i)) & 1L) << i
        decodedY |= ((zb >> (2 * i + 1)) & 1L) << i
      }
      assert(decodedX == (bx >> (Bits - BucketBits)), s"bx=$bx zb=$zb")
      assert(decodedY == (by >> (Bits - BucketBits)), s"by=$by zb=$zb")
    }
  }

  test("a second-dimension stripe touches ~1/16 of z-buckets; an x-sorted layout reads all") {
    val df = zBucketed.cache()
    try {
      // the stripe: one of the 16 top-level y-slices (quantity band)
      val stripe = df.filter(col("by") >= 16 && col("by") < 32) // y-slice 1 of 16
      assert(stripe.count() > 0, "stripe empty — fixture drifted")
      val total = df.select("zbucket").distinct().count()
      val touchedZ = stripe.select("zbucket").distinct().count()
      // z-order: the y-stripe crosses one y-row of the 16x16 bucket
      // grid → at most 16 buckets
      assert(touchedZ <= 16, s"z-order touched $touchedZ buckets")
      // x-sorted layout: bucket = top-4 x bits; the same y-stripe holds
      // quantities at EVERY price, so it touches (almost) every bucket
      val touchedX = stripe.select((col("bx") / 16).cast("long")).distinct().count()
      val totalX = df.select((col("bx") / 16).cast("long")).distinct().count()
      assert(touchedX >= totalX - 1,
        s"x-layout should read ~all: touched $touchedX of $totalX")
      assert(touchedZ.toDouble / total <= 0.125,
        s"z locality too weak: $touchedZ of $total")
    } finally df.unpersist()
  }

  test("layout_zorder fails LOUDLY on a constant dimension (cross-dialect 0/0 divergence guarded)") {
    import spark.implicits._
    // constant l_quantity: Spark's ANSI 0/0 would raise a raw
    // DIVIDE_BY_ZERO while DuckDB NULLs — the in-plan bounds guard must
    // fire FIRST with the operator's own message
    val dir = java.nio.file.Files.createTempDirectory("graft_zdegen").toString
    Seq((1L, 10.0, 5.0), (2L, 20.0, 5.0), (3L, 30.0, 5.0))
      .toDF("l_orderkey", "l_extendedprice", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val e = intercept[Exception] {
      graft.queries.MaintenanceQueries.layoutZorder.run(spark, dir).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("constant columns cannot be clustered")),
      s"wrong failure: ${messages(e).take(3)}")
  }

  test("z-bucket-partitioned write prunes to exactly the candidate buckets") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder_p").toString + "/t"
    val df = zBucketed
    df.write.partitionBy("zbucket").parquet(dir)
    // reader computes the candidate buckets for the y-stripe the same
    // way the writer laid them out: y-slice 1 → the 16 buckets whose
    // odd (y) interleave bits decode to 1
    val candidates = (0 until 16).map { xb =>
      var z = 0L
      (0 until BucketBits).foreach { i =>
        z |= ((xb.toLong >> i) & 1L) << (2 * i)
        z |= ((1L >> i) & 1L) << (2 * i + 1) // y-slice index 1
      }
      z
    }
    val back = spark.read.parquet(dir)
      .filter(col("zbucket").isin(candidates: _*))
    val scans = back.queryExecution.executedPlan.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    val selected = scans.head.selectedPartitions.partitionCount
    val nonEmptyCandidates = back.select("zbucket").distinct().count()
    assert(selected <= 16, s"pruning failed: $selected partitions selected")
    assert(selected == nonEmptyCandidates.toInt,
      s"selected $selected != candidate partitions $nonEmptyCandidates")
    // and the pruned read returns every y-stripe row (no false negatives)
    val stripeRows = df.filter(col("by") >= 16 && col("by") < 32).count()
    assert(back.filter(col("by") >= 16 && col("by") < 32).count() == stripeRows)
  }
}
