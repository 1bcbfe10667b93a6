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
}
