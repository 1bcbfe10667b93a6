package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Resample

class ResampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tsAt(bucket: Long, offsetS: Long = 1): Timestamp =
    new Timestamp((bucket * 60 + offsetS) * 1000L)

  test("gaps fill linearly between nearest observed neighbors, per key") {
    import spark.implicits._
    // key a: observed at buckets 0 (v=1) and 3 (v=4) → 1,2 interpolate to
    // 2.0, 3.0; key b: a single bucket — no gap, no interpolation row
    val rows = Seq(
      ("a", tsAt(0), 1.0), ("a", tsAt(3), 4.0),
      ("b", tsAt(7), 9.0))
    val out = Resample
      .linearInterpolate(rows.toDF("k", "ts", "v"), "k", col("ts"), col("v"), 60L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(out === Map(
      ("a", 0L) -> (1.0, true), ("a", 1L) -> (2.0, false),
      ("a", 2L) -> (3.0, false), ("a", 3L) -> (4.0, true),
      ("b", 7L) -> (9.0, true)))
  }

  test("observed buckets average multiple rows; span endpoints stay observed") {
    import spark.implicits._
    val rows = Seq(
      ("a", tsAt(0, 1), 2.0), ("a", tsAt(0, 30), 4.0), // bucket 0 → mean 3.0
      ("a", tsAt(2), 9.0))
    val out = Resample
      .linearInterpolate(rows.toDF("k", "ts", "v"), "k", col("ts"), col("v"), 60L)
      .orderBy("bucket").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L))
    assert(out.map(_.getDouble(2)).toSeq == Seq(3.0, 6.0, 9.0))
    assert(out.map(_.getBoolean(3)).toSeq == Seq(true, false, true))
  }
}
