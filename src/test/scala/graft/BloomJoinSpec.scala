package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BloomJoin

class BloomJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bloom-pruned semi join equals the plain semi join") {
    import spark.implicits._
    val big = (1L to 5000L).map(i => (i, s"row$i")).toDF("k", "payload")
    val small = (1L to 5000L).filter(_ % 37 == 0).map(i => Tuple1(i)).toDF("j")
    val pruned = BloomJoin.semiJoin(big, small, "k", "j")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val plain = big.join(small, col("k") === col("j"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(pruned == plain)
    assert(pruned.size == 5000 / 37)
  }

  test("bloom admits every build-side key (no false negatives)") {
    import spark.implicits._
    val keys = (1L to 2000L).map(Tuple1(_)).toDF("k")
    val sketch = keys.agg(BloomJoin.bloomAgg(col("k"), 2000L, 1L << 16).as("b"))
      .head.getAs[Array[Byte]]("b")
    val missed = keys
      .filter(!BloomJoin.mightContain(lit(sketch), col("k")))
      .count()
    assert(missed == 0L)
  }

  test("empty build side yields an empty result, not a full scan") {
    import spark.implicits._
    val big = (1L to 100L).map(Tuple1(_)).toDF("k")
    val none = Seq.empty[Long].map(Tuple1(_)).toDF("j")
    assert(BloomJoin.semiJoin(big, none, "k", "j").count() == 0L)
  }

  test("a tight sketch still yields exact results (false positives removed)") {
    import spark.implicits._
    // 64 bits for 1000 keys: the sketch is saturated, nearly everything
    // "might match" — the exact join behind it must still be exact
    val big = (1L to 3000L).map(Tuple1(_)).toDF("k")
    val small = Seq(10L, 20L, 30L).map(Tuple1(_)).toDF("j")
    val got = BloomJoin.semiJoin(big, small, "k", "j",
        expectedItems = 3L, numBits = 64L)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(10L, 20L, 30L))
  }
}
