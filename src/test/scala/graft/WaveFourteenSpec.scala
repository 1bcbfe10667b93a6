package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Stats, TextFunctions}
import graft.operators.Similarity

/** Wave-14: ROC AUC on the sharded rank kernel, truncated EWMA,
  * Flesch readability primitives, SRP bit signatures.
  */
class WaveFourteenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ---- stat_auc ----

  test("auc: perfect separation scores 1, inverted scores 0") {
    import spark.implicits._
    val df = (1L to 50L).map(i => (i.toDouble, i > 25L)).toDF("s", "y")
    val r = Stats.auc(df, "s", col("y")).collect().head
    assert(r.getLong(0) == 25L && r.getLong(1) == 25L)
    assert(r.getDouble(2) == 1.0)
    val inv = Stats.auc(df, "s", !col("y")).collect().head
    assert(inv.getDouble(2) == 0.0)
  }

  test("auc: a constant score (all ties) scores exactly 0.5") {
    import spark.implicits._
    val df = (1L to 40L).map(i => (7.0, i % 2 == 0)).toDF("s", "y")
    val r = Stats.auc(df, "s", col("y")).collect().head
    assert(r.getDouble(2) == 0.5)
  }

  test("auc: matches the pairwise definition on a tied small set") {
    import spark.implicits._
    // pos scores {1,3,3}, neg {2,3}: wins 3.5? enumerate: pairs (p,n):
    // (1,2)=0 (1,3)=0 (3,2)=1 (3,3)=.5 (3,2)=1 (3,3)=.5 → 3/6 = 0.5
    val df = Seq((1.0, true), (3.0, true), (3.0, true), (2.0, false), (3.0, false))
      .toDF("s", "y")
    val r = Stats.auc(df, "s", col("y")).collect().head
    assert(math.abs(r.getDouble(2) - 0.5) < 1e-15)
  }

  test("auc: sharded kernel is partitioning- and shardBits-invariant") {
    import spark.implicits._
    val rows = (1L to 500L).map(i => (((i * i) % 97).toDouble, i % 3 == 0))
    val a = Stats.auc(rows.toDF("s", "y").repartition(1), "s", col("y"), shardBits = 1)
      .collect().head.getDouble(2)
    val b = Stats.auc(rows.toDF("s", "y").repartition(17), "s", col("y"), shardBits = 12)
      .collect().head.getDouble(2)
    assert(a == b) // bit-equal across shard counts AND partitionings
  }

  // ---- ts_ewma ----

  test("ewmaTrunc: constant series returns the constant everywhere") {
    import spark.implicits._
    val s = (0L to 99L).map(b => (b, 42L)).toDF("bucket", "x")
    val out = Stats.ewmaTrunc(s, "bucket", "x").collect()
    assert(out.length == 100)
    assert(out.forall(_.getDouble(2) == 42.0))
  }

  test("ewmaTrunc: head normalization — first bucket is its own value") {
    import spark.implicits._
    val s = Seq((0L, 100L), (1L, 0L), (2L, 0L)).toDF("bucket", "x")
    val out = Stats.ewmaTrunc(s, "bucket", "x", lags = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(0L) == 100.0)
    // t=1: (0·2^19 + 100·2^18)/(2^19 + 2^18) = 100/3
    assert(math.abs(out(1L) - 100.0 / 3.0) < 1e-12)
    // t=2: 100·2^17/(2^19+2^18+2^17) = 100/7
    assert(math.abs(out(2L) - 100.0 / 7.0) < 1e-12)
  }

  test("ewmaTrunc: gaps renormalize over the weights present") {
    import spark.implicits._
    // buckets 0 and 2 only: at t=2, lag-1 missing → (x2·2^19 + x0·2^17)/(2^19+2^17)
    val s = Seq((0L, 10L), (2L, 50L)).toDF("bucket", "x")
    val out = Stats.ewmaTrunc(s, "bucket", "x")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val expected = (50.0 * (1L << 19) + 10.0 * (1L << 17)) / ((1L << 19) + (1L << 17)).toDouble
    assert(math.abs(out(2L) - expected) < 1e-12)
  }

  test("ewmaTrunc: partitioning-invariant (integer sums, order-free)") {
    import spark.implicits._
    val rows = (0L to 499L).map(b => (b, (b * b) % 1000))
    val one = Stats.ewmaTrunc(rows.toDF("bucket", "x").repartition(1), "bucket", "x")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val many = Stats.ewmaTrunc(rows.toDF("bucket", "x").repartition(13), "bucket", "x")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(one == many)
  }

  // ---- text_readability ----

  test("readability counts: sentences, syllables, flesch on known text") {
    import spark.implicits._
    val df = Seq("The cat sat. The dog ran! Did it?").toDF("text")
    val r = df.select(
      TextFunctions.tokenCount(col("text")).cast("long").as("w"),
      TextFunctions.sentenceCount(col("text")).as("s"),
      TextFunctions.syllableCount(col("text")).as("syl")).collect().head
    assert(r.getLong(0) == 8L) // 8 whitespace tokens
    assert(r.getLong(1) == 3L) // three terminator runs
    // e,a,a,e,o,a,i,i → 8 vowel groups ("The"→e, "cat"→a, "sat"→a,
    // "The"→e, "dog"→o, "ran"→a, "Did"→i, "it"→i)
    assert(r.getLong(2) == 8L)
    val f = df.select(TextFunctions.flesch(
      lit(8L), lit(3L), lit(8L))).collect().head.getDouble(0)
    assert(math.abs(f - (206.835 - 1.015 * (8.0 / 3.0) - 84.6 * 1.0)) < 1e-12)
  }

  test("readability: terminator-free text floors sentences at 1") {
    import spark.implicits._
    val r = Seq("no terminators here at all").toDF("text")
      .select(TextFunctions.sentenceCount(col("text"))).collect().head
    assert(r.getLong(0) == 1L)
  }

  // ---- emb_srp_bits ----

  test("srpSigns: deterministic ±1 matrix of the requested shape") {
    val s1 = Similarity.srpSigns(64, 16)
    val s2 = Similarity.srpSigns(64, 16)
    assert(s1 == s2)
    assert(s1.length == 64 && s1.forall(_.length == 16))
    assert(s1.flatten.forall(v => v == 1 || v == -1))
    // not degenerate: both signs appear
    assert(s1.flatten.toSet == Set(1, -1))
  }

  test("srpBits: scale invariance — 2x the vector gives the same code") {
    import spark.implicits._
    val base = (0 until 64).map(d => ((d * 37 % 13) - 6) / 16.0) // exactly representable
    val df = Seq(
      (1L, base.toArray),
      (2L, base.map(_ * 2).toArray)).toDF("id", "v")
    val codes = Similarity.srpBits(df, "id", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(codes(1L) == codes(2L))
  }

  test("srpBits: negated vector flips every non-tied bit") {
    import spark.implicits._
    val base = (0 until 64).map(d => ((d * 29 % 17) - 8) / 32.0 + 1.0 / 64.0)
    val df = Seq(
      (1L, base.toArray),
      (2L, base.map(-_).toArray)).toDF("id", "v")
    val signs = Similarity.srpSigns(64, 16)
    // fixed-point projections, computed independently in Scala
    val q1 = base.map(x => math.floor(x * 1048576.0 + 0.5).toLong)
    val proj = (0 until 16).map(k => (0 until 64).map(d => q1(d) * signs(d)(k)).sum)
    assume(proj.forall(_ != 0)) // no ties in this fixture
    val codes = Similarity.srpBits(df, "id", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((codes(1L) ^ codes(2L)) == 0xFFFFL)
    // and the Scala-side projection signs reproduce the engine code
    val expected = proj.zipWithIndex.map { case (p, k) => if (p >= 0) 1L << k else 0L }.sum
    assert(codes(1L) == expected)
  }

  test("srpBits: partitioning-invariant") {
    import spark.implicits._
    val rows = (1L to 200L).map(i =>
      (i, (0 until 64).map(d => (((i * 31 + d * 7) % 41) - 20) / 64.0).toArray))
    val one = Similarity.srpBits(rows.toDF("id", "v").repartition(1), "id", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val many = Similarity.srpBits(rows.toDF("id", "v").repartition(11), "id", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == many)
  }
}
