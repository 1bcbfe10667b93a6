package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Stats
import graft.operators.{Cut, Cuts}

/** SURVEY §5 property-based tests: MAD invariants, cuts monotonicity,
  * median definition — ScalaCheck generators sampled under a fixed seed
  * (the scalatest-plus bridge artifact is not on the offline classpath,
  * so sampling is driven manually; 20 cases per property).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val data: Gen[List[Double]] =
    Gen.nonEmptyListOf(Gen.choose(-1e3, 1e3)).map(_.take(40))

  test("MAD_std: shift-invariant and scale-equivariant on arbitrary data") {
    import spark.implicits._
    def mad(ys: Seq[Double]): Double =
      ys.map(y => (1, y)).toDF("g", "x")
        .groupBy("g").agg(Stats.madStd(col("x")))
        .collect().head.getDouble(1)
    val cases = samples(for {
      xs <- data
      shift <- Gen.choose(-100.0, 100.0)
      scale <- Gen.choose(0.1, 10.0)
    } yield (xs, shift, scale), 12)
    assert(cases.nonEmpty)
    cases.foreach { case (xs, shift, scale) =>
      val base = mad(xs)
      assert(math.abs(mad(xs.map(_ + shift)) - base) < 1e-6 * math.max(1, math.abs(base)),
        s"shift failed: $xs $shift")
      assert(math.abs(mad(xs.map(_ * scale)) - base * scale) < 1e-6 * math.max(1, base * scale),
        s"scale failed: $xs $scale")
    }
  }

  test("cuts: adding a cut never accepts more groups (monotonicity)") {
    import spark.implicits._
    val events = (1 to 60).map(i => (i % 20, "dev", i.toDouble)).toDF("g", "device_name", "v")
    def accepted(cuts: Seq[Cut]): Long =
      Cuts.acceptedPerGroup(events, cuts, "device_name", Seq("g"))
        .filter(col("accepted")).count()
    val cases = samples(for {
      c1 <- Gen.choose(0.0, 60.0)
      c2 <- Gen.choose(0.0, 60.0)
    } yield (c1, c2), 12)
    assert(cases.nonEmpty)
    cases.foreach { case (c1, c2) =>
      val one = accepted(Seq(Cut("v", "dev", "lower", c1)))
      val two = accepted(Seq(Cut("v", "dev", "lower", c1), Cut("v", "dev", "higher", c2)))
      assert(two <= one, s"monotonicity failed: $c1 $c2")
    }
  }

  test("medianInPlace equals sorted-middle definition on arbitrary data") {
    samples(data, 50).foreach { xs =>
      val s = xs.sorted
      val n = s.length
      val want = if (n % 2 == 1) s(n / 2) else s(n / 2 - 1) + (s(n / 2) - s(n / 2 - 1)) * 0.5
      val got = Stats.medianInPlace(scala.collection.mutable.ArrayBuffer(xs: _*))
      assert(got == want, s"median failed on $xs")
    }
  }

  test("ZOrder interleave: bijective over the full 8-bit × 8-bit grid (one plan)") {
    import spark.implicits._
    import graft.operators.ZOrder
    // exhaustive, not sampled: all 65,536 (bx, by) cells in ONE Spark
    // pass — every Morton key distinct, in [0, 2^16), and the decode
    // (odd/even bit split) recovers the inputs exactly
    val grid = spark.range(0, 1L << 16)
      .select((col("id") % 256).as("bx"), (col("id") / 256).cast("long").as("by"))
    val z = grid.select(col("bx"), col("by"),
      ZOrder.interleave("bx", "by", 8).as("z"))
    val rows = z.collect()
    assert(rows.length == 65536)
    val zs = rows.map(_.getLong(2))
    assert(zs.distinct.length == 65536, "interleave not injective")
    assert(zs.min == 0L && zs.max == 65535L, s"range [${zs.min}, ${zs.max}]")
    rows.foreach { r =>
      val (bx, by, zv) = (r.getLong(0), r.getLong(1), r.getLong(2))
      var dx = 0L; var dy = 0L
      (0 until 8).foreach { i =>
        dx |= ((zv >> (2 * i)) & 1L) << i
        dy |= ((zv >> (2 * i + 1)) & 1L) << i
      }
      assert(dx == bx && dy == by, s"decode($zv) = ($dx,$dy) != ($bx,$by)")
    }
  }
}
