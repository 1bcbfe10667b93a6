package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multi-level aggregation + sketch semantics (GroupingQueries). */
class GroupingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def sales() = {
    import spark.implicits._
    Seq(
      ("A", "x", 10.0), ("A", "x", 20.0), ("A", "y", 5.0),
      ("B", "x", 1.0), ("B", "y", 2.0), ("B", "y", 4.0)
    ).toDF("flag", "status", "qty")
  }

  test("rollup emits pair, per-flag, and grand-total levels that reconcile") {
    val r = sales().rollup("flag", "status")
      .agg(grouping(col("flag")).cast("int").as("gf"),
        grouping(col("status")).cast("int").as("gs"),
        sum("qty").as("s"))
      .collect()
    val grand = r.filter(x => x.getInt(2) == 1 && x.getInt(3) == 1)
    assert(grand.length == 1 && grand.head.getDouble(4) == 42.0)
    val perFlag = r.filter(x => x.getInt(2) == 0 && x.getInt(3) == 1)
      .map(x => x.getString(0) -> x.getDouble(4)).toMap
    assert(perFlag == Map("A" -> 35.0, "B" -> 7.0))
    // pair level sums reconcile to per-flag level
    val pairs = r.filter(x => x.getInt(2) == 0 && x.getInt(3) == 0)
    assert(pairs.map(_.getDouble(4)).sum == 42.0)
  }

  test("cube adds the per-status level rollup lacks") {
    val c = sales().cube("flag", "status")
      .agg(grouping(col("flag")).cast("int").as("gf"),
        grouping(col("status")).cast("int").as("gs"),
        sum("qty").as("s"))
      .collect()
    val perStatus = c.filter(x => x.getInt(2) == 1 && x.getInt(3) == 0)
      .map(x => x.getString(1) -> x.getDouble(4)).toMap
    assert(perStatus == Map("x" -> 31.0, "y" -> 11.0))
  }

  test("salted aggregation and salted join are bit-identical to the direct forms") {
    import spark.implicits._
    // 90% of rows share one hot key
    val skewed = (0 until 20000).map { i =>
      (if (i % 10 == 0) s"k${i % 50}" else "hot", i.toLong, (i % 977) * 0.25)
    }.toDF("k", "id", "v")
    val direct = skewed.groupBy("k")
      .agg(graft.functions.DetAgg.dsum(col("v")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = graft.operators.Skew
      .saltedSumCount(skewed, Seq("k"), col("v"), "s", col("id"), salts = 16)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == direct)

    val dim = ((0 until 50).map(i => (s"k$i", i % 7)) :+ ("hot", 99))
      .toDF("k", "attr")
    val plainJoin = skewed.join(dim, "k").groupBy("attr")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val saltedJoin = graft.operators.Skew
      .saltedJoin(skewed, dim, "k", col("id"), salts = 8)
      .groupBy("attr").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(saltedJoin == plainJoin)
  }

  test("approx_count_distinct at rsd=0.02 lands within 5% of exact") {
    import spark.implicits._
    val df = (0 until 50000).map(i => (i % 7, (i * 2654435761L) % 9973))
      .toDF("g", "v")
    val got = df.groupBy("g")
      .agg(countDistinct(col("v")).as("exact"),
        approx_count_distinct(col("v"), rsd = 0.02).as("approx"))
      .collect()
    got.foreach { r =>
      val (e, a) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - e) / e < 0.05, s"g=${r.getInt(0)} exact=$e approx=$a")
    }
  }
}
