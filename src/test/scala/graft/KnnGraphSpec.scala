package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ivf, Similarity}

class KnnGraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val model = Ivf.Model(
    Similarity.hyperplanes(4, dim = 8, seed = 7L).map { c =>
      val n = math.sqrt(c.map(x => x * x).sum); c.map(_ / n)
    })

  private def vecs(n: Int): Seq[(Long, Array[Float])] =
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(8)(j =>
        (math.sin(i * 131 + j * 17) + 0.1 * j).toFloat))
    }

  test("each source has at most k neighbors with dense ranks from 1") {
    import spark.implicits._
    val df = vecs(60).toDF("vec_id", "embedding")
    val g = Similarity.clusterKnnGraph(df, "vec_id", "embedding", model, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(4))).groupBy(_._1)
    g.foreach { case (src, rows) =>
      val ranks = rows.map(_._2).sorted.toSeq
      assert(ranks == (1L to ranks.length).toSeq, s"src $src ranks $ranks")
      assert(ranks.length <= 3)
    }
  }

  test("a planted near-identical twin is its source's top neighbor") {
    import spark.implicits._
    val base = vecs(40)
    val twin = (999L, base.head._2.map(x => x * 1.0001f))
    val df = (base :+ twin).toDF("vec_id", "embedding")
    val top = Similarity.clusterKnnGraph(df, "vec_id", "embedding", model, k = 3)
      .filter(col("src") === 0L && col("rank") === 1)
      .collect().head
    assert(top.getLong(1) == 999L, s"top neighbor ${top.getLong(1)}")
    assert(top.getDouble(3) > 0.999)
  }

  test("edges never cross cells, and cosine decreases with rank") {
    import spark.implicits._
    val df = vecs(80).toDF("vec_id", "embedding")
    val rows = Similarity.clusterKnnGraph(df, "vec_id", "embedding", model, k = 3)
      .collect()
    val assign = Ivf.assign(df, "embedding", model)
      .select("vec_id", "cluster")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      assert(assign(r.getLong(0)) == assign(r.getLong(1)), "cross-cell edge")
    }
    rows.groupBy(_.getLong(0)).foreach { case (_, es) =>
      val byRank = es.sortBy(_.getLong(4)).map(_.getDouble(3)).toSeq
      assert(byRank == byRank.sorted.reverse, s"cos not descending: $byRank")
    }
  }
}
