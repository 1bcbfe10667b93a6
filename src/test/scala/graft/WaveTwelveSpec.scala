package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bfs, Pca, Snapshot}

/** Wave-12 operators: BFS shortest hops, PCA power iteration, SCD2
  * history, and the fingerprint/ANOVA determinism contracts.
  */
class WaveTwelveSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ---------------------------------------------------------------- BFS

  test("bfs: exact hop distances on a path graph, radius-capped") {
    import spark.implicits._
    // 1-2-3-4-5-6-7-8-9-10 path; source 1, depth 6 → nodes 1..7
    val edges = (1L to 9L).map(i => (i, i + 1)).toDF("u", "v")
    val d = Bfs.shortestHops(edges, "u", "v", source = 1L, maxDepth = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == (1L to 7L).map(i => i -> (i - 1)).toMap)
  }

  test("bfs: shortcut edge wins — BFS takes the shorter route") {
    import spark.implicits._
    // ring 1..6 plus chord 1-4: dist(4) = 1, dist(3) = 2 (via 2), dist(5) = 2 (via 4... or 6)
    val edges = (Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 1L), (1L, 4L)))
      .toDF("u", "v")
    val d = Bfs.shortestHops(edges, "u", "v", source = 1L, maxDepth = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(1L -> 0L, 2L -> 1L, 6L -> 1L, 4L -> 1L, 3L -> 2L, 5L -> 2L))
  }

  test("bfs: disconnected component is never reached; depth cap honored") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("u", "v")
    val d2 = Bfs.shortestHops(edges, "u", "v", source = 1L, maxDepth = 1)
      .collect().map(r => r.getLong(0)).toSet
    assert(d2 == Set(1L, 2L))
    val all = Bfs.shortestHops(edges, "u", "v", source = 1L, maxDepth = 10)
      .collect().map(r => r.getLong(0)).toSet
    assert(all == Set(1L, 2L, 3L))
  }

  // ---------------------------------------------------------------- PCA

  test("pca: recovers the dominant direction of an anisotropic cloud") {
    import spark.implicits._
    // deterministic cloud stretched along (1,1,0,...)/√2 in 8 dims:
    // t ~ large spread on the diagonal, tiny hash jitter elsewhere
    val dim = 8
    val rows = (0 until 400).map { i =>
      val t = (i % 41).toDouble - 20.0 // dominant coordinate, spread ±20
      val v = Array.tabulate(dim)(j =>
        (if (j == 0 || j == 1) t / math.sqrt(2.0) else 0.0) +
          0.01 * (((i * 31 + j * 17) % 7) - 3))
      Tuple1(v.toSeq)
    }
    val df = rows.toDF("embedding")
    val comp = Pca.topComponent(df, "embedding", dim, iters = 50)
    val w = comp.w
    // dominant direction ±(1,1,0..)/√2, sign canonicalized positive
    assert(math.abs(w(0) - 1 / math.sqrt(2.0)) < 0.01, w.toSeq.toString)
    assert(math.abs(w(1) - 1 / math.sqrt(2.0)) < 0.01)
    (2 until dim).foreach(j => assert(math.abs(w(j)) < 0.05, s"dim $j: ${w(j)}"))
    assert(comp.n == 400)
    // eigenvalue ≈ variance along the diagonal ≈ Var(t) ≈ (41²-1)/12 = 140
    assert(math.abs(comp.eigenvalue - 140.0) < 5.0, comp.eigenvalue.toString)
  }

  test("pca: sketch is partitioning-invariant (exact integer Gram)") {
    import spark.implicits._
    val rows = (0 until 300).map { i =>
      Tuple1(Array.tabulate(4)(j => math.sin(i * 0.37 + j) * (j + 1)).toSeq)
    }
    val a = Pca.topComponent(rows.toDF("embedding").repartition(1), "embedding", 4)
    val b = Pca.topComponent(rows.toDF("embedding").repartition(13), "embedding", 4)
    assert(a.w.toSeq == b.w.toSeq) // bit-equal, not approximately
    assert(a.eigenvalue == b.eigenvalue)
  }

  test("pca: scores rank rows by projection, deterministically") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(3.0, 0.0)), (2L, Seq(-5.0, 0.0)), (3L, Seq(1.0, 9.0)))
      .toDF("vec_id", "embedding")
    val s = Pca.scores(df, "vec_id", "embedding", Array(1.0, 0.0))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s == Map(1L -> 3.0, 2L -> -5.0, 3L -> 1.0))
  }

  // --------------------------------------------------------------- SCD2

  test("scd2: intervals chain per key, last version current, ties broken") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 20L, "c"), (2L, 5L, "x"))
      .toDF("k", "t", "payload")
    val out = Snapshot.scd2(df, Seq("k"), col("t"), col("payload"))
      .orderBy("k", "t", "payload")
      .select("k", "payload", "valid_from", "valid_to", "is_current")
      .collect()
    // key 1: a → [10,20), b → [20,20) (tie, payload order), c → [20,∞)
    assert(out(0).getString(1) == "a" && out(0).getLong(3) == 20L && !out(0).getBoolean(4))
    assert(out(1).getString(1) == "b" && out(1).getLong(3) == 20L && !out(1).getBoolean(4))
    assert(out(2).getString(1) == "c" && out(2).isNullAt(3) && out(2).getBoolean(4))
    assert(out(3).getString(1) == "x" && out(3).isNullAt(3) && out(3).getBoolean(4))
  }

  test("scd2: exactly one current row per key") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i % 17, i, s"v$i")).toDF("k", "t", "payload")
    val cur = Snapshot.scd2(df, Seq("k"), col("t"), col("payload"))
      .filter(col("is_current")).groupBy("k").count().collect()
    assert(cur.length == 17 && cur.forall(_.getLong(1) == 1L))
  }

  // -------------------------------------------- fingerprint determinism

  test("fingerprint-family hash sum is order- and partitioning-invariant") {
    import spark.implicits._
    val rowHash = "(((id * 31 + 7) % 100000) * 2654435761) % 4294967296"
    val df = (1L to 5000L).map(Tuple1(_)).toDF("id")
    val a = df.repartition(1).agg(sum(expr(rowHash))).collect().head.getLong(0)
    val b = df.repartition(29).sort(col("id").desc)
      .agg(sum(expr(rowHash))).collect().head.getLong(0)
    assert(a == b)
  }

  // ------------------------------------------------------------- ANOVA

  test("anova: F near zero when group means are equal, large when shifted") {
    import spark.implicits._
    def f(shift: Long): Double = {
      val df = (1L to 900L)
        .map(i => (Seq("A", "N", "R")((i % 3).toInt), (i % 10) + (if (i % 3 == 0) shift else 0L)))
        .toDF("g", "x")
      val m = Seq("A", "N", "R").flatMap { fl =>
        Seq(
          s"CAST(SUM(CASE WHEN g = '$fl' THEN 1 ELSE 0 END) AS DOUBLE) AS n_$fl",
          s"CAST(SUM(CASE WHEN g = '$fl' THEN x ELSE 0 END) AS DOUBLE) AS s_$fl",
          s"CAST(SUM(CASE WHEN g = '$fl' THEN x * x ELSE 0 END) AS DOUBLE) AS q_$fl")
      }
      val t = Seq("A", "N", "R").map(f => s"s_$f * s_$f / n_$f").mkString(" + ")
      val sT = "s_A + s_N + s_R"; val nT = "n_A + n_N + n_R"; val qT = "q_A + q_N + q_R"
      val ssb = s"($t) - ($sT) * ($sT) / ($nT)"
      val ssw = s"($qT) - ($t)"
      df.agg(expr(m.head), m.tail.map(expr): _*)
        .select(expr(s"(($ssb) / 2.0) / (($ssw) / (($nT) - 3.0))").as("f"))
        .collect().head.getDouble(0)
    }
    assert(math.abs(f(0)) < 1e-6)
    assert(f(50) > 1000.0)
  }
}
