package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Snapshot

class SnapshotSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("diff classifies added / removed / changed / unchanged") {
    import spark.implicits._
    val old = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "p")
    val neu = Seq((1L, "a", 10.0), (2L, "B", 20.0), (4L, "d", 40.0))
      .toDF("k", "s", "p")
    val d = Snapshot.diff(old, neu, Seq("k"), Seq("s", "p"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(d == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("diff change detection is null-safe in both directions") {
    import spark.implicits._
    val old = Seq((1L, Some("x")), (2L, Option.empty[String]), (3L, Option.empty[String]))
      .toDF("k", "s")
    val neu = Seq((1L, Option.empty[String]), (2L, Option.empty[String]), (3L, Some("y")))
      .toDF("k", "s")
    val d = Snapshot.diff(old, neu, Seq("k"), Seq("s"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(d == Map(1L -> "changed", 2L -> "unchanged", 3L -> "changed"))
  }

  test("diff carries the current side's values") {
    import spark.implicits._
    val old = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "p")
    val neu = Seq((1L, 11.0), (3L, 30.0)).toDF("k", "p")
    val vals = Snapshot.diff(old, neu, Seq("k"), Seq("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(vals == Map(1L -> 11.0, 2L -> 20.0, 3L -> 30.0))
  }

  test("merge replaces matched rows wholesale, including explicit nulls") {
    import spark.implicits._
    val base = Seq((1L, Some("a"), Some(10.0)), (2L, Some("b"), Some(20.0)))
      .toDF("k", "s", "p")
    val upd = Seq((2L, Option.empty[String], Some(25.0)), (3L, Some("c"), Some(30.0)))
      .toDF("k", "s", "p")
    val m = Snapshot.merge(base, upd, Seq("k"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getDouble(2))).toSet
    // row 2's s is nulled by the update — per-column coalesce would
    // wrongly resurrect "b"
    assert(m == Set((1L, Some("a"), 10.0), (2L, None, 25.0), (3L, Some("c"), 30.0)))
  }

  test("merge preserves column order and rejects mismatched schemas") {
    import spark.implicits._
    val base = Seq((1L, "a")).toDF("k", "s")
    val ok = Snapshot.merge(base, Seq((1L, "b")).toDF("k", "s"), Seq("k"))
    assert(ok.columns.toSeq == Seq("k", "s"))
    val bad = Seq(("a", 1L)).toDF("s", "k")
    assertThrows[IllegalArgumentException] {
      Snapshot.merge(base, bad, Seq("k"))
    }
  }
}
