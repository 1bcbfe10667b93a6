package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{CoreQueries, RelationalQueries}

/** Physical-plan shape assertions — the 100 TB guarantees (SURVEY §4):
  * filters and projections must reach the parquet scan, small dimensions
  * must broadcast, aggregates must be partial+final, top-k must not
  * global-sort. These pin the *plan*, not just the result, so a
  * regression that keeps answers right but destroys scale behavior fails
  * CI.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(q: graft.queries.Q): String =
    q.run(spark, sf).queryExecution.executedPlan.toString

  test("p1: predicate and projection push down to the parquet scan") {
    val p = plan(CoreQueries.p1Filter)
    assert(p.contains("PushedFilters"), p.take(500))
    assert(p.contains("GreaterThan(l_quantity,45"), "quantity filter not pushed")
    // pruned read schema — no l_tax/l_returnflag in the scan
    assert(!p.contains("l_tax"), "scan reads columns the query never uses")
  }

  test("j2: dimension joins are broadcast, not shuffled") {
    val p = plan(CoreQueries.j2Dim)
    assert(p.contains("BroadcastHashJoin"), p.take(500))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q1: aggregate is partial + final (map-side combine)") {
    val p = plan(CoreQueries.q1Agg)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(500))
  }

  test("w2: top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan(RelationalQueries.w2TopK)
    assert(p.contains("TakeOrderedAndProject"), p.take(500))
  }

  test("p2: scalar-aggregate predicate broadcasts the 1-row threshold") {
    val p = plan(RelationalQueries.p2AggPredicate)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(500))
  }
}
