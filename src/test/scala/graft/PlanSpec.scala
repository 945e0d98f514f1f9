package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions — the analog of the reference's optimizer plan
  * tests (`miso-optimizations/src/tests.rs`), except the "rules" under test
  * are Catalyst's: these guard that our query shapes keep getting the plans
  * that scale (pushdown into the scan, broadcast for dims, partial/final
  * aggregation, TakeOrderedAndProject), so a refactor that silently breaks
  * one shows up as a test failure rather than a 100× regression at 100 TB.
  */
class PlanSpec extends AnyFunSuite {
  import TestSpark._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("filters and column pruning reach the parquet scan") {
    val p = plan("q_filter")
    assert(p.contains("DataFilters: [isnotnull(l_quantity"),
      "filter must be pushed to the scan")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
      "l_quantity:double,l_returnflag:string>"),
      "scan must read only referenced columns")
  }

  test("KQL-compiled filter also pushes down") {
    val p = plan("kql_where_project_sort")
    // the quantity predicate must appear among the scan's data filters
    // (order within the list is optimizer-dependent)
    val scanLine = p.split("\n").find(_.contains("DataFilters:")).getOrElse("")
    assert(scanLine.contains("l_quantity") && scanLine.contains(">= 45"),
      s"filter not pushed: $scanLine")
  }

  test("star join broadcasts dimension tables") {
    val p = plan("q_star_join")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      "dimension joins must be broadcast, not shuffled")
    assert(!p.contains("SortMergeJoin"))
  }

  test("sort+limit fuses to TakeOrderedAndProject") {
    assert(plan("q_topn").contains("TakeOrderedAndProject"))
    assert(plan("kql_topn").contains("TakeOrderedAndProject"))
  }

  test("aggregation is partial/final (map-side combine)") {
    val p = plan("q_summarize")
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      "aggregate must split into partial + final")
  }

  test("KQL count compiles to a 1-row aggregate, not a collect") {
    val p = plan("kql_filter_count")
    assert(p.contains("HashAggregate"))
  }

  test("distinct lowers to aggregation") {
    assert(plan("q_distinct").contains("HashAggregate"))
  }
}
