package graft

import graft.operators.Meta

/** Plan-shape assertions: the 100 TB posture. Filters reach the parquet
  * scan, projections prune the read schema, small dims broadcast, and the
  * hot path stays inside whole-stage codegen.
  */
class PlanShapeSpec extends SparkSuite {

  test("scan_pruned: filters pushed to parquet, schema pruned to 3+2 cols") {
    val plan = Meta.explainFormatted(q("scan_pruned"))
    assert(plan.contains("PushedFilters"), "no pushed filters in:\n" + plan)
    assert(plan.contains("GreaterThan(l_quantity"), plan)
    // pruned read schema: only the needed columns, never all 11
    assert(!plan.contains("l_extendedprice"), "read schema not pruned")
  }

  test("join_multiway: dimension tables broadcast") {
    val plan = Meta.explainFormatted(q("join_multiway"))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("agg_group: partial + final hash aggregation") {
    val plan = Meta.explainFormatted(q("agg_group"))
    assert(plan.contains("HashAggregate"), plan)
    assert(plan.contains("partial_"), "no map-side partial agg:\n" + plan)
  }

  test("topn compiles to TakeOrderedAndProject (bounded, no full sort)") {
    val plan = Meta.explainFormatted(q("topn"))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("join_merge honours the sort-merge hint") {
    val plan = Meta.explainFormatted(q("join_merge"))
    assert(plan.contains("SortMergeJoin"), plan)
  }

  test("whole-stage codegen covers the agg hot path") {
    // AQE's pre-execution plan hides codegen spans; materialize so the
    // final adaptive plan (with WholeStageCodegen ids) is available.
    val df = q("agg_group")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // codegen'd operators render with a "*(codegenStageId)" prefix
    assert(plan.contains("*(1)"), plan)
  }

  test("text ops stay UDF-free (no BatchEvalPython/ScalaUDF in plan)") {
    val plan = Meta.explainFormatted(q("text_quality"))
    assert(!plan.contains("BatchEvalPython"))
    assert(!plan.toLowerCase.contains("scalaudf"))
  }
}
