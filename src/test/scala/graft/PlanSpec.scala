package graft

/** Physical-plan quality gates: the properties that make these queries
  * survive a 100x scale-up. A regression here (lost pushdown, a
  * broadcast turning into a shuffle join, a global sort appearing under
  * a limit) is a perf bug even while results stay correct.
  */
class PlanSpec extends SparkSpec {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q1: shipdate filter is pushed into the parquet scan") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters") && p.contains("LessThanOrEqual(l_shipdate"), p)
  }

  test("q1: scan reads only the needed columns") {
    val p = plan("q1_agg")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"), readSchema) // pruned
    assert(readSchema.contains("l_quantity"), readSchema)
  }

  test("q1: aggregation runs inside whole-stage codegen with partial agg") {
    val p = plan("q1_agg")
    // map-side combine: partial aggregation below the exchange
    assert(p.contains("partial_sum"), p)
    // codegen spans only materialize in the AQE final plan -> execute
    // first; "*(n)" is the WholeStageCodegen marker in simpleString
    val df = SparkEntry.queries("q1_agg")(spark, sf)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("*("))
  }

  test("q3: filtered part dimension is broadcast") {
    assert(plan("q3_broadcast_join").contains("BroadcastHashJoin"))
  }

  test("q4: large-large join is sort-merge") {
    assert(plan("q4_sortmerge_join").contains("SortMergeJoin"))
  }

  test("q6: semi/anti joins stay semi/anti (no materialized distinct)") {
    val p = plan("q6_semi_anti")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
  }

  test("q9: filters pushed on all three tables before the joins") {
    val p = plan("q9_topk_revenue")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), p)
    assert(p.contains("GreaterThan(l_shipdate"), p)
    assert(p.contains("LessThan(o_orderdate"), p)
  }

  test("q14: global top-k uses TakeOrderedAndProject, not a full sort") {
    val p = plan("q14_sort_limit")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("q7b: pure theta join on dimensions is broadcast nested loop") {
    assert(plan("q7b_theta_join").contains("BroadcastNestedLoopJoin"))
  }
}
