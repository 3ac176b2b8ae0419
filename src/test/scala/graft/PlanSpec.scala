package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution

/** Physical-plan shape assertions — the scale contract of the key
  * operators. These are the properties that decide whether a query
  * survives a 100x scale-up, checked at the plan level so a regression
  * (a lost pushdown, a dropped broadcast, a window instead of a
  * partial agg) fails CI rather than a cluster.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sf)
    val qe: QueryExecution = df.queryExecution
    qe.executedPlan.toString()
  }

  test("s3: filters and projection are pushed into the parquet scan") {
    val p = plan("s3_scan_project")
    assert(p.contains("PushedFilters: ["), p)
    // the printed list truncates, so check the leading entries
    assert(p.contains("IsNotNull(l_shipdate)"), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
    // pruned read schema: only the 6 referenced columns, not all 11
    assert(!p.contains("l_partkey"), "scan should not read unused columns")
  }

  test("s4: point lookup pushes the key predicate") {
    val p = plan("s4_point_lookup")
    assert(p.contains("EqualTo(o_orderkey,42)"), p)
  }

  test("j3: dimension joins broadcast (no shuffle of the fact side)") {
    val p = plan("j3_snowflake")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("o1: global top-N plans TakeOrderedAndProject, not a full sort") {
    val p = plan("o1_global_topn")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q1: aggregation is partial (map-side combine) + final") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("partial_"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("w3: max-struct dedup has no Window operator; w1 does") {
    assert(!plan("w3_dedup_maxstruct").contains("Window"))
    assert(plan("w1_dedup_latest").contains("Window"))
  }

  test("w2: rank<=k pushes a partial WindowGroupLimit below the shuffle") {
    // Spark's own map-side top-k pushdown — the reason SURVEY §4
    // concludes no custom SparkPlan is justified for W2.
    val p = plan("w2_topk_per_group")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("k1: knn scan broadcasts the query row") {
    val p = plan("k1_knn_brute")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("j6: anti join stays a hash join with broadcast") {
    val p = plan("j6_anti")
    assert(p.contains("LeftAnti"), p)
  }
}
