package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan audits — the 100 TB design assertions (builder prompt /
  * SURVEY.md §4): filters reach the parquet scan, scans read only needed
  * columns, dimension joins broadcast (no fact-table shuffle for joins),
  * and aggregation plans carry partial (map-side) aggregation.
  *
  * These lock the *shape* of the plan, so a regression that silently turns
  * a broadcast join into a sort-merge shuffle or widens a scan fails CI —
  * not just the timing.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = sf0001

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("predicate pushdown: parquet scan carries PushedFilters") {
    val df = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") > 40 && col("l_partkey") === 7)
      .select("l_orderkey")
    val plan = planOf(df)
    assert(plan.contains("PushedFilters:"), plan)
    assert(plan.contains("GreaterThan(l_quantity,40.0)") || plan.contains("GreaterThan(l_quantity,40"),
           s"quantity filter not pushed:\n$plan")
    assert(plan.contains("EqualTo(l_partkey,7)"), s"partkey filter not pushed:\n$plan")
  }

  test("column pruning: salesDaily reads only the needed lineitem/orders columns") {
    val plan = planOf(ops.Relational.salesDaily(spark, dir))
    // lineitem: join key + measures only — never the full 11-column schema
    assert(plan.contains("ReadSchema"), plan)
    assert(!plan.contains("l_returnflag"), s"lineitem scan not pruned:\n$plan")
    assert(!plan.contains("l_shipdate"), s"lineitem scan not pruned:\n$plan")
    assert(!plan.contains("o_totalprice"), s"orders scan not pruned:\n$plan")
  }

  test("dimension joins broadcast: kyakusu + front-sales never shuffle the fact side for the join") {
    for (q <- Seq(ops.Relational.kyakusuDaily(spark, dir),
                  ops.Relational.frontSalesDaily(spark, dir))) {
      val plan = planOf(q)
      assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
      assert(!plan.contains("SortMergeJoin"), s"unexpected sort-merge join:\n$plan")
    }
  }

  test("aggregations are partial+final (map-side combine before the shuffle)") {
    val plan = planOf(ops.Relational.skuDaily(spark, dir))
    assert(plan.contains("partial_"), s"no partial aggregation:\n$plan")
  }

  test("whole-stage codegen covers the scan->project->aggregate hot path") {
    // skuDaily is pure arithmetic -> fully codegen'd. (Higher-order lambda
    // functions — tokens/shingles — are CodegenFallback by Spark design,
    // so text ops are deliberately not asserted here.)
    val df = ops.Relational.skuDaily(spark, dir)
    df.collect() // AQE only materializes WholeStageCodegen spans in the final plan
    val plan = planOf(df)
    // codegen stages print as "*(n) Operator" in the simple plan string
    assert(plan.contains("*("), plan)
  }

  test("knn brute force broadcasts the query side (corpus side streams)") {
    val plan = planOf(ops.Similarity.knnBruteForce(spark, dir))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
           s"query side must broadcast:\n$plan")
  }
}
