package graft

import graft.operators._

/** Plan-shape assertions: the properties that make these operators survive
  * a 100×–1000× scale-up. Correct *values* are covered by the DuckDB
  * oracle; these tests pin the *plans*.
  */
class PlanShapeSpec extends SparkSpecBase {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("scan+filter pushes predicates and prunes columns at the parquet scan") {
    val plan = planOf(Relational.scanFilter(spark, Sf))
    // scan nodes render as one long (possibly truncated) line — slice the
    // actual PushedFilters segment rather than pattern-matching the line
    val seg = plan.indexOf("PushedFilters")
    assert(seg >= 0, s"no PushedFilters in:\n$plan")
    val pushed = plan.substring(seg, math.min(seg + 200, plan.length))
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate") ||
           pushed.contains("LessThan(l_quantity"),
      s"predicates not pushed to parquet: $pushed")
    val rs = plan.indexOf("ReadSchema")
    val readSchema = plan.substring(rs, math.min(rs + 200, plan.length))
    assert(!readSchema.contains("l_partkey") && !readSchema.contains("l_suppkey"),
      s"column pruning failed: $readSchema")
  }

  test("dimension joins broadcast instead of shuffling the fact table") {
    val plan = planOf(Relational.regionRevenue(spark, Sf))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
  }

  test("top-K plans TakeOrderedAndProject, not a global sort") {
    val plan = planOf(Relational.topNOrders(spark, Sf))
    assert(plan.contains("TakeOrderedAndProject"), s"no rank pushdown in:\n$plan")
  }

  test("near-dedup never builds an all-pairs product") {
    val plan = planOf(DedupOps.nearDupPairs(spark, Sf))
    assert(!plan.contains("CartesianProduct"), "cartesian product in near-dedup")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "BNLJ in near-dedup")
  }

  test("LSH ANN joins equi-keyed on bucket — no all-pairs product") {
    val plan = planOf(AnnOps.lsh(spark, Sf))
    assert(!plan.contains("CartesianProduct"), "cartesian product in LSH ANN")
  }

  test("brute-force ANN broadcasts the bounded query set") {
    // A nested-loop scan against a *broadcast* 8-row query set is the
    // intended linear plan; an unbroadcast cartesian product is not.
    val plan = planOf(AnnOps.bruteForce(spark, Sf))
    assert(plan.contains("Broadcast"), s"query set not broadcast in:\n$plan")
    assert(!plan.contains("CartesianProduct"), "cartesian product in brute-force ANN")
  }

  test("simhash candidate pairs join equi-keyed on band") {
    val plan = planOf(DedupOps.simhashPairs(spark, Sf))
    assert(!plan.contains("CartesianProduct"), "cartesian product in simhash pairs")
  }
}
