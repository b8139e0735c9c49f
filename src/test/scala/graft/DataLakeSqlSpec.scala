package graft

import org.apache.spark.sql.functions._

/** The string-SQL facade: `DataLake.sql(query)` must be result- AND
  * plan-equivalent to the DataFrame twin — registering temp views is
  * metadata-only, so Catalyst sees the identical parquet scans with
  * pushdown/pruning intact. */
class DataLakeSqlSpec extends SparkSpecBase {

  private lazy val lake = DataLake(spark, Sf)

  test("sql: a Q3-shaped string query matches the DataFrame twin") {
    val viaSql = lake.sql(
      """SELECT o_orderkey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val dec2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val viaDf = Lake.lineitem(spark, Sf)
      .join(Lake.orders(spark, Sf),
        col("l_orderkey") === col("o_orderkey"))
      .join(Lake.customer(spark, Sf)
        .filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"))
      .agg(sum(col("l_extendedprice").cast(dec2) *
        (lit(1).cast(dec2) - col("l_discount").cast(dec2)))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(viaSql.nonEmpty)
    assert(viaSql.toSeq == viaDf.toSeq)
  }

  test("sql: filters and projections reach the parquet scan") {
    val plan = lake.sql(
      "SELECT o_orderkey FROM orders WHERE o_custkey = 42")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"),
      s"expected pushed filters in:\n$plan")
    assert(plan.contains("o_custkey") && !plan.contains("o_totalprice"),
      "scan must prune to the referenced columns")
  }

  test("sql: every lake table is queryable by name") {
    for (t <- Lake.tableNames) {
      val n = lake.sql(s"SELECT count(*) AS n FROM $t").collect()(0).getLong(0)
      assert(n > 0, s"$t must be non-empty")
    }
  }
}
