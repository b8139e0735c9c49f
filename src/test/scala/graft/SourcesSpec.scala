package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Sources

/** Source/sink round-trips and partition pruning. */
class SourcesSpec extends SparkSpecBase {

  private lazy val tmp = Files.createTempDirectory("graft_sources").toString

  test("CSV round-trip preserves every value bit-exactly") {
    val orig = Lake.customer(spark, Sf)
    Sources.writeCsv(orig, s"$tmp/cust_csv")
    val back = Sources.readCsv(spark, s"$tmp/cust_csv", orig.schema)
    assert(back.schema == orig.schema)
    assert(back.exceptAll(orig).count() == 0 && orig.exceptAll(back).count() == 0)
  }

  test("JSONL round-trip preserves rows including timestamps") {
    val orig = Lake.orders(spark, Sf)
    Sources.writeJsonl(orig, s"$tmp/ord_json")
    val back = Sources.readJsonl(spark, s"$tmp/ord_json", orig.schema)
    assert(back.exceptAll(orig).count() == 0 && orig.exceptAll(back).count() == 0)
  }

  test("partitioned parquet write prunes partitions on read") {
    Sources.writePartitionedParquet(
      Lake.lineitem(spark, Sf), s"$tmp/li_part", Seq("l_returnflag"))
    val filtered = Sources.readParquet(spark, s"$tmp/li_part")
      .filter(col("l_returnflag") === "R")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("l_returnflag"),
      s"no partition pruning in:\n$plan")
    val expected = Lake.lineitem(spark, Sf).filter(col("l_returnflag") === "R").count()
    assert(filtered.count() == expected)
  }
}
