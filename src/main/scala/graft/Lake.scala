package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lake access layer: a "lake" is a directory of parquet tables
  * (`<dir>/<table>.parquet`). Reads stay fully declarative so Catalyst
  * applies column pruning and predicate pushdown to every downstream
  * operator — verified by plan-shape tests in `PlanShapeSpec`.
  *
  * No reference file:line citations are possible this round:
  * /root/reference is empty (0 files) — see SURVEY.md §1.
  */
object Lake {
  /** Every table the driver provisions (TESTDATA.md). */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 refuses to map
    // to TimestampType. An explicit LongType schema reads the raw nanos
    // (no session-global legacy conf mutated), then truncate to
    // microseconds — Spark's native timestamp precision — in place.
    if (name == "events") {
      import org.apache.spark.sql.types._
      val eventsSchema = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType)))
      spark.read.schema(eventsSchema).parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
