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

  /** True iff the exception (or any cause in its chain) is Spark's
    * parquet type-mapping refusal — the signature of TIMESTAMP(NANOS). */
  private def isNanosRefusal(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8).exists { t =>
      val m = Option(t.getMessage).getOrElse("")
      m.contains("Parquet type") || m.contains("PARQUET_TYPE")
    }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts has shipped as both TIMESTAMP(MICROS) and TIMESTAMP(NANOS)
    // parquet across testdata generations. Spark 4 reads MICROS natively
    // but refuses to map NANOS to TimestampType, so probe the footer
    // schema first: if plain inference yields a timestamp column, use it;
    // otherwise fall back to an explicit LongType schema that reads the
    // raw nanos (no session-global legacy conf mutated) and truncate to
    // microseconds — Spark's native timestamp precision — in place.
    if (name == "events") {
      import org.apache.spark.sql.types._
      val plain =
        try {
          val df = spark.read.parquet(s"$dir/$name.parquet")
          df.schema("ts").dataType match {
            case TimestampType => Some(df)
            case TimestampNTZType =>
              // zone-less micros; session tz is pinned to UTC, so this
              // cast is value-identity on the underlying epoch micros
              Some(df.withColumn("ts",
                org.apache.spark.sql.functions.col("ts").cast(TimestampType)))
            case _ => None
          }
        } catch {
          // ONLY the schema-mapping refusal Spark raises for parquet
          // TIMESTAMP(NANOS) ("Illegal Parquet type"). Anything else —
          // missing file, corrupt footer, OOM — must propagate: swallowing
          // it here would silently reroute a healthy MICROS generation
          // through the raw-nanos path and shift every timestamp 1000×.
          case e: Exception if isNanosRefusal(e) => None
        }
      plain.getOrElse {
        val eventsSchema = StructType(Seq(
          StructField("event_id", LongType), StructField("ts", LongType),
          StructField("user_id", LongType), StructField("event_type", StringType),
          StructField("value", DoubleType), StructField("props", StringType)))
        spark.read.schema(eventsSchema).parquet(s"$dir/$name.parquet")
          .withColumn("ts", org.apache.spark.sql.functions.expr(
            "timestamp_micros(ts div 1000)"))
      }
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
