package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StructField, StructType}

/** Source/sink layer beyond parquet: CSV and JSONL readers/writers and
  * partitioned parquet with pruning-friendly layout.
  *
  * Scale conventions:
  *  - Readers take an explicit schema — `inferSchema` is a full extra pass
  *    over the data and is never acceptable at lake scale.
  *  - Writers avoid `coalesce(1)`; file count follows upstream parallelism.
  *  - Partitioned parquet uses low-cardinality partition columns only, so
  *    the filesystem fan-out stays bounded and partition pruning applies
  *    (asserted in SourcesSpec).
  */
object Sources {

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writePartitionedParquet(df: DataFrame, path: String,
                              partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.DecimalType

  /** Per-JVM unique scratch dir: concurrent processes (e.g. Verify and
    * Bench on one host) must not overwrite each other's round-trip files
    * mid-read. */
  private lazy val cacheDir =
    s"${System.getProperty("java.io.tmpdir")}/graft_source_cache_${java.util.UUID.randomUUID()}"

  /** End-to-end CSV source/sink exercise: customer → CSV → read back with
    * explicit schema → aggregate. Values must round-trip bit-exactly
    * (Spark writes shortest-round-trip doubles), which the oracle checks
    * against the original parquet. */
  def csvAgg(spark: SparkSession, dir: String): DataFrame = {
    val cust = graft.Lake.customer(spark, dir)
    val path = s"$cacheDir/customer_csv"
    writeCsv(cust, path)
    readCsv(spark, path, cust.schema)
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal").cast(DecimalType(18, 2))).cast("double"), 2)
          .as("total_acctbal"))
      .orderBy(col("c_mktsegment"))
  }

  /** Raw media-directory ingest via Spark's `binaryFile` source — how
    * image/audio corpora actually arrive at a lake (a bucket of files,
    * not a parquet binary column). Emits the multimodal payload
    * contract: a stable 64-bit id hashed from the file path, the source
    * path for lineage, size + mtime for incremental pickup, and the raw
    * bytes as `payload` — directly consumable by
    * [[graft.operators.MultimodalOps.decodeFeaturesOf]] and the other
    * payload-frame kernels. Reading distributes one file per task slot
    * (binaryFile files are indivisible splits); `pathGlobFilter` prunes
    * at listing time so a mixed dump only reads the wanted extension. */
  def readBinaryFiles(spark: SparkSession, path: String,
                      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .select(
        xxhash64(col("path")).as("doc_id"),
        col("path"),
        col("length").as("n_bytes"),
        col("modificationTime").as("modified"),
        col("content").as("payload"))

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** End-to-end ORC source/sink exercise: lineitem → ORC → read back →
    * aggregate. ORC is self-describing (schema in the footer, like
    * parquet), so no explicit schema is needed and the round-trip is
    * lossless — which is what lets the parquet-based oracle check it
    * exactly. Pushdown/pruning apply to ORC scans the same as parquet. */
  def orcAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.Lake.lineitem(spark, dir)
    val path = s"$cacheDir/lineitem_orc"
    writeOrc(li, path)
    readOrc(spark, path)
      .filter(col("l_discount") > 0.05)
      .groupBy(col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double"), 2)
          .as("total_price"))
      .orderBy(col("l_linestatus"))
  }

  /** JSONL ingest with a quarantine lane: PERMISSIVE parse routes
    * malformed lines into a corrupt-record column instead of failing the
    * job or silently dropping them (the all-too-common default). Returns
    * (good rows with the declared schema, quarantined raw lines) — the
    * dead-letter pattern every production ingest needs: nothing is lost,
    * bad lines stay replayable after a parser fix. Both frames are the
    * SAME single pass over the files; no second read. */
  def readJsonlQuarantined(spark: SparkSession, path: String,
                           schema: StructType): (DataFrame, DataFrame) = {
    val corruptCol = "__corrupt"
    val withCorrupt = StructType(schema.fields :+
      StructField(corruptCol, org.apache.spark.sql.types.StringType))
    val parsed = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize both lanes off the one parse, then release the cache
    // eagerly (the repo-wide discipline: no per-call caches left for the
    // ContextCleaner in a long-lived session)
    val good = parsed.filter(col(corruptCol).isNull)
      .select(schema.fieldNames.map(col): _*)
      .localCheckpoint(true)
    val quarantined = parsed.filter(col(corruptCol).isNotNull)
      .select(col(corruptCol).as("raw_line"))
      .localCheckpoint(true)
    parsed.unpersist(false)
    (good, quarantined)
  }

  /** End-to-end JSONL source/sink exercise: orders → JSONL (timestamps as
    * ISO strings) → read back with explicit schema → aggregate. */
  def jsonlAgg(spark: SparkSession, dir: String): DataFrame = {
    val ord = graft.Lake.orders(spark, dir)
    val path = s"$cacheDir/orders_jsonl"
    writeJsonl(ord, path)
    readJsonl(spark, path, ord.schema)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double"), 2)
          .as("total_price"))
      .orderBy(col("o_orderpriority"))
  }
}
