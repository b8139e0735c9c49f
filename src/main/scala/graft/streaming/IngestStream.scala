package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Streaming ingest with exact dedup-on-arrival: a file-based streaming
  * source (new parquet files appearing in a lake landing dir) deduplicated
  * on content hash before they ever land in the curated table.
  *
  * Scale notes: `dropDuplicates` keeps one state entry per distinct hash —
  * pass `withinWatermark` (event-time column + watermark) to bound state
  * for time-windowed dedup; the unbounded form is the exact-forever
  * guarantee used when the hash set must be authoritative (RocksDB state
  * store at cluster scale).
  */
object IngestStream {

  /** New-file parquet stream from `landingDir`, deduped on sha256(text). */
  def dedupedDocs(spark: SparkSession, landingDir: String,
                  schema: StructType): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 8) // bounded per-trigger work
      .parquet(landingDir)
      .withColumn("content_hash", sha2(col("text"), 256))
      .dropDuplicates("content_hash")
}
