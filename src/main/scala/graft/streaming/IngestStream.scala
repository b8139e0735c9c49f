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

  /** Watermark-BOUNDED streaming dedup: duplicates arriving within
    * `ttl` of each other collapse, and state for hashes older than the
    * watermark is evicted — the state-size guarantee the unbounded form
    * trades away. The right default for high-volume ingest where
    * duplicates cluster in time (retries, replays, crawler revisits);
    * keep [[dedupedDocs]] for the authoritative exact-forever set. */
  def dedupedDocsWithTtl(stream: DataFrame, tsCol: String,
                         ttl: String = "10 minutes"): DataFrame =
    stream
      .withColumn("content_hash", sha2(col("text"), 256))
      .withWatermark(tsCol, ttl)
      .dropDuplicatesWithinWatermark("content_hash")
}
