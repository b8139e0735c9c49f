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

  /** The reference side of the streaming NEAR-dup screen: the static
    * corpus's distinct MinHash-LSH band buckets. Build once (or refresh
    * on corpus commits — pair with [[graft.operators.AnnIndex]]'s sidecar
    * discipline) and reuse across micro-batches; at scale, persist it as
    * a parquet table keyed by (band, band_hash). */
  def referenceBuckets(reference: DataFrame): DataFrame = {
    import graft.operators.DedupOps
    DedupOps.bandedBuckets(DedupOps.minhashSignatures(reference))
      .select(col("band"), col("band_hash")).distinct()
  }

  /** Per-micro-batch near-dup screen for a foreachBatch sink (the same
    * escape hatch the streaming upsert uses): drop every arriving doc
    * whose LSH bands collide with a [[referenceBuckets]] bucket. One
    * equi semi-join per batch — NO streaming state, and the reference
    * table may be arbitrarily large (regular shuffle/broadcast join).
    *
    * Candidate-level semantics, deliberately: a band collision is the
    * batch pipeline's candidate test, so this screen drops exactly what
    * batch near-dedup would PAIR with the corpus (at the banding's
    * detection probability — ≥ 0.9999 at jaccard 0.5 with 32×2 bands).
    * It admits the banding's false-positive rate; when that matters,
    * route screened-out docs through the exact verify offline instead
    * of inflating every micro-batch with per-pair Jaccard work. */
  def screenNearDups(batch: DataFrame, refBuckets: DataFrame): DataFrame = {
    import graft.operators.DedupOps
    val hits = DedupOps.bandedBuckets(DedupOps.minhashSignatures(batch))
      .join(refBuckets, Seq("band", "band_hash"), "left_semi")
      .select(col("doc_id")).distinct()
    batch.join(hits, Seq("doc_id"), "left_anti")
  }

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
