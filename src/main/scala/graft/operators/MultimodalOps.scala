package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Lake

/** Opaque payload for the batched decode path. */
final case class MediaPayload(doc_id: Long, payload: Array[Byte])

/** Decoded (stubbed) per-item features; `batch_size` records the actual
  * decoder batch the item rode in, proving the batching plumbing. */
final case class MediaFeatures(doc_id: Long, n_bytes: Int, batch_size: Int,
                               features: Array[Float])

/** Multimodal column support (SURVEY.md §2 item 25): media payloads as
  * opaque `binary` columns with typed metadata, plus batched decode
  * plumbing shaped like a real vectorized decoder.
  *
  * The container has no image/audio libraries, so the decode kernel is a
  * clearly-marked deterministic STUB — but the Spark side is real: binary
  * schema, metadata struct, `mapPartitions` with bounded decoder batches
  * (the shape a JNI/FFI decode call needs), and partition-parallel
  * execution with no driver materialization.
  */
object MultimodalOps {

  /** Documents as binary payloads + typed metadata struct. In a real lake
    * the payload column is the image/audio bytes; here it is the UTF-8 text
    * bytes, which keeps every byte-level operator real. */
  def payloads(spark: SparkSession, dir: String): DataFrame =
    Lake.documents(spark, dir).select(
      col("doc_id"), col("source"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        octet_length(col("text")).cast("long").as("n_bytes")).as("meta"))

  /** Per-source payload statistics over the binary column. */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    payloads(spark, dir)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("payload"))).as("total_bytes"),
        round(sum(length(col("payload"))).cast("double") / count(lit(1)), 4)
          .as("avg_bytes"),
        max(length(col("payload"))).cast("long").as("max_bytes"))
      .orderBy(col("source"))

  /** STUB decode kernel: a real implementation hands the whole batch to a
    * vectorized decoder (e.g. JNI image decode); this deterministic fake
    * derives 8 "features" from the first payload bytes so tests can assert
    * plumbing end-to-end. */
  private def stubDecode(payload: Array[Byte]): Array[Float] =
    Array.tabulate(8)(i =>
      if (i < payload.length) payload(i).toFloat / 128f else 0f)

  /** Batched feature extraction: partitions stream through the decoder in
    * bounded batches (`batchSize`), exactly the call shape a native decoder
    * needs — no per-row call overhead, no whole-partition materialization. */
  def decodeFeatures(spark: SparkSession, dir: String,
                     batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    payloads(spark, dir).select(col("doc_id"), col("payload"))
      .as[MediaPayload]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // one decoder invocation per batch (stubbed)
          batch.map(p =>
            MediaFeatures(p.doc_id, p.payload.length, batch.size,
              stubDecode(p.payload)))
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Fixed-stride frame sampling over the binary payload — the "every Nth
    * video frame" / "audio window" access pattern as pure byte-range ops:
    * one row per (doc, frame) with its byte offset and the frame bytes'
    * hex digest. Codegen'd sequence/substring over the binary column, a
    * map-only stage; a real decoder would replace the hex digest with the
    * decoded frame tensor, everything else stays as-is. Payloads shorter
    * than one frame yield no rows (never a negative-length sequence). */
  def frameSample(spark: SparkSession, dir: String,
                  stride: Int = 16, frameLen: Int = 8): DataFrame = {
    require(stride > 0 && frameLen > 0, "stride and frameLen must be positive")
    payloads(spark, dir)
      .select(col("doc_id"), col("payload"),
        length(col("payload")).as("n_bytes"))
      .filter(col("n_bytes") >= frameLen)
      .select(col("doc_id"), col("payload"),
        posexplode(sequence(lit(0L),
          floor((col("n_bytes") - frameLen) / stride).cast("long"))))
      .select(
        col("doc_id"),
        col("pos").cast("long").as("frame_idx"),
        (col("pos") * stride).cast("long").as("byte_offset"),
        hex(col("payload").substr(
          (col("pos") * stride + 1).cast("int"), lit(frameLen))).as("frame_hex"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Driver-comparable projection of [[decodeFeatures]]: the float features
    * are rescaled back to their integer byte codes and joined into one
    * sortable string — pandas/DuckDB can hash a string where they cannot
    * hash a raw array<float>. `batch_size` is partitioning-dependent so it
    * stays out of the comparable projection (MultimodalSpec covers it). */
  def decodeDigest(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(spark, dir)
      .select(
        col("doc_id"),
        col("n_bytes").cast("long").as("n_bytes"),
        concat_ws(",", transform(col("features"),
          f => (f * lit(128f)).cast("int").cast("string"))).as("feat_digest"))
      .orderBy(col("doc_id"))
}
