package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.EventOps
import graft.sources.SnapshotTable

/** Streaming SCD2 maintenance: keep a dimension-history snapshot table
  * current against a live change stream.
  *
  * Per micro-batch (foreachBatch — the replay-idempotent pattern the
  * repo's other sinks use):
  *  1. the batch's change rows append to a plain-parquet change LOG,
  *     hash-partitioned on a key bucket (`kbucket = pmod(hash(key), N)`) —
  *     append-only, partition-parallel, no rewrite;
  *  2. history is rebuilt for ONLY the keys the batch touched — the log
  *     read carries an `kbucket IN (touched buckets)` partition filter
  *     (static partition pruning: untouched buckets' files are never
  *     opened) and is then semi-joined down to the exact keys before
  *     the [[EventOps.scd2]] windows run, so per-batch read cost is
  *     proportional to the touched buckets' share of the log (~touched
  *     keys / N of it), never the whole log;
  *  3. the rebuilt slices MERGE into the history snapshot table by
  *     entity key (same-key rows replaced, other keys untouched), one
  *     copy-on-write commit per batch with full snapshot isolation —
  *     readers mid-batch keep their version.
  *
  * The log still grows without bound within a bucket; a periodic
  * bucket-preserving compaction (rewrite each `_kb=` directory into few
  * files) is the maintenance hook — it changes nothing semantically
  * since the rebuild reads whole buckets.
  *
  * Zero Spark streaming state: everything durable lives in the log and
  * the history table, so a restart resumes from the source offsets and
  * re-merging a replayed batch converges to the same history (the merge
  * is idempotent for a given log prefix). */
object Scd2Stream {

  def start(events: DataFrame, logDir: String, histDir: String,
            keyCol: String = "user_id", attrCol: String = "event_type",
            tsCol: String = "ts", idCol: String = "event_id",
            logBuckets: Int = 64): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val kb = pmod(hash(col(keyCol)), lit(logBuckets))
          batch.select(col(keyCol), col(attrCol), col(tsCol), col(idCol))
            .withColumn("kbucket", kb)
            .write.mode("append").partitionBy("kbucket").parquet(logDir)
          val touched = batch.select(col(keyCol)).distinct()
          // bounded driver list (≤ logBuckets ints) → static partition pruning
          val buckets = batch.select(kb.as("kbucket")).distinct()
            .collect().map(_.getInt(0)).toSeq
          val logs = spark.read.parquet(logDir)
            .filter(col("kbucket").isin(buckets: _*))
            .join(broadcast(touched), Seq(keyCol), "left_semi")
            .drop("kbucket")
          val rebuilt = EventOps.scd2(logs, keyCol, attrCol, tsCol, idCol)
          if (SnapshotTable.versions(spark, histDir).isEmpty)
            SnapshotTable.write(spark, histDir, rebuilt)
          else SnapshotTable.merge(spark, histDir, rebuilt, keyCol)
          ()
        }
      }
      .start()
}
