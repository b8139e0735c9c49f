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
  * The log grows one small file per (batch, touched bucket);
  * [[compactLog]] is the periodic maintenance hook that rewrites each
  * oversized `kbucket=` directory into one file. It changes nothing
  * semantically — the rebuild reads whole buckets — it just bounds the
  * per-batch open-file count, which otherwise grows linearly with
  * stream lifetime.
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

  /** Bucket-preserving log compaction: every `kbucket=` directory holding
    * more than `maxFilesPerBucket` parquet files is rewritten into ONE
    * file. Run it BETWEEN batches (or with the stream stopped) — the
    * maintenance cadence of any append-only log.
    *
    * Crash safety is a per-bucket three-step swap with a deterministic
    * recovery sweep at entry:
    *  1. write the compacted bucket to `_compacting/kbucket=N`
    *     (`_SUCCESS`-gated by the parquet committer);
    *  2. rename the live dir to `_precompact/kbucket=N` (atomic);
    *  3. rename staging into place, then drop the parked original.
    * An interruption leaves one of three states, each of which
    * [[recoverCompaction]] resolves without data loss: staging without a
    * parked dir (discard staging — originals still live), parked +
    * complete staging (roll forward), parked + incomplete staging (roll
    * back). Underscore-prefixed dirs are invisible to Spark reads, so a
    * concurrent rebuild never sees a half state.
    *
    * Returns (bucket, filesBefore) for each compacted bucket. */
  def compactLog(spark: org.apache.spark.sql.SparkSession, logDir: String,
                 maxFilesPerBucket: Int = 8): Seq[(Int, Int)] = {
    import org.apache.hadoop.fs.Path
    require(maxFilesPerBucket >= 1, "a bucket needs at least one file")
    val root = new Path(logDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    recoverCompaction(spark, logDir)
    val staging = new Path(root, "_compacting")
    val parked = new Path(root, "_precompact")
    val buckets = fs.listStatus(root).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith("kbucket="))
    val done = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    buckets.foreach { b =>
      val dataFiles = fs.listStatus(b).toSeq
        .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith("."))
      if (dataFiles.size > maxFilesPerBucket) {
        val n = b.getName.stripPrefix("kbucket=").toInt
        val stage = new Path(staging, b.getName)
        // 1. compacted copy (same schema: a bucket dir read carries no
        //    partition column, so the rewrite is byte-faithful rows)
        spark.read.parquet(b.toString).coalesce(1)
          .write.mode("overwrite").parquet(stage.toString)
        // 2./3. swap: park the original, promote staging, drop parked
        fs.mkdirs(parked)
        val park = new Path(parked, b.getName)
        require(fs.rename(b, park), s"failed to park $b")
        require(fs.rename(stage, b), s"failed to promote $stage")
        fs.delete(park, true)
        done += ((n, dataFiles.size))
      }
    }
    // both scratch roots are empty on a clean pass; sweep them
    Seq(staging, parked).foreach { d =>
      if (fs.exists(d) && fs.listStatus(d).isEmpty) fs.delete(d, true)
    }
    done.toSeq
  }

  /** Resolve any interrupted [[compactLog]] swap (see its scaladoc).
    * Idempotent; called automatically at compaction entry. */
  def recoverCompaction(spark: org.apache.spark.sql.SparkSession,
                        logDir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(logDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(root, "_compacting")
    val parked = new Path(root, "_precompact")
    val parkedDirs: Seq[Path] =
      if (fs.exists(parked)) fs.listStatus(parked).toSeq.map(_.getPath)
      else Seq.empty
    parkedDirs.foreach { park =>
      val live = new Path(root, park.getName)
      val stage = new Path(staging, park.getName)
      val stageComplete =
        fs.exists(stage) && fs.exists(new Path(stage, "_SUCCESS"))
      if (fs.exists(live)) {
        // promotion already happened (or never started): park is either
        // the pre-compact original after a successful promote, or a
        // duplicate; the live dir wins either way
        fs.delete(park, true)
        if (fs.exists(stage)) fs.delete(stage, true)
      } else if (stageComplete) {
        require(fs.rename(stage, live), s"recovery promote failed: $stage")
        fs.delete(park, true)
      } else {
        // staging never finished: restore the original
        require(fs.rename(park, live), s"recovery restore failed: $park")
        if (fs.exists(stage)) fs.delete(stage, true)
      }
    }
    // staging leftovers with no parked twin: the live dir is intact
    if (fs.exists(staging))
      fs.listStatus(staging).toSeq.map(_.getPath).foreach { stage =>
        if (fs.exists(new Path(root, stage.getName))) fs.delete(stage, true)
      }
  }
}
