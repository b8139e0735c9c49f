package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session-window stream–stream alignment: attach events of one stream
  * (conversions, annotations, labels) to the GAP-SESSIONS of another
  * (activity), which no built-in stream–stream join expresses — session
  * windows have data-dependent bounds, so there is no fixed time interval
  * to derive join state eviction from.
  *
  * The foreachBatch pattern splits the problem into two bounded-state
  * halves:
  *   1. the activity stream runs a NATIVE `session_window` aggregation
  *      (state = one open session per key) and appends each CLOSED
  *      session to a sink table exactly once;
  *   2. the probe stream runs a STATELESS foreachBatch: each micro-batch
  *      (plus any previously-unmatched rows, re-read from a pending
  *      directory) equi-joins the session sink on key with a residual
  *      containment filter (`session_start ≤ ts < session_end`) — matched
  *      rows append to the aligned sink, unmatched rows (their session
  *      has not closed yet, or never will) overwrite the pending
  *      directory for the next batch's re-probe.
  *
  * Alignment is eventually consistent: a probe row arriving BEFORE its
  * session closes parks in pending and aligns on a later batch — nothing
  * is dropped and nothing aligns twice (pending rows leave the directory
  * the moment they match). State stays bounded on both halves: open
  * sessions per key on the activity side, zero streaming state plus an
  * unmatched-volume-bounded directory on the probe side. */
object SessionAlign {

  /** Activity stream → closed gap-sessions, append mode (one state row
    * per open session; emitted exactly once when the watermark passes the
    * session end). Input needs (user_id, ts). */
  def sessionize(activity: DataFrame, gap: String = "10 minutes",
                 watermark: String = "20 minutes"): DataFrame =
    activity
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Pure alignment core over any two frames: probe rows (user_id, ts, …)
    * attached to the session that CONTAINS their event time. The join is
    * equi on user_id with a residual range filter — never a product.
    * Returns (aligned, pending): aligned carries the session columns,
    * pending is the probe rows whose session is not in `sessions` (yet). */
  def alignOnSessions(probe: DataFrame, sessions: DataFrame): (DataFrame, DataFrame) = {
    val s = sessions.select(col("user_id").as("s_user_id"),
      col("session_start"), col("session_end"), col("n_events"))
    val joined = probe.join(s,
      probe("user_id") === col("s_user_id") &&
        probe("ts") >= col("session_start") &&
        probe("ts") < col("session_end"),
      "left")
    val aligned = joined.filter(col("session_start").isNotNull)
      .select(probe.columns.map(col) :+ col("session_start") :+
        col("session_end") :+ col("n_events"): _*)
    val pending = joined.filter(col("session_start").isNull)
      .select(probe.columns.map(col): _*)
    (aligned, pending)
  }

  /** The foreachBatch body: micro-batch ∪ pending → align against the
    * session sink → append matches not already in the aligned sink,
    * overwrite pending with the rest. Stateless by construction — every
    * input is re-read per batch, so a restart replays cleanly from the
    * sinks — and IDEMPOTENT under batch re-delivery: the anti-join on the
    * probe row identity (all probe columns) means a replayed batch, or a
    * crash between the aligned append and the pending overwrite, can
    * never align the same probe row twice. */
  def alignBatch(spark: SparkSession, sessionsPath: String,
                 alignedPath: String, pendingPath: String)
                (batch: DataFrame, batchId: Long): Unit = {
    import org.apache.spark.sql.types._
    def readOrEmpty(path: String, schema: StructType): DataFrame =
      try spark.read.parquet(path)
      catch { case _: Exception => // sink not written yet (first batches)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      }
    val sessions = readOrEmpty(sessionsPath, StructType(Seq(
      StructField("user_id", LongType),
      StructField("session_start", TimestampType),
      StructField("session_end", TimestampType),
      StructField("n_events", LongType))))
    val probe = batch.unionByName(readOrEmpty(pendingPath, batch.schema))
    val (aligned, pending) = alignOnSessions(probe, sessions)
    // replay guard: drop rows whose probe identity already landed
    val probeCols = batch.columns.toSeq
    val seen = readOrEmpty(alignedPath, batch.schema).select(probeCols.map(col): _*)
    val fresh = aligned.join(seen, probeCols, "left_anti")
      // materialize BEFORE appending: the anti-join's plan reads the same
      // directory the append extends
      .localCheckpoint(true)
    fresh.write.mode("append").parquet(alignedPath)
    // same materialize-then-overwrite rule for the pending rewrite; the
    // pending SET is identity-distinct (a replayed batch re-contributes
    // rows the pending file already holds)
    val still = pending.dropDuplicates(probeCols).localCheckpoint(true)
    still.write.mode("overwrite").parquet(pendingPath)
  }

  /** Wire the probe stream to [[alignBatch]]. The caller owns the activity
    * side ([[sessionize]] → parquet append at `sessionsPath`). */
  def alignedQuery(probe: DataFrame, spark: SparkSession,
                   sessionsPath: String, alignedPath: String,
                   pendingPath: String, checkpoint: String):
      org.apache.spark.sql.streaming.StreamingQuery =
    probe.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch(alignBatch(spark, sessionsPath, alignedPath, pendingPath) _)
      .start()
}
