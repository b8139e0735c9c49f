package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming half of the anomaly pipeline: watermarked hourly counts per
  * event type, emitted append-mode into a sink table the batch scorer
  * ([[graft.operators.EventOps.anomaliesOn]]) reads — the lambda-free
  * split a monitoring pipeline actually runs: the stream maintains the
  * dense hourly series continuously (bounded state: one open window per
  * type), scoring stays a cheap batch pass over the bounded sink.
  *
  * Append mode means a (hour, type) row is emitted EXACTLY ONCE, when the
  * watermark passes the window end — the sink never holds a half-counted
  * hour, so downstream z-scores never move retroactively. */
object AnomalyStream {

  /** Tumbling 1-hour counts per event type over a streaming frame with an
    * event-time `ts` column. */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("n_events"))
}
