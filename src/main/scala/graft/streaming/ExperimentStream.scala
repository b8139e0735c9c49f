package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming experiment monitor: per-tumbling-window per-arm event and
  * conversion counts — the live dashboard behind
  * [[graft.operators.EventOps.abReadout]]'s end-of-experiment readout.
  *
  * Arms use the SAME third-Lehmer hash of the stable user id as the batch
  * readout (16807 multiplier), so a user's arm is identical in the stream
  * and in every batch recomputation — the property that makes mid-flight
  * dashboards and the final readout agree. State is one open window per
  * arm (bounded); append mode emits each (window, arm) row exactly once
  * when the watermark passes the window end. The per-window conversion
  * RATE here is event-weighted (purchases / events) — the streaming
  * approximation a monitor wants cheap; the user-deduplicated readout
  * stays the batch operator's job. */
object ExperimentStream {

  def armWindows(stream: DataFrame,
                 windowDur: String = "1 hour",
                 watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur),
        when(pmod(col("user_id") * lit(16807L), lit(2147483647L)) % 2 === 0,
          "A").otherwise("B").as("arm"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"))
      .select(col("window.start").as("bucket"), col("arm"),
        col("n_events"), col("n_purchases"))
}
