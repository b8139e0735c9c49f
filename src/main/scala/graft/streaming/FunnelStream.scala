package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming funnel monitor: per tumbling event-time window, how many
  * users reached each step of the view → click → purchase funnel (with
  * the ordered-min-timestamp semantics of the batch
  * [[graft.operators.EventOps.funnel]]) — the live conversion dashboard.
  *
  * Shape: stage 1 is a WATERMARKED streaming aggregate keyed by
  * (window, user) holding only the three min-timestamps — state is one
  * small row per active user per open window, closed by the watermark.
  * Stage 2 (the per-window step counts) is a plain batch aggregate the
  * caller runs inside `foreachBatch` on stage 1's appended output — the
  * SCD2-stream discipline: chaining a second stateful aggregate inline
  * would grow multi-operator state for no benefit when stage 1 already
  * emits each (window, user) row exactly once. */
object FunnelStream {

  /** Stage 1: watermarked per-(window, user) first-touch times. Append
    * mode — one row per (window, user), emitted when the watermark
    * passes the window end. */
  def userSteps(events: DataFrame,
                windowDur: String = "1 day",
                watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("t_view"),
        min(when(col("event_type") === "click", col("ts"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("user_id"), col("t_view"), col("t_click"), col("t_purchase"))

  /** Stage 2: per-window funnel counts from stage 1 rows (run inside
    * foreachBatch, or on the sink in batch). Same ordered-min semantics
    * as the batch funnel: a step counts only when it happens AFTER the
    * previous step's first touch. */
  def stepCounts(userSteps: DataFrame): DataFrame =
    userSteps
      .groupBy(col("win_start"), col("win_end"))
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("t_view").isNotNull, 1L).otherwise(0L)).as("n_view"),
        sum(when(col("t_view") < col("t_click"), 1L).otherwise(0L))
          .as("n_click"),
        sum(when(col("t_view") < col("t_click") &&
          col("t_click") < col("t_purchase"), 1L).otherwise(0L))
          .as("n_purchase"))
      .orderBy(col("win_start"))
}
