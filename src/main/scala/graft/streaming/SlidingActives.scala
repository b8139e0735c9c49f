package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming rolling-actives monitor: distinct users per SLIDING
  * event-time window (e.g. a 7-day window advancing daily — streaming
  * WAU), the unbounded twin of
  * [[graft.operators.EventOps.rollingActives]].
  *
  * Structured Streaming does not support `count(DISTINCT)` in a streaming
  * aggregate (it would need unbounded per-window user sets in state), and
  * it should not: at 100 TB/day the exact-distinct state IS the problem.
  * The scale-honest operator is `approx_count_distinct` — per-window HLL
  * sketches, constant state per open window, mergeable across partitions
  * and micro-batches. Each event lands in windowDur/slide open windows
  * (7 for a 7d/1d WAU); the watermark bounds how many windows stay open,
  * so state is O(open windows), independent of stream volume. Append
  * mode: one row per window, emitted exactly once when the watermark
  * passes the window end. Accuracy vs the exact batch twin is pinned in
  * SlidingActivesSpec (HLL relative SD defaults to ~2.3%).
  */
object SlidingActives {

  def rollingDistinct(stream: DataFrame,
                      windowDur: String = "7 days",
                      slide: String = "1 day",
                      watermark: String = "1 day",
                      rsd: Double = 0.023): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur, slide))
      .agg(approx_count_distinct(col("user_id"), rsd).as("approx_users"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"), col("approx_users"))
}
