package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream–stream join: correlate two unbounded event streams (views and
  * purchases here) on a key within a bounded event-time window —
  * "purchase within `horizon` after the view", the attribution join of
  * clickstream pipelines.
  *
  * Scale design: BOTH streams carry a watermark and the join condition
  * bounds event-time distance in BOTH directions, so Spark derives a
  * state-eviction horizon for each side — without the time bound the
  * join would buffer both streams forever (unbounded state). Inner
  * joins emit as matches arrive; the state store holds only rows whose
  * event time is within the watermark horizon. Keyed by user_id (high
  * cardinality → even state distribution across partitions).
  */
object StreamJoin {

  /** views ⋈ purchases on user within (0, horizon] after the view.
    * Both inputs need columns (user_id, event_id, ts).
    *
    * `joinType` "inner" emits matches as they arrive. "left_outer" ALSO
    * emits each never-matched view exactly once, null-padded, when the
    * watermark passes the point where a match is no longer possible
    * (view_ts + horizon + watermark delay) — the production case inner
    * attribution misses: most views never convert, and a funnel that
    * silently drops them under-reports every denominator. The same
    * two-sided time bound that lets Spark evict matched-side state is
    * what gives the null-completion a deadline, so state stays bounded
    * either way. */
  def viewToPurchase(views: DataFrame, purchases: DataFrame,
                     watermark: String = "10 minutes",
                     horizon: String = "30 minutes",
                     joinType: String = "inner"): DataFrame = {
    val v = views.withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    v.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") > col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr(s"INTERVAL $horizon"),
      joinType)
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        col("view_ts"), col("purchase_ts"))
  }

  /** Left-outer attribution: every view exactly once — matched views with
    * their purchase, never-matched views null-padded after the watermark
    * closes their horizon. */
  def viewToPurchaseOuter(views: DataFrame, purchases: DataFrame,
                          watermark: String = "10 minutes",
                          horizon: String = "30 minutes"): DataFrame =
    viewToPurchase(views, purchases, watermark, horizon, joinType = "left_outer")

  /** Stream–static enrichment: each micro-batch left-joins a broadcast
    * snapshot of the dimension — the "attach customer attributes to the
    * event firehose" join. No state store involved (the static side is
    * re-resolved per batch, so a dimension backed by a lake table picks
    * up slowly-changing updates between batches); unknown keys keep
    * null attributes rather than dropping events, so late dimension
    * arrivals can be reconciled downstream instead of silently losing
    * fact rows. */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** State-store metrics of the most recent micro-batch, as a DataFrame —
    * the observability surface a lake operator watches to catch state
    * growth before it kills a streaming job (rows held, rows updated,
    * memory). One row per stateful operator in the query. */
  def stateMetrics(spark: org.apache.spark.sql.SparkSession,
                   query: org.apache.spark.sql.streaming.StreamingQuery): DataFrame = {
    import spark.implicits._
    val rows = Option(query.lastProgress).toSeq.flatMap { prog =>
      prog.stateOperators.toSeq.map { op =>
        (prog.batchId, op.operatorName, op.numRowsTotal, op.numRowsUpdated,
          op.numRowsRemoved, op.memoryUsedBytes)
      }
    }
    rows.toDF("batch_id", "operator", "state_rows_total", "state_rows_updated",
      "state_rows_removed", "state_memory_bytes")
  }

  /** Late-data accounting across the query's whole progress history: per
    * (batch, stateful operator), how many rows the watermark silently
    * dropped. Watermark drops are CORRECT behavior — that is the
    * contract — but unobserved drop counts are how a pipeline loses 2%
    * of its events for a month before anyone notices; this is the
    * dashboard number that makes the loss visible, next to each batch's
    * watermark so the drop can be attributed to an ingest delay. One row
    * per (batch, operator) with drops, cumulative across
    * `recentProgress` (Spark keeps the last
    * `spark.sql.streaming.numRecentProgressUpdates` batches). */
  def lateDataMetrics(spark: org.apache.spark.sql.SparkSession,
                      query: org.apache.spark.sql.streaming.StreamingQuery): DataFrame = {
    import spark.implicits._
    val rows = query.recentProgress.toSeq.flatMap { prog =>
      val wm = Option(prog.eventTime).flatMap(m => Option(m.get("watermark")))
        .getOrElse("")
      prog.stateOperators.toSeq.map { op =>
        (prog.batchId, op.operatorName, op.numRowsDroppedByWatermark, wm)
      }
    }
    rows.toDF("batch_id", "operator", "rows_dropped_late", "watermark")
  }

  /** Watermark-lag dashboard across the query's progress history: per
    * batch, the watermark, the newest event time the batch saw, and the
    * LAG between them in seconds — how far the watermark trails the
    * data's own clock. A growing lag means the watermark (and with it
    * every windowed emission downstream) is falling behind ingest —
    * the freshness regression that silently turns a "2-hour-delayed"
    * dashboard into a 12-hour one. Batch duration and input rate ride
    * along so a lag spike can be attributed to volume vs processing
    * cost. Rows with no event-time stats (empty batches, no watermarked
    * operator) are skipped. A NEGATIVE lag is meaningful: the batch's
    * newest row was already behind the watermark — the whole batch
    * arrived late (pair it with [[lateDataMetrics]] to see what was
    * dropped). */
  def watermarkLag(spark: org.apache.spark.sql.SparkSession,
                   query: org.apache.spark.sql.streaming.StreamingQuery): DataFrame = {
    import spark.implicits._
    def parse(s: String): Option[java.time.Instant] =
      try Some(java.time.Instant.parse(s)) catch { case _: Exception => None }
    val rows = query.recentProgress.toSeq.flatMap { prog =>
      val et = Option(prog.eventTime)
      for {
        wm <- et.flatMap(m => Option(m.get("watermark"))).flatMap(parse)
        mx <- et.flatMap(m => Option(m.get("max"))).flatMap(parse)
      } yield (prog.batchId, wm.toString, mx.toString,
        (mx.toEpochMilli - wm.toEpochMilli) / 1000.0,
        prog.batchDuration, prog.numInputRows)
    }
    rows.toDF("batch_id", "watermark", "max_event_time", "lag_sec",
      "batch_duration_ms", "input_rows")
  }
}
