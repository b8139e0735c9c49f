package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.SEvent

/** Streaming windowed aggregation: watermarked event-time windows over a
  * MemoryStream agree with the batch computation on the same data. */
class StreamingWindowSpec extends SparkSpecBase {

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("watermarked hourly windows match the batch group-by") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val events = Seq(
      SEvent(1L, 1L, ts(65), "view"), SEvent(1L, 2L, ts(70), "click"),
      SEvent(2L, 3L, ts(100), "view"), SEvent(1L, 4L, ts(130), "view"),
      SEvent(3L, 5L, ts(185), "purchase"))
    val input = MemoryStream[SEvent]
    val agg = input.toDS()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val query = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    try {
      input.addData(events: _*)
      query.processAllAvailable()
      val streamed = spark.sql(
        "SELECT window.start, event_type, n FROM win_out").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      val batch = events.toDS()
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start"), col("event_type"), col("n")).collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch, s"streamed $streamed != batch $batch")
    } finally query.stop()
  }

  test("native session windows close on the gap and match the batch sessionizer's counts") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // the declarative twin of SessionizeStream's flatMapGroupsWithState:
    // session_window merges events within a 30-minute gap per user —
    // use it when per-session rollups suffice; the custom-state form
    // remains for session NUMBERING and richer carried state
    val input = MemoryStream[SEvent]
    val agg = input.toDS()
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"))
    val query = agg.writeStream.format("memory").queryName("sess_win_out")
      .outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session), then a 40-min gap
      // opens a second session; user 2: one lone event
      input.addData(
        SEvent(1L, 1L, ts(100), "view"), SEvent(1L, 2L, ts(110), "click"),
        SEvent(2L, 3L, ts(105), "view"))
      query.processAllAvailable()
      input.addData(SEvent(1L, 4L, ts(150), "view"))
      query.processAllAvailable()
      // advance the watermark far enough to close every open session
      input.addData(SEvent(9L, 9L, ts(400), "view"))
      query.processAllAvailable()
      input.addData(SEvent(9L, 10L, ts(500), "view"))
      query.processAllAvailable()

      val got = spark.sql(
        "SELECT session_start, user_id, n_events FROM sess_win_out WHERE user_id < 9")
        .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set(
        (ts(100), 1L, 2L),  // events at 100+110 merge (gap 10 < 30)
        (ts(150), 1L, 1L),  // 40-min gap → new session
        (ts(105), 2L, 1L)), s"session windows wrong: $got")
    } finally query.stop()
  }
}
