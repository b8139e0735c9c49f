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
}
