package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.functions._

import graft.streaming.FunnelStream

/** Planted-stream checks for the windowed funnel monitor: per-window
  * step counts match the hand-computed funnel, out-of-order steps do
  * not count, and windows separate. */
class FunnelStreamSpec extends SparkSpecBase {

  test("windowed funnel counts ordered chains per window, rejects disorder") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    val day = 86400L
    def ts(d: Long, h: Long): Timestamp =
      Timestamp.from(Instant.ofEpochSecond(d * day + h * 3600L))
    // day 0: user 1 full ordered chain; user 2 view->click only;
    //        user 3 purchase BEFORE view (disorder — counts as view only)
    // day 1: user 1 view only
    val events = Seq(
      (ts(0, 1), 1L, "view"), (ts(0, 2), 1L, "click"),
      (ts(0, 3), 1L, "purchase"),
      (ts(0, 1), 2L, "view"), (ts(0, 5), 2L, "click"),
      (ts(0, 1), 3L, "purchase"), (ts(0, 2), 3L, "view"),
      (ts(1, 1), 1L, "view"))

    val input = MemoryStream[(Timestamp, Long, String)]
    val tmp = Files.createTempDirectory("graft_funnelstream").toString
    val query = FunnelStream.userSteps(
        input.toDF().toDF("ts", "user_id", "event_type"))
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", s"$tmp/sink")
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    try {
      input.addData(events)
      query.processAllAvailable()
      // advance the watermark far past both windows so they close
      input.addData(Seq((ts(5, 0), 99L, "view")))
      query.processAllAvailable()

      val steps = spark.read.parquet(s"$tmp/sink")
      val counts = FunnelStream.stepCounts(steps).collect()
        .map(r => r.getTimestamp(0).toInstant.getEpochSecond / day ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
        .toMap
      assert(counts.contains(0L) && counts.contains(1L))
      // day 0: 3 users, 3 with a view, 2 ordered view->click, 1 full chain
      assert(counts(0L) == ((3L, 3L, 2L, 1L)), s"day0 ${counts(0L)}")
      // day 1: user 1 view only
      assert(counts(1L) == ((1L, 1L, 0L, 0L)), s"day1 ${counts(1L)}")
      // append mode emits each closed (window, user) exactly once
      val dupes = steps.groupBy(col("win_start"), col("user_id"))
        .count().filter(col("count") > 1).count()
      assert(dupes == 0, "no (window, user) row is emitted twice")
    } finally query.stop()
  }
}
