package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{SEvent, SessionizeStream, StreamJoin}

/** Streaming sessionization: gap semantics shared with the batch operator,
  * driven through MemoryStream micro-batches. */
class StreamingSpec extends SparkSpecBase {

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("closed sessions are emitted with batch-identical rollups") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[SEvent]
    val out = SessionizeStream.sessionize(input.toDS(), gapSec = 1800)
    val query = out.writeStream
      .format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      // NOTE: event times start well past the epoch — the stateful operator
      // drops rows at/before the current watermark, which starts at 0.
      // user 1: two events, then a 40-minute gap closes session 1
      // user 2: events 15 min apart — one open session, no emit
      input.addData(
        SEvent(1L, 1L, ts(100), "view"),
        SEvent(1L, 2L, ts(110), "purchase"),
        SEvent(2L, 3L, ts(105), "view"))
      query.processAllAvailable()
      input.addData(
        SEvent(1L, 4L, ts(150), "click"), // 40 min > 30 min gap → closes session 1
        SEvent(2L, 5L, ts(120), "purchase")) // 15 min gap → same session
      query.processAllAvailable()

      val rows = spark.sql("SELECT * FROM sessions_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(rows.toSet == Set((1L, 1L, 2L, 1L)),
        s"expected user 1 session 1 (2 events, 1 purchase) closed; got ${rows.toSeq}")
    } finally query.stop()
  }

  test("event-time timeout flushes idle sessions once the watermark passes") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[SEvent]
    val out = SessionizeStream.sessionize(input.toDS(), gapSec = 1800, watermark = "0 seconds")
    val query = out.writeStream
      .format("memory").queryName("sessions_timeout")
      .outputMode("append").start()
    try {
      input.addData(SEvent(7L, 1L, ts(100), "view"), SEvent(7L, 2L, ts(110), "purchase"))
      query.processAllAvailable()
      // an unrelated user far in the future advances the watermark past
      // user 7's gap horizon → the open session times out and flushes
      input.addData(SEvent(8L, 3L, ts(700), "view"))
      query.processAllAvailable()
      input.addData(SEvent(9L, 4L, ts(1300), "view"))
      query.processAllAvailable()

      val rows = spark.sql("SELECT * FROM sessions_timeout").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(rows.contains((7L, 1L, 2L, 1L)),
        s"user 7's idle session should flush on timeout; got ${rows.toSeq}")

      // after a timeout-flushed session, the NEXT session must continue the
      // per-user numbering (id 2), not restart at 1
      input.addData(
        SEvent(7L, 10L, ts(1400), "view"),
        SEvent(7L, 11L, ts(1500), "click")) // 100 min gap closes session 2 in-batch
      query.processAllAvailable()
      val rows2 = spark.sql("SELECT * FROM sessions_timeout").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(rows2.contains((7L, 2L, 1L, 0L)),
        s"post-timeout session should be id 2; got ${rows2.toSeq}")
    } finally query.stop()
  }

  test("stream-stream join attributes purchases to views within the horizon") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val views = MemoryStream[SEvent]
    val purchases = MemoryStream[SEvent]
    val joined = StreamJoin.viewToPurchase(
      views.toDF(), purchases.toDF(), watermark = "10 minutes", horizon = "30 minutes")
    val query = joined.writeStream
      .format("memory").queryName("attrib_out")
      .outputMode("append").start()
    try {
      views.addData(
        SEvent(1L, 10L, ts(100), "view"),   // purchase at 120 → within 30 min
        SEvent(2L, 11L, ts(100), "view"),   // purchase at 140 → outside 30 min
        SEvent(3L, 12L, ts(100), "view"))   // no purchase
      purchases.addData(
        SEvent(1L, 20L, ts(120), "purchase"),
        SEvent(2L, 21L, ts(140), "purchase"),
        SEvent(4L, 22L, ts(90), "purchase")) // purchase BEFORE any view
      query.processAllAvailable()
      val rows = spark.sql("SELECT user_id, view_id, purchase_id FROM attrib_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.toSet == Set((1L, 10L, 20L)),
        s"only user 1's purchase is within the attribution window; got ${rows.toSeq}")
      // the state-metrics surface reports the join's buffered state
      val metrics = StreamJoin.stateMetrics(spark, query).collect()
      assert(metrics.nonEmpty, "state metrics must report the join operator")
      assert(metrics.exists(m => m.getString(1).contains("symmetricHashJoin") &&
        m.getLong(2) > 0L),
        s"join state should hold buffered rows; got ${metrics.toSeq}")
    } finally query.stop()
  }

  test("stream-static enrichment broadcasts the dimension and keeps unknown keys") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val events = MemoryStream[SEvent]
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val enriched = StreamJoin.enrich(events.toDF(), dim, "user_id")
    val query = enriched.writeStream
      .format("memory").queryName("enriched_out")
      .outputMode("append").start()
    try {
      events.addData(
        SEvent(1L, 1L, ts(100), "view"),
        SEvent(2L, 2L, ts(101), "view"),
        SEvent(7L, 3L, ts(102), "view")) // no dimension row
      query.processAllAvailable()
      val rows = spark.sql("SELECT user_id, event_id, tier FROM enriched_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)).getOrElse("?")))
      assert(rows.toSet == Set((1L, 1L, "gold"), (2L, 2L, "basic"), (7L, 3L, "?")),
        s"left enrichment must keep unknown keys with null attributes; got ${rows.toSeq}")
    } finally query.stop()
  }

  test("left-outer stream-stream join null-completes never-matched views exactly once") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val views = MemoryStream[SEvent]
    val purchases = MemoryStream[SEvent]
    val joined = StreamJoin.viewToPurchaseOuter(
      views.toDF(), purchases.toDF(), watermark = "10 minutes", horizon = "30 minutes")
    val query = joined.writeStream
      .format("memory").queryName("attrib_outer")
      .outputMode("append").start()
    try {
      views.addData(
        SEvent(1L, 10L, ts(100), "view"),   // purchase at 120 → match
        SEvent(2L, 11L, ts(100), "view"),   // purchase at 140 → outside horizon
        SEvent(3L, 12L, ts(100), "view"))   // no purchase at all
      purchases.addData(
        SEvent(1L, 20L, ts(120), "purchase"),
        SEvent(2L, 21L, ts(140), "purchase"))
      query.processAllAvailable()

      // advance BOTH watermarks past view_ts + horizon + delay (100+30+10),
      // then nudge one more batch — outer null-completion emits on the
      // batch AFTER the watermark moves
      views.addData(SEvent(9L, 90L, ts(200), "view"))
      purchases.addData(SEvent(9L, 91L, ts(200), "purchase"))
      query.processAllAvailable()
      views.addData(SEvent(9L, 92L, ts(210), "view"))
      purchases.addData(SEvent(9L, 93L, ts(210), "purchase"))
      query.processAllAvailable()

      def result() = spark.sql(
        "SELECT view_id, purchase_id FROM attrib_outer WHERE user_id IN (1,2,3)")
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      val rows = result()
      assert(rows.toSet == Set((10L, 20L), (11L, -1L), (12L, -1L)),
        s"matched view once with its purchase, never-matched views null-padded; got ${rows.toSeq}")
      assert(rows.length == 3,
        s"each view must emit EXACTLY once; got ${rows.toSeq}")

      // a would-be match arriving after null-completion is behind the
      // purchases watermark → dropped, never a duplicate emission
      purchases.addData(SEvent(3L, 30L, ts(115), "purchase"))
      query.processAllAvailable()
      assert(result().length == 3,
        "late purchase behind the watermark must not re-emit or duplicate")
    } finally query.stop()
  }
}
